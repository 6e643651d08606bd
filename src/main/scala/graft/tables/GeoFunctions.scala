package graft.tables

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/**
 * The partition transforms as catalog-resolvable V2 functions (Iceberg
 * SparkFunctions analog): `SELECT geo.system.bucket(8, id)` works in SQL,
 * and — the load-bearing use — Spark's `DistributionAndOrderingUtils`
 * resolves the transform expressions a geo table's Write requests
 * (`RequiresDistributionAndOrdering`) through this catalog, so writes
 * cluster rows in TRANSFORM space with no hand-rolled shuffle.
 *
 * Results must agree bit-for-bit with [[GeoPartition.transformCol]] (what
 * batch layout computes) and [[GeoPartition.valueOf]] (what scan pruning
 * derives from pushed literals); all three are property-tested together.
 * Every function returns the transform's LONG partition value.
 */
object GeoFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "days", "hours", "months", "years")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case k @ ("days" | "hours" | "months" | "years") => Some(new UnitUnbound(k))
    case _ => None
  }

  private[tables] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[tables] def longAt(input: InternalRow, i: Int, dt: DataType): Long = dt match {
    case ByteType => input.getByte(i).toLong
    case ShortType => input.getShort(i).toLong
    case IntegerType => input.getInt(i).toLong
    case _ => input.getLong(i)
  }
}

/** bucket(n, col): `pmod(murmur3_hash(col), n)` — evaluated through the
  * same catalyst Murmur3Hash (seed 42) the write layout uses, so the
  * function, the clustering column and the pruning literal agree on
  * every byte-level hashing detail. */
object BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) -> pmod(murmur3(col), n): the hash partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2, s"bucket takes (n, col), got ${inputType.length} args")
    val dt = inputType(1).dataType
    require(GeoPartition.supports("bucket", dt),
      s"bucket cannot hash ${dt.simpleString}")
    new BucketBound(dt)
  }
}

class BucketBound(dt: DataType) extends ScalarFunction[java.lang.Long] {
  // the (n, value) input row IS the hash expression's input row: ordinal 1
  @transient private lazy val h = Murmur3Hash(Seq(BoundReference(1, dt, nullable = true)), 42)
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = LongType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.system.bucket(${dt.simpleString})"
  override def produceResult(input: InternalRow): java.lang.Long = {
    if (input.isNullAt(0)) return null
    val n = input.getInt(0)
    require(n > 0, s"bucket count must be positive, got $n")
    // null col values hash to the seed, matching pmod(hash(col), n)
    val m = h.eval(input).asInstanceOf[Int] % n
    (if (m < 0) m + n else m).toLong
  }
}

/** truncate(w, col): integral floor-to-multiple; strings pack the first 8
  * UTF-8 bytes of the w-code-point prefix into an order-embedding long. */
object TruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): floor integrals to a multiple of w; order-embed string prefixes"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2, s"truncate takes (w, col), got ${inputType.length} args")
    val dt = inputType(1).dataType
    require(GeoPartition.supports("truncate", dt),
      s"truncate needs an integral/string column, got ${dt.simpleString}")
    new TruncateBound(dt)
  }
}

class TruncateBound(dt: DataType) extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = LongType
  override def name(): String = "truncate"
  override def canonicalName(): String = s"graft.system.truncate(${dt.simpleString})"
  override def produceResult(input: InternalRow): java.lang.Long = {
    if (input.isNullAt(0) || input.isNullAt(1)) return null
    val w = input.getInt(0)
    require(w > 0, s"truncate width must be positive, got $w")
    dt match {
      case StringType => GeoPartition.packPrefix(input.getUTF8String(1), w)
      case _ =>
        val l = GeoFunctions.longAt(input, 1, dt)
        l - Math.floorMod(l, w.toLong)
    }
  }
}

/** days/hours/months/years(col): floored epoch units over DATE/TIMESTAMP
  * (timestamps at UTC — same resolution rule as the layout column). */
class UnitUnbound(kind: String) extends UnboundFunction {
  override def name(): String = kind
  override def description(): String = s"$kind(col): epoch-unit partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1, s"$kind takes one date/timestamp column")
    val dt = inputType(0).dataType
    require(GeoPartition.supports(kind, dt),
      s"$kind() needs a date/timestamp column, got ${dt.simpleString}")
    new UnitBound(kind, dt)
  }
}

class UnitBound(kind: String, dt: DataType) extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = LongType
  override def name(): String = kind
  override def canonicalName(): String = s"graft.system.$kind(${dt.simpleString})"
  override def produceResult(input: InternalRow): java.lang.Long = {
    if (input.isNullAt(0)) return null
    // DATE is epoch days (int), TIMESTAMP is epoch micros (long)
    val micros = dt match {
      case DateType => input.getInt(0).toLong * 86400000000L
      case _ => input.getLong(0)
    }
    kind match {
      case "days" => Math.floorDiv(micros, 86400000000L)
      case "hours" => Math.floorDiv(micros, 3600000000L)
      case "months" =>
        val d = java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1
      case "years" =>
        java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).getYear.toLong - 1970
    }
  }
}
