package graft

import graft.functions._

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The vec/sketch expressions generate real code (no CodegenFallback
  * `.eval(row)` round-trip) and the generated path agrees with interpreted
  * eval — closes the round-2..4 ADVICE item on dedup/ANN hot loops. */
class VecCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val floatArr = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true)
  private val longArr = BoundReference(1, ArrayType(LongType, containsNull = false), nullable = true)
  private val intArr = BoundReference(2, ArrayType(IntegerType, containsNull = false), nullable = true)

  private def genSource(e: Expression): String = {
    val ctx = new CodegenContext
    e.genCode(ctx).code.toString
  }

  test("no CodegenFallback eval round-trip in generated code") {
    val exprs: Seq[Expression] = Seq(
      VecDot(floatArr, floatArr), VecNorm(floatArr), VecCosine(floatArr, floatArr),
      MinHashSig(intArr, Literal(16)), SimHash64(longArr),
      HyperplaneSig(floatArr, Literal(8)),
      BandedHyperplaneSig(floatArr, Literal(8), Literal(4)))
    exprs.foreach { e =>
      val src = genSource(e)
      assert(src.contains(".compute("), s"${e.prettyName}: expected compute call:\n$src")
      assert(!src.contains(".eval("), s"${e.prettyName}: CodegenFallback still present:\n$src")
    }
  }

  test("st_geomfromwkb generates real code on the WKB ingest path") {
    val wkbIn = BoundReference(0, BinaryType, nullable = true)
    val src = genSource(StGeomFromWKB(wkbIn))
    assert(src.contains(".evalBytes("), s"expected evalBytes call:\n$src")
    assert(!src.contains(".eval("), s"CodegenFallback still present on WKB ingest:\n$src")
    // end-to-end: ingest arbitrary (ISO) WKB bytes, normalize, read back
    val iso = spark.sql("SELECT st_asbinary(st_point(3.0D, 4.0D)) AS b")
    val rt = iso.select(expr("st_astext(st_geomfromwkb(b))")).head.getString(0)
    assert(rt == "POINT (3 4)", rt)
  }

  test("generated and interpreted results agree end-to-end") {
    // one DataFrame pass (whole-stage codegen) vs literal-folded (interpreted)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f))).toDF("a", "b")
      .select(
        expr("vec_dot(a, b)").as("dot"),
        expr("vec_norm(a)").as("norm"),
        expr("vec_cosine(a, b)").as("cos"),
        expr("minhash_sig(array(10, 20, 30), 8)").as("mh"),
        expr("simhash64(array(CAST(123456789 AS BIGINT), CAST(-987654321 AS BIGINT)))").as("sh"),
        expr("hyperplane_sig(a, 12)").as("hp"),
        expr("banded_hyperplane_sig(a, 6, 3)").as("bhp"))
    val r = df.head
    assert(math.abs(r.getAs[Double]("dot") - (1.0 * 0.5 - 2.0 + 6.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("norm") - math.sqrt(14.0)) < 1e-12)
    assert(r.getAs[Double]("cos") == r.getAs[Double]("dot") / (r.getAs[Double]("norm") * math.sqrt(0.25 + 1 + 4)))

    // interpreted reference via direct expression eval
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val hp = HyperplaneSig(
      Literal.create(Array(1.0f, 2.0f, 3.0f), ArrayType(FloatType)), Literal(12))
    assert(r.getAs[Long]("hp") == hp.eval(null).asInstanceOf[Long])
    val bhp = BandedHyperplaneSig(
      Literal.create(Array(1.0f, 2.0f, 3.0f), ArrayType(FloatType)), Literal(6), Literal(3))
    assert(r.getAs[scala.collection.Seq[Long]]("bhp") ==
      bhp.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq)
    assert(r.getAs[scala.collection.Seq[Long]]("mh").length == 8)
    assert(a.numElements() == 3)
  }

  test("word_ngram_hashes equals the HOF chain bit-for-bit") {
    // tricky shapes: multi-space runs, leading/trailing spaces, embedded
    // newline (NOT a separator), repeats (distinct), short text, empty
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  padded   with    runs of  spaces   everywhere  ",
      "line one\nstill same token run here yes",
      "a b c d e a b c d e a b c d e",
      "too short", "", "     ", "exactly five tokens right here")
    import spark.implicits._
    val df = texts.toDF("t")
    val got = df.selectExpr(
      "word_ngram_hashes(t, 5) AS fused",
      "array_distinct(transform(CASE WHEN size(split(trim(t), ' +')) >= 5 " +
        "THEN transform(sequence(1, size(split(trim(t), ' +')) - 4), " +
        "i -> array_join(slice(split(trim(t), ' +'), i, 5), ' ')) " +
        "ELSE array() END, g -> xxhash64(g))) AS hof")
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for row $r")
    }
  }

  test("word_ngram_hashes n=1 matches the HOF chain on empty/blank text") {
    // split(trim('')) yields ONE empty token, so the HOF chain emits a
    // single xxhash64('') for n = 1 — the fused loop must mirror it
    val texts = Seq("", "   ", "one", "two tokens", " padded ")
    val got = texts.toDF("t").selectExpr(
      "word_ngram_hashes(t, 1) AS fused",
      "array_distinct(transform(split(trim(t), ' +'), g -> xxhash64(g))) AS hof")
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for row $r")
    }
  }

  test("char_ngram_hashes equals the HOF chain incl. multibyte text") {
    val texts = Seq(
      "abcdefghij", "aaaaaa", "ab", "", "exact",
      "中文文本的去重测试需要按码点分片", // code points, not bytes
      "mixed 中文 and ascii text here")
    import spark.implicits._
    val got = texts.toDF("t").selectExpr(
      "char_ngram_hashes(t, 5) AS fused",
      "array_distinct(transform(sequence(1, greatest(length(t) - 4, 1)), " +
        "i -> hash(substr(t, i, 5)))) AS hof")
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"mismatch for row $r")
    }
  }

  test("banded_hyperplane_sig SQL registration: band-OR candidates via explode-join") {
    // two near-identical vectors and one orthogonal: the near pair shares
    // at least one band, the far pair shares none (seeded, deterministic)
    val rows = spark.sql("""
      WITH v AS (
        SELECT 1 AS id, array(CAST(1.0 AS FLOAT), CAST(0.01 AS FLOAT)) AS vec
        UNION ALL SELECT 2, array(CAST(0.99 AS FLOAT), CAST(0.012 AS FLOAT))
        UNION ALL SELECT 3, array(CAST(-0.02 AS FLOAT), CAST(1.0 AS FLOAT))),
      sigs AS (SELECT id, posexplode(banded_hyperplane_sig(vec, 12, 6)) AS (band, sig) FROM v)
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    """).as[(Int, Int)].collect().toSet
    assert(rows.contains((1, 2)), s"near pair must share a band: $rows")
    assert(!rows.contains((1, 3)) && !rows.contains((2, 3)), s"far pairs must not: $rows")
  }
}
