package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/**
 * Iceberg-style stored procedures as a NATIVE Spark 4.1 ProcedureCatalog:
 * `CALL geo.system.rewrite_data_files(table => 'db.t', ...)` parses,
 * resolves, coerces and defaults through Spark's own analyzer
 * (ResolveProcedures/BindProcedures) — no regex front-end, the same
 * no-front-end rule as the rest of GeoCatalog. Each procedure maps 1:1
 * onto the verb the engine already has (OPTIMIZE / VACUUM / RESTORE /
 * ADD FILES / CREATE TAG), so CALL is one behavior with two spellings,
 * exactly like Iceberg's procedures over its actions API.
 */
object GeoProcedures {

  private def req(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def opt(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).defaultValue("NULL").build()

  /** Typed access to the bound-call argument row, by parameter name. */
  private final class Args(ps: Array[ProcedureParameter], row: InternalRow) {
    private def idx(n: String): Int = ps.indexWhere(_.name == n)
    def str(n: String): Option[String] = {
      val i = idx(n)
      if (row.isNullAt(i)) None else Some(row.getUTF8String(i).toString)
    }
    def int(n: String): Option[Int] = {
      val i = idx(n); if (row.isNullAt(i)) None else Some(row.getInt(i))
    }
    def long(n: String): Option[Long] = {
      val i = idx(n); if (row.isNullAt(i)) None else Some(row.getLong(i))
    }
    def reqStr(n: String): String = str(n).getOrElse(
      throw new IllegalArgumentException(s"argument '$n' must not be NULL"))
  }

  /** The procedure's result set (the mapped command's own output rows). */
  private case class ResultScan(schema: StructType, data: Array[InternalRow])
    extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data
  }

  private class Proc(procName: String, ps: Array[ProcedureParameter],
                     make: Args => GeoRunnable)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = ps
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val cmd = make(new Args(ps, input))
      val out = cmd.execute(spark)
      val schema = StructType(cmd.output.map(a =>
        StructField(a.name, a.dataType, a.nullable)))
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      java.util.List.of[Scan](ResultScan(schema,
        out.map(r => conv(r).asInstanceOf[InternalRow]).toArray)).iterator()
    }
  }

  val names: Seq[String] = Seq("add_files", "ancestors_of", "cherrypick_snapshot",
    "create_tag", "expire_snapshots", "fast_forward", "publish_changes",
    "remove_orphan_files", "rewrite_data_files",
    "rewrite_position_delete_files",
    "rollback_to_snapshot", "rollback_to_timestamp",
    "set_current_snapshot", "snapshot")

  /** Manifest versions are Int internally; the procedure surface speaks
    * bigint (Iceberg snapshot ids are int64) so metadata-table and
    * ancestors_of outputs bind back into CALL arguments unchanged. */
  private def version(id: Long): Int = {
    require(id >= 0 && id <= Int.MaxValue, s"snapshot_id $id out of range")
    id.toInt
  }

  /** The procedure for `name` under catalog `cat`, if known. */
  def load(cat: String, name: String): Option[UnboundProcedure] = {
    def table(a: Args): String = cat + "." + a.reqStr("table")
    name.toLowerCase match {
      case "rewrite_data_files" => Some(new Proc(name, Array(
          req("table", StringType), opt("target_file_count", IntegerType),
          opt("where", StringType), opt("zorder", StringType),
          opt("small_below_rows", LongType)),
        a => GeoOptimizeCommand(table(a), a.int("target_file_count"),
          a.str("where"),
          a.str("zorder").toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
          a.long("small_below_rows"))))
      case "expire_snapshots" => Some(new Proc(name, Array(
          // Iceberg's signature: age cutoff and/or count floor — a
          // snapshot survives if it is fresh enough OR recent enough
          req("table", StringType), opt("retain_last", IntegerType),
          opt("older_than", StringType)),
        a => a.str("older_than") match {
          case Some(ts) =>
            GeoExpireSnapshotsCommand(table(a), ts, a.int("retain_last"))
          case None => GeoVacuumCommand(table(a), a.int("retain_last"), "VERSIONS")
        }))
      case "remove_orphan_files" => Some(new Proc(name,
        Array(req("table", StringType), opt("older_than", StringType)),
        // orphan sweep ONLY — never expires committed history (Iceberg's
        // remove_orphan_files contract; expire_snapshots is the verb that
        // trims history). older_than pins an ABSOLUTE cutoff in place of
        // the relative grace window: only orphans modified at or before
        // it fall (Iceberg's default is now - 3 days; ours is the
        // spark.graft.vacuum.orphanGraceMs window when omitted)
        a => GeoRemoveOrphanFilesCommand(table(a), a.str("older_than"))))
      // consolidate position-delete sidecars, never touching data files
      // (Iceberg's verb has the same position-deletes-only scope)
      case "rewrite_position_delete_files" => Some(new Proc(name,
        Array(req("table", StringType)),
        a => GeoRewriteDeletesCommand(table(a))))
      case "rollback_to_snapshot" => Some(new Proc(name, Array(
          // bigint like Iceberg's procedure — ancestors_of emits LongType
          // snapshot ids, so they must feed back into rollback unchanged
          req("table", StringType), req("snapshot_id", LongType)),
        a => GeoRestoreCommand(table(a), Left(version(a.long("snapshot_id").getOrElse(
          throw new IllegalArgumentException("snapshot_id must not be NULL")))))))
      case "rollback_to_timestamp" => Some(new Proc(name, Array(
          req("table", StringType), req("timestamp", StringType)),
        a => GeoRestoreCommand(table(a), Right(a.reqStr("timestamp")))))
      // zero-copy onboarding of an EXISTING readable table's parquet
      // files as a new geo table (Iceberg snapshot-procedure analog)
      case "snapshot" => Some(new Proc(name, Array(
          req("table", StringType), req("source_table", StringType)),
        a => GeoSnapshotTableCommand(table(a), a.reqStr("source_table"))))
      case "add_files" => Some(new Proc(name, Array(
          req("table", StringType), req("files", StringType)),
        a => GeoAddFilesCommand(table(a),
          a.reqStr("files").split(',').map(_.trim).filter(_.nonEmpty).toSeq)))
      case "ancestors_of" => Some(new Proc(name,
        Array(req("table", StringType), opt("snapshot_id", LongType)),
        // read-only multi-row result set (the LocalScan path end-to-end);
        // optional bigint starting snapshot, Iceberg's signature
        a => GeoAncestorsCommand(table(a), a.long("snapshot_id").map(version))))
      // WAP publish, Iceberg-procedure spelling: both map 1:1 onto the
      // engine's PUBLISH BRANCH verb (fast-forward main to the staged
      // branch head, refused after divergence)
      case "publish_changes" => Some(new Proc(name, Array(
          req("table", StringType), req("branch", StringType)),
        a => GeoBranchCommand(table(a), a.reqStr("branch"), "publish")))
      case "fast_forward" => Some(new Proc(name, Array(
          req("table", StringType), req("branch", StringType),
          req("to", StringType)),
        a => {
          // graft branches publish INTO main only (staged lineage model);
          // Iceberg's general branch->branch fast-forward has no analog
          val b = a.reqStr("branch")
          require(b == "main",
            s"fast_forward can only move 'main' (got '$b'); stage work on a " +
              "branch and fast-forward main to it")
          GeoBranchCommand(table(a), a.reqStr("to"), "publish")
        }))
      // Iceberg set_current_snapshot: exactly one of snapshot_id / ref.
      // Both map 1:1 onto the existing RESTORE verbs — snapshot ids are
      // committed main versions (restore moves the pointer forward OR
      // backward), and a ref resolves through t.refs exactly as
      // `VERSION AS OF 'ref'` does (tags and branch heads alike)
      case "set_current_snapshot" => Some(new Proc(name, Array(
          req("table", StringType), opt("snapshot_id", LongType),
          opt("ref", StringType)),
        a => (a.long("snapshot_id"), a.str("ref")) match {
          case (Some(id), None) => GeoRestoreCommand(table(a), Left(version(id)))
          case (None, Some(r)) => GeoRestoreRefCommand(table(a), r)
          case _ => throw new IllegalArgumentException(
            "set_current_snapshot takes exactly one of snapshot_id / ref")
        }))
      // apply a staged snapshot's append delta onto a head that has
      // ADVANCED since (the case publish/fast_forward refuses); Iceberg's
      // append-only cherry-pick restriction is enforced by the verb
      case "cherrypick_snapshot" => Some(new Proc(name, Array(
          req("table", StringType), req("snapshot_id", LongType)),
        a => GeoCherrypickCommand(table(a), version(a.long("snapshot_id").getOrElse(
          throw new IllegalArgumentException("snapshot_id must not be NULL"))))))
      case "create_tag" => Some(new Proc(name, Array(
          req("table", StringType), req("tag", StringType),
          opt("snapshot_id", LongType)),
        a => GeoCreateTagCommand(table(a), a.reqStr("tag"),
          a.long("snapshot_id").map(version))))
      case _ => None
    }
  }
}
