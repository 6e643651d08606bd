package graft

import graft.tables.{GeoCatalog, GeoManifest, GeoStreamingWrite, GeoTable}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native DSv2 streaming sink (SURVEY.md §2.8b / §2.13):
 * `writeStream.toTable("geo.db.t")` with per-epoch atomic manifest
 * commits and exactly-once replay semantics — the write half of the
 * streaming story (the read half is GeoChangelogSpec). Capability match:
 * Iceberg's streaming sink on the reference's `USING ICEBERG` tables.
 */
class GeoStreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_sink_wh").toString
    spark.conf.set("spark.sql.catalog.geosink", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geosink.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geosink.db")
    dir
  }

  private def ckptDir(): String =
    java.nio.file.Files.createTempDirectory("geo_sink_ck").toString

  test("writeStream.toTable appends each micro-batch as one atomic versioned commit") {
    warehouse
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE geosink.db.s1 (id BIGINT, v STRING) USING geo")
    val root = s"$warehouse/db/s1"

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckptDir())
      .toTable("geosink.db.s1")
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("geosink.db.s1").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val m = GeoManifest.read(spark, root)
    assert(m.version == 2, s"one commit per non-empty micro-batch, got v${m.version}")
    // the idempotence watermark rode in the same commits as the data
    assert(m.streamCommits.values.toSeq.sorted == Seq(1L),
      s"expected the last epoch id recorded, got ${m.streamCommits}")
  }

  test("restart from the same checkpoint continues exactly-once (stable sink id)") {
    warehouse
    spark.sql("CREATE TABLE geosink.db.s2 (id BIGINT, v STRING) USING geo")
    val ck = ckptDir()
    // a FILE source, not MemoryStream: its offsets are checkpoint-durable,
    // so stopping and restarting exercises the real recovery path
    val srcDir = java.nio.file.Files.createTempDirectory("geo_sink_src").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$srcDir/f1")
    val q1 = spark.readStream.schema(schema).option("maxFilesPerTrigger", "100")
      .parquet(s"$srcDir/*").writeStream
      .option("checkpointLocation", ck).toTable("geosink.db.s2")
    q1.processAllAvailable(); q1.stop()

    // new query run, same checkpoint: Spark restores the query id, so the
    // sink watermark line continues instead of starting a second one
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$srcDir/f2")
    val q2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", "100")
      .parquet(s"$srcDir/*").writeStream
      .option("checkpointLocation", ck).toTable("geosink.db.s2")
    q2.processAllAvailable(); q2.stop()

    val got = spark.table("geosink.db.s2").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got ${got.toSeq}")
    val m = GeoManifest.read(spark, s"$warehouse/db/s2")
    assert(m.streamCommits.size == 1,
      s"restart must reuse the sink id, got ${m.streamCommits.keys}")
  }

  test("a crash-replayed epoch is skipped, its files dropped — never appended twice") {
    warehouse
    spark.sql("CREATE TABLE geosink.db.s3 (id BIGINT, v STRING) USING geo")
    val root = s"$warehouse/db/s3"

    def runEpoch(w: GeoStreamingWrite, epoch: Long, rows: Seq[(Long, String)]): Unit = {
      val dw = w.createStreamingWriterFactory(null).createWriter(0, epoch * 100 + 1, epoch)
      rows.foreach { case (id, v) => dw.write(InternalRow(id, UTF8String.fromString(v))) }
      w.commit(epoch, Array(dw.commit()))
    }
    val schema = GeoManifest.read(spark, root).schema
    runEpoch(new GeoStreamingWrite(root, schema, "sinkX", truncate = false), 0,
      Seq((1L, "a"), (2L, "b")))
    assert(spark.table("geosink.db.s3").count() == 2)
    // the crash window: epoch 0 committed to the table but the engine's
    // checkpoint write was lost → the whole epoch replays
    runEpoch(new GeoStreamingWrite(root, schema, "sinkX", truncate = false), 0,
      Seq((1L, "a"), (2L, "b")))
    assert(spark.table("geosink.db.s3").count() == 2, "replayed epoch must be skipped")
    val m = GeoManifest.read(spark, root)
    assert(m.version == 1, "a skipped replay must not commit a new version")
    // the replay's parquet was dropped, not left for vacuum (recursive
    // walk: each commit attempt writes under its own data/s* subdir)
    import scala.jdk.CollectionConverters._
    val dataFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.length == m.files.length,
      s"unreferenced replay files left behind: $dataFiles vs ${m.files.map(_.path)}")
    // a DIFFERENT sink id is a different stream: epoch 0 there still lands
    runEpoch(new GeoStreamingWrite(root, schema, "sinkY", truncate = false), 0,
      Seq((9L, "z")))
    assert(spark.table("geosink.db.s3").count() == 3)
  }

  test("OutputMode.Complete replaces the table contents each epoch") {
    warehouse
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE geosink.db.s4 (v STRING, n BIGINT) USING geo")

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .groupBy($"v").agg(org.apache.spark.sql.functions.count("*").as("n"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckptDir())
      .toTable("geosink.db.s4")
    input.addData((1L, "a"), (2L, "a"), (3L, "b"))
    q.processAllAvailable()
    input.addData((4L, "a"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("geosink.db.s4").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L), ("b", 1L)),
      s"complete mode must hold ONLY the latest aggregate, got ${got.toSeq}")
  }

  test("streamed epochs cluster by partition transforms; scans prune them") {
    warehouse
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE geosink.db.s6 (id BIGINT, k BIGINT) USING geo " +
      "PARTITIONED BY (k)")
    val root = s"$warehouse/db/s6"

    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("id", "k").writeStream
      .option("checkpointLocation", ckptDir())
      .toTable("geosink.db.s6")
    // k takes 4 distinct values per epoch: the ordered distribution must
    // keep each value inside one file of that epoch
    input.addData((0L until 400L).map(i => (i, i % 4)): _*)
    q.processAllAvailable()
    input.addData((400L until 800L).map(i => (i, i % 4)): _*)
    q.processAllAvailable()
    q.stop()

    val m = GeoManifest.read(spark, root)
    assert(m.files.forall(_.pstats.nonEmpty), "per-file transform stats recorded")
    // same key never straddles files within an epoch (range partitioning)
    val perKey = spark.sql("SELECT k, COUNT(DISTINCT _file) AS nf FROM geosink.db.s6 GROUP BY k")
      .as[(Long, Long)].collect()
    assert(perKey.forall(_._2 <= 2), // one file per epoch at most
      s"a key straddles files within an epoch: ${perKey.toSeq}")
    // manifest pruning fires on the streamed files
    def scanned(sql: String): Int = {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      "GeoCowScan\\(files=(\\d+)".r.findFirstMatchIn(plan).map(_.group(1).toInt)
        .getOrElse(fail(s"no GeoCowScan in plan:\n$plan"))
    }
    val all = scanned("SELECT * FROM geosink.db.s6")
    val one = scanned("SELECT * FROM geosink.db.s6 WHERE k = 2")
    assert(one < all, s"partition pruning must fire on streamed files: $one vs $all")
    assert(spark.sql("SELECT COUNT(*) FROM geosink.db.s6 WHERE k = 2").head.getLong(0) == 200)
  }

  test("sink composes with the CDC source: appends stream out as inserts") {
    warehouse
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE geosink.db.s5 (id BIGINT, v STRING) USING geo")

    val input = MemoryStream[(Long, String)]
    val qIn = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckptDir())
      .toTable("geosink.db.s5")
    input.addData((1L, "a"), (2L, "b"))
    qIn.processAllAvailable()
    input.addData((3L, "c"))
    qIn.processAllAvailable()
    qIn.stop()

    val qOut = spark.readStream.table("geosink.db.s5.changes")
      .writeStream.format("memory").queryName("sink_cdc")
      .option("checkpointLocation", ckptDir())
      .start()
    qOut.processAllAvailable(); qOut.stop()
    val cdc = spark.table("sink_cdc")
      .selectExpr("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(cdc.toSeq == Seq((1L, "insert", 1), (2L, "insert", 1), (3L, "insert", 2)),
      s"got ${cdc.toSeq}")
  }
}
