package graft

import graft.tables.{GeoCatalog, GeoChangelog, GeoManifest, GeoTable}

import org.apache.spark.sql.functions._

/**
 * Incremental reads of GeoTables (SURVEY.md §2.8b): version-range
 * changelogs (file-granular + net CDC) and the micro-batch streaming
 * source — the consumption leg Iceberg gives the reference's
 * `USING ICEBERG` tables via incremental scans.
 */
class GeoChangelogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_cl_wh").toString
    spark.conf.set("spark.sql.catalog.geocls", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geocls.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geocls.db")
    dir
  }

  test("changes() walks per-version file diffs; appends tag insert at their commit") {
    warehouse
    val root = s"$warehouse/db/app"
    spark.sql("CREATE TABLE geocls.db.app (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.app SELECT id, 'a' FROM range(0, 5)")   // v1
    spark.sql("INSERT INTO geocls.db.app SELECT id, 'b' FROM range(5, 8)")   // v2

    val all = GeoTable.changes(spark, root, 0, 2)
      .select($"id", $"v", col(GeoChangelog.ChangeTypeCol).as("ct"),
        col(GeoChangelog.CommitVersionCol).as("cv"))
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(all.length == 8)
    assert(all.forall(_._3 == "insert"))
    assert(all.filter(_._4 == 1).map(_._1).toSeq == (0L until 5L))
    assert(all.filter(_._4 == 2).map(_._1).toSeq == (5L until 8L))
    // a sub-range sees only its commits
    assert(GeoTable.changes(spark, root, 1, 2).count() == 3)
    assert(GeoTable.changes(spark, root, 2, 2).count() == 0)
  }

  test("netChanges(): CoW DELETE nets to exactly the deleted rows, survivors cancel") {
    warehouse
    val root = s"$warehouse/db/cdc"
    spark.sql("CREATE TABLE geocls.db.cdc (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.cdc SELECT id, concat('x', id) FROM range(0, 100)") // v1
    spark.sql("DELETE FROM geocls.db.cdc WHERE id % 10 = 0")                             // v2 CoW

    // file-granular changelog shows the whole rewritten file (survivors as
    // delete+insert pairs)...
    val raw = GeoTable.changes(spark, root, 1, 2)
    assert(raw.where(col(GeoChangelog.ChangeTypeCol) === "delete").count() == 100)
    assert(raw.where(col(GeoChangelog.ChangeTypeCol) === "insert").count() == 90)
    // ...while the net diff is exactly the 10 deleted rows
    val net = GeoTable.netChanges(spark, root, 1, 2)
      .select($"id", col(GeoChangelog.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(net.length == 10, s"got ${net.toSeq}")
    assert(net.forall(_._2 == "delete"))
    assert(net.map(_._1).toSeq == (0L until 100L by 10L))

    // an UPDATE nets to pre-image delete + post-image insert per touched row
    spark.sql("UPDATE geocls.db.cdc SET v = 'upd' WHERE id = 7")                         // v3
    val upd = GeoTable.netChanges(spark, root, 2, 3)
      .select($"id", $"v", col(GeoChangelog.ChangeTypeCol).as("ct"))
      .as[(Long, String, String)].collect().sortBy(r => (r._3, r._1))
    assert(upd.toSeq == Seq((7L, "x7", "delete"), (7L, "upd", "insert")), s"got ${upd.toSeq}")
  }

  test("the changes metadata table serves SQL with version bounds via options") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.mt (id BIGINT, g BINARY) USING geo " +
      "TBLPROPERTIES('geometry.column'='g')")
    spark.sql("INSERT INTO geocls.db.mt SELECT id, st_point(CAST(id AS DOUBLE), 0.0D) FROM range(0, 4)")
    spark.sql("INSERT INTO geocls.db.mt SELECT id, st_point(CAST(id AS DOUBLE), 1.0D) FROM range(4, 6)")

    // full history through plain SQL
    val full = spark.sql(
      s"SELECT id, ${GeoChangelog.ChangeTypeCol} AS ct, ${GeoChangelog.CommitVersionCol} AS cv " +
        "FROM geocls.db.mt.changes ORDER BY id")
      .as[(Long, String, Int)].collect().toSeq
    assert(full.map(_._1) == (0L until 6L) && full.forall(_._2 == "insert"))
    assert(full.map(_._3) == Seq(1, 1, 1, 1, 2, 2))
    // bounded via read options
    val tail = spark.read.option("from-version", 1).table("geocls.db.mt.changes")
    assert(tail.select("id").as[Long].collect().sorted.toSeq == (4L until 6L))
    // column pruning without the meta columns still reads (unwrap path)
    assert(spark.sql("SELECT sum(id) FROM geocls.db.mt.changes").head.getLong(0) == 15L)
  }

  test("changes table accepts timestamp bounds (from exclusive-before, to as-of)") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.tsb (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.tsb SELECT id, 'a' FROM range(0, 3)")  // v1
    Thread.sleep(30)
    spark.sql("INSERT INTO geocls.db.tsb SELECT id, 'b' FROM range(3, 6)")  // v2
    Thread.sleep(30)
    spark.sql("INSERT INTO geocls.db.tsb SELECT id, 'c' FROM range(6, 9)")  // v3
    val root = s"$warehouse/db/tsb"
    val t2 = GeoManifest.commitTsOf(spark, root, 2)
    assert(GeoManifest.commitTsOf(spark, root, 1) < t2 &&
      t2 < GeoManifest.commitTsOf(spark, root, 3), "need distinct commit timestamps")
    // from-timestamp at v2's commit: v2 and v3 are at/after it
    val from = spark.read.option("from-timestamp", t2.toString)
      .table("geocls.db.tsb.changes").select($"id").as[Long].collect().sorted.toSeq
    assert(from == (3L until 9L), s"from-timestamp: $from")
    // to-timestamp at v2's commit: TIMESTAMP AS OF rule, v1..v2 included
    val to = spark.read.option("to-timestamp", t2.toString)
      .table("geocls.db.tsb.changes").select($"id").as[Long].collect().sorted.toSeq
    assert(to == (0L until 6L), s"to-timestamp: $to")
    // mixed forms compose; same-kind version+timestamp together reject
    val both = spark.read.option("from-timestamp", t2.toString)
      .option("to-version", "2")
      .table("geocls.db.tsb.changes").select($"id").as[Long].collect().sorted.toSeq
    assert(both == (3L until 6L), s"mixed bounds: $both")
    val bad = intercept[Exception] {
      spark.read.option("from-timestamp", t2.toString).option("from-version", "1")
        .table("geocls.db.tsb.changes").collect()
    }
    assert(bad.getMessage.contains("not both"), bad.getMessage)
  }

  test("readStream.table replays appends then tails new commits, batch-equal") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.st (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.st SELECT id, 'a' FROM range(0, 6)")
    spark.sql("INSERT INTO geocls.db.st SELECT id, 'b' FROM range(6, 10)")

    val q = spark.readStream.table("geocls.db.st")
      .writeStream.format("memory").queryName("geo_stream_replay").start()
    q.processAllAvailable()
    val replay = spark.table("geo_stream_replay").select($"id").as[Long].collect().sorted.toSeq
    assert(replay == (0L until 10L),
      s"stream replay must equal the batch snapshot, got $replay")

    // a commit AFTER the stream started is picked up by the next batch
    spark.sql("INSERT INTO geocls.db.st SELECT id, 'c' FROM range(10, 13)")
    q.processAllAvailable(); q.stop()
    val tailed = spark.table("geo_stream_replay").select($"id").as[Long].collect().sorted.toSeq
    assert(tailed == (0L until 13L), s"tail append missing: $tailed")
  }

  test("admission caps bound micro-batches; capped catch-up is multi-batch and lossless") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    warehouse
    spark.sql("CREATE TABLE geocls.db.adm (id BIGINT, v STRING) USING geo")
    for (i <- 0 until 3) // one file per commit (range numPartitions=1)
      spark.sql(s"INSERT INTO geocls.db.adm SELECT id, 'x' FROM range(${i * 5}, ${i * 5 + 5}, 1, 1)")
    val root = s"$warehouse/db/adm"
    // whole-version admission under file/row caps (offsets are versions)
    assert(GeoChangelog.admit(spark, root, 0, 3, ReadLimit.maxFiles(1), false) == 1)
    assert(GeoChangelog.admit(spark, root, 0, 3, ReadLimit.maxFiles(2), false) == 2)
    assert(GeoChangelog.admit(spark, root, 0, 3, ReadLimit.allAvailable(), false) == 3)
    assert(GeoChangelog.admit(spark, root, 0, 3, ReadLimit.maxRows(5), false) == 1)
    assert(GeoChangelog.admit(spark, root, 1, 3, ReadLimit.maxRows(100), false) == 3)
    // progress guarantee: a cap below even one version still admits one
    assert(GeoChangelog.admit(spark, root, 0, 3, ReadLimit.maxRows(1), false) == 1)
    // CDC counting: a fresh delete sidecar (this table has no layout
    // stats, so a 1-of-15-rows DELETE goes merge-on-read) counts against
    // the caps — the CDC stream replays it as row-granular delete legs;
    // the append stream reads neither sidecars nor removed files, so its
    // admission ignores them
    spark.sql("DELETE FROM geocls.db.adm WHERE id = 0") // v4: MoR sidecar
    val m4 = GeoManifest.readVersion(spark, root, 4)
    assert(m4.deletes.nonEmpty || m4.eqDeletes.nonEmpty,
      "expected a merge-on-read (position or equality) delete commit")
    assert(GeoChangelog.admit(spark, root, 0, 4, ReadLimit.maxFiles(3), true) == 3)
    assert(GeoChangelog.admit(spark, root, 0, 4, ReadLimit.maxFiles(3), false) == 4)

    // end-to-end: capped catch-up takes one micro-batch per commit and
    // still delivers every row exactly once
    val q = spark.readStream
      .option("max-files-per-micro-batch", "1")
      .option("skip-overwrite-commits", "true")
      .table("geocls.db.adm")
      .writeStream.format("memory").queryName("geo_adm").start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"caps did not split the backlog: $batches batches")
    val got = spark.table("geo_adm").select($"id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 15L), s"capped catch-up lost rows: $got")
    q.stop()
  }

  test("Trigger.AvailableNow consumes to the pinned end under caps, then stops") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.avn (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.avn SELECT id, 'a' FROM range(0, 4, 1, 1)")
    spark.sql("INSERT INTO geocls.db.avn SELECT id, 'b' FROM range(4, 8, 1, 1)")
    val q = spark.readStream.option("max-files-per-micro-batch", "1")
      .table("geocls.db.avn")
      .writeStream.format("memory").queryName("geo_avn")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    val got = spark.table("geo_avn").select($"id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 8L), s"AvailableNow missed rows: $got")
  }

  test("stream-from-timestamp starts at the first commit at/after the cutoff") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.sft (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.sft SELECT id, 'a' FROM range(0, 4)")   // v1
    Thread.sleep(30) // commit timestamps are millis: separate the commits
    spark.sql("INSERT INTO geocls.db.sft SELECT id, 'b' FROM range(4, 8)")   // v2
    val root = s"$warehouse/db/sft"
    // a cutoff strictly between the two commits: replay must begin at v2
    val cutoff = GeoManifest.commitTsOf(spark, root, 2)
    assert(GeoManifest.commitTsOf(spark, root, 1) < cutoff,
      "need distinct commit timestamps for this test")
    val q = spark.readStream.option("stream-from-timestamp", cutoff.toString)
      .table("geocls.db.sft")
      .writeStream.format("memory").queryName("geo_sft").start()
    q.processAllAvailable()
    val got = spark.table("geo_sft").select($"id").as[Long].collect().sorted.toSeq
    assert(got == (4L until 8L), s"cutoff replay wrong: $got")
    // ...and still tails commits made after the stream started
    spark.sql("INSERT INTO geocls.db.sft SELECT id, 'c' FROM range(8, 10)")
    q.processAllAvailable(); q.stop()
    val tailed = spark.table("geo_sft").select($"id").as[Long].collect().sorted.toSeq
    assert(tailed == (4L until 10L), s"tail after cutoff start: $tailed")
    // both start options together are rejected loudly
    val both = intercept[Exception] {
      spark.readStream.option("stream-from-timestamp", cutoff.toString)
        .option("stream-from-version", "1").table("geocls.db.sft")
        .writeStream.format("memory").queryName("geo_sft_both").start()
        .processAllAvailable()
    }
    assert(both.getMessage != null)
  }

  test("streaming fails on CoW rewrites unless skip-overwrite-commits is set") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.ow (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.ow SELECT id, 'a' FROM range(0, 5)")  // v1 append
    spark.sql("DELETE FROM geocls.db.ow WHERE id = 2")                      // v2 rewrite

    val q = spark.readStream.table("geocls.db.ow")
      .writeStream.format("memory").queryName("geo_stream_ow").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(err.getMessage.contains("non-append") || Option(err.getCause).exists(
      _.getMessage.contains("non-append")), s"got: ${err.getMessage}")

    // with the option set, appends stream and the rewrite commit is skipped
    val q2 = spark.readStream.option("skip-overwrite-commits", "true")
      .table("geocls.db.ow")
      .writeStream.format("memory").queryName("geo_stream_ow_skip").start()
    q2.processAllAvailable()
    val ids = spark.table("geo_stream_ow_skip").select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 5L), s"v1's append must replay even under skip: $ids")
    // v3: a fresh append after the rewrite still arrives
    spark.sql("INSERT INTO geocls.db.ow SELECT id, 'z' FROM range(100, 102)")
    q2.processAllAvailable(); q2.stop()
    val ids2 = spark.table("geo_stream_ow_skip").select($"id").as[Long].collect().sorted.toSeq
    assert(ids2 == ((0L until 5L) ++ (100L until 102L)), s"got $ids2")
  }

  test("stream-from-version=current skips history and only tails") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.tl (id BIGINT) USING geo")
    spark.sql("INSERT INTO geocls.db.tl SELECT id FROM range(0, 50)")
    val q = spark.readStream.option("stream-from-version", "current")
      .table("geocls.db.tl")
      .writeStream.format("memory").queryName("geo_stream_tail").start()
    q.processAllAvailable()
    assert(spark.table("geo_stream_tail").count() == 0, "history must be skipped")
    spark.sql("INSERT INTO geocls.db.tl SELECT id FROM range(50, 53)")
    q.processAllAvailable(); q.stop()
    val ids = spark.table("geo_stream_tail").select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (50L until 53L), s"got $ids")
  }

  test("CDC stream over t.changes equals the batch changelog across CoW commits") {
    warehouse
    val root = s"$warehouse/db/cf"
    spark.sql("CREATE TABLE geocls.db.cf (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.cf SELECT id, 'a' FROM range(0, 6)")  // v1 append
    spark.sql("UPDATE geocls.db.cf SET v = 'u' WHERE id = 3")              // v2 CoW rewrite

    val q = spark.readStream.table("geocls.db.cf.changes")
      .writeStream.format("memory").queryName("geo_cdc").start()
    q.processAllAvailable()
    // v3 lands AFTER the stream started — the next micro-batch tails it
    spark.sql("INSERT INTO geocls.db.cf SELECT id, 'b' FROM range(6, 8)")
    q.processAllAvailable(); q.stop()

    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Int)] =
      df.select($"id", $"v", col(GeoChangelog.ChangeTypeCol).as("ct"),
        col(GeoChangelog.CommitVersionCol).as("cv"))
        .as[(Long, String, String, Int)].collect().sortBy(r => (r._4, r._3, r._1, r._2)).toSeq
    val streamed = canon(spark.table("geo_cdc"))
    val batch = canon(GeoTable.changes(spark, root, 0, 3))
    assert(streamed == batch, s"stream must equal batch changelog:\n$streamed\nvs\n$batch")
    // the CoW rewrite shows the touched file as delete+insert pairs:
    // same row count both ways, pre-image 'a' out, post-image 'u' in
    val v2del = streamed.filter(r => r._4 == 2 && r._3 == "delete")
    val v2ins = streamed.filter(r => r._4 == 2 && r._3 == "insert")
    assert(v2del.nonEmpty && v2del.length == v2ins.length, s"$v2del vs $v2ins")
    assert(v2del.exists(r => r._1 == 3 && r._2 == "a"))
    assert(v2ins.exists(r => r._1 == 3 && r._2 == "u"))
  }

  test("CDC stream from current tails new commits; MoR deletes stream row-granularly") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.cm (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.cm SELECT id, 'a' FROM range(0, 50)")
    val q = spark.readStream.option("stream-from-version", "current")
      .table("geocls.db.cm.changes")
      .writeStream.format("memory").queryName("geo_cdc_tail").start()
    q.processAllAvailable()
    assert(spark.table("geo_cdc_tail").count() == 0, "history must be skipped")
    spark.sql("INSERT INTO geocls.db.cm SELECT id, 'b' FROM range(50, 53)")
    q.processAllAvailable()
    val ids = spark.table("geo_cdc_tail").select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (50L until 53L), s"got $ids")

    // a merge-on-read delete names row subsets — the CDC stream emits
    // exactly those rows as deletes at the MoR commit's version
    GeoTable.delete(spark, s"$warehouse/db/cm", $"id" % 7 === 1L, mode = "mor")
    assert(GeoManifest.read(spark, s"$warehouse/db/cm").deletes.nonEmpty,
      "test setup: the DELETE must have produced a MoR sidecar")
    q.processAllAvailable(); q.stop()
    val morV = GeoManifest.read(spark, s"$warehouse/db/cm").version
    val dels = spark.table("geo_cdc_tail")
      .where(col(GeoChangelog.ChangeTypeCol) === "delete")
      .select($"id", $"v", col(GeoChangelog.CommitVersionCol).as("cv"))
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    val expected = (0L until 53L).filter(_ % 7 == 1)
      .map(i => (i, if (i < 50) "a" else "b", morV))
    assert(dels == expected, s"got $dels, want $expected")

    // batch SQL over t.changes serves the same MoR commit
    val batchDels = spark.read
      .option("from-version", morV - 1).option("to-version", morV)
      .table("geocls.db.cm.changes")
      .select($"id", col(GeoChangelog.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(batchDels == expected.map(e => (e._1, "delete")), s"got $batchDels")
  }

  test("CDC stream==batch across mixed CoW and MoR commits; pruned MoR legs") {
    warehouse
    val root = s"$warehouse/db/cx"
    spark.sql("CREATE TABLE geocls.db.cx (id BIGINT, v STRING, w STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.cx SELECT id, concat('x', id), 'pad' FROM range(0, 40)") // v1
    GeoTable.delete(spark, root, $"id" < 5L, mode = "mor")                                    // v2 MoR
    spark.sql("UPDATE geocls.db.cx SET v = 'u' WHERE id = 20")                                // v3 CoW
    spark.sql("INSERT INTO geocls.db.cx SELECT id, 'y', 'pad' FROM range(40, 44)")            // v4

    val q = spark.readStream.table("geocls.db.cx.changes")
      .writeStream.format("memory").queryName("geo_cdc_mix").start()
    q.processAllAvailable(); q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Int)] =
      df.select($"id", $"v", col(GeoChangelog.ChangeTypeCol).as("ct"),
        col(GeoChangelog.CommitVersionCol).as("cv"))
        .as[(Long, String, String, Int)].collect().sortBy(r => (r._4, r._3, r._1, r._2)).toSeq
    val streamed = canon(spark.table("geo_cdc_mix"))
    val batch = canon(GeoTable.changes(spark, root, 0, 4))
    assert(streamed == batch, s"stream must equal batch changelog:\n$streamed\nvs\n$batch")
    // the MoR commit contributed exactly its deleted rows
    assert(streamed.filter(_._4 == 2) ==
      (0L until 5L).map(i => (i, s"x$i", "delete", 2)))

    // pruned columns + pushed filter over a MoR leg: only the deleted rows
    // matching the filter, no metadata columns requested
    val pruned = spark.read.option("from-version", 1).option("to-version", 2)
      .table("geocls.db.cx.changes")
      .where($"id" >= 2L).select($"v")
      .as[String].collect().sorted.toSeq
    assert(pruned == Seq("x2", "x3", "x4"), s"got $pruned")
  }

  test("streamed rows respect pushed filters and pruned columns") {
    warehouse
    spark.sql("CREATE TABLE geocls.db.pf (id BIGINT, v STRING, w STRING) USING geo")
    spark.sql("INSERT INTO geocls.db.pf SELECT id, concat('v', id), 'pad' FROM range(0, 20)")
    val q = spark.readStream.table("geocls.db.pf")
      .where($"id" >= 15).select($"id", $"v")
      .writeStream.format("memory").queryName("geo_stream_pf").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("geo_stream_pf").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == (15L until 20L).map(i => (i, s"v$i")), s"got $got")
  }
}
