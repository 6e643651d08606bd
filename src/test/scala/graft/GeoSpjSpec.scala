package graft

import graft.tables.{GeoCatalog, GeoManifest}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/**
 * Storage-partitioned joins (SURVEY.md §2.8b; Iceberg SPJ analog): two geo
 * tables co-partitioned on the same transforms equi-join with ZERO shuffle
 * Exchange. The write side makes it possible — transform-clustered writes
 * roll files at tuple boundaries, so every file is single-valued in every
 * layout transform and the scan can report KeyGroupedPartitioning with a
 * per-split partition key.
 */
class GeoSpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_spj_wh").toString
    spark.conf.set("spark.sql.catalog.geospj", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geospj.warehouse", dir)
    // toy-scale partitions: force tuple-boundary rolling below the
    // production rollMinRows default so every file is single-valued
    spark.conf.set("spark.graft.write.rollMinRows", "1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geospj.db")
    dir
  }

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** All shuffle exchanges anywhere in the (possibly adaptive) plan —
    * walks INTO query stages, which plain collect() treats as leaves (an
    * exchange hidden inside a finalized ShuffleQueryStage must still
    * count, or a zero-shuffle assertion is vacuous). */
  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] = {
    df.count() // finalize any adaptive plan first
    val buf = scala.collection.mutable.ListBuffer.empty[ShuffleExchangeExec]
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
      case s: ShuffleExchangeExec => buf += s; s.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.toList
  }

  private val spjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("bucket-co-partitioned tables join with zero shuffle") {
    warehouse
    spark.sql("CREATE TABLE geospj.db.fact (id BIGINT, v STRING) USING geo " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE geospj.db.dim (id BIGINT, w STRING) USING geo " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO geospj.db.fact SELECT id, concat('f', id) FROM range(0, 4000)")
    spark.sql("INSERT INTO geospj.db.dim SELECT id, concat('d', id) FROM range(0, 1000)")

    // precondition the writer guarantees: every file single-valued in the
    // bucket transform (roll-at-tuple-boundary), so the scan can report
    // KeyGroupedPartitioning
    for (t <- Seq("fact", "dim")) {
      val m = GeoManifest.read(spark, s"$warehouse/db/$t")
      val live = m.files.filter(_.rows > 0)
      assert(live.nonEmpty)
      assert(live.forall(f => f.pstats.nonEmpty && f.pstats.head._1 == f.pstats.head._2),
        s"$t: files must be single-valued in bucket(4, id): " +
          live.map(_.pstats).mkString(", "))
    }

    withSQLConf(spjConfs: _*) {
      val j = spark.sql(
        """SELECT f.id, f.v, d.w FROM geospj.db.fact f
          |JOIN geospj.db.dim d ON f.id = d.id""".stripMargin)
      assert(shuffles(j).isEmpty,
        s"storage-partitioned join must plan no Exchange:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 1000)
      // correctness: identical to the join computed with SPJ disabled
      val expected = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        spark.sql(
          """SELECT f.id, f.v, d.w FROM geospj.db.fact f
            |JOIN geospj.db.dim d ON f.id = d.id""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(j.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("identity-co-partitioned tables join with zero shuffle") {
    warehouse
    spark.sql("CREATE TABLE geospj.db.li (k BIGINT, v STRING) USING geo " +
      "PARTITIONED BY (k)")
    spark.sql("CREATE TABLE geospj.db.ri (k BIGINT, w STRING) USING geo " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO geospj.db.li SELECT id % 5, concat('l', id) FROM range(0, 2000)")
    spark.sql("INSERT INTO geospj.db.ri SELECT id % 5, concat('r', id) FROM range(0, 500)")
    withSQLConf(spjConfs: _*) {
      val j = spark.sql(
        "SELECT l.k, count(*) AS n FROM geospj.db.li l JOIN geospj.db.ri r ON l.k = r.k " +
          "GROUP BY l.k")
      // the JOIN itself must not shuffle; the groupBy on k rides the same
      // key-grouped partitioning, so the whole query is exchange-free
      assert(shuffles(j).isEmpty,
        s"identity SPJ must plan no Exchange:\n${j.queryExecution.executedPlan}")
      assert(j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        (0L to 4L).map(k => k -> 40000L).toMap)
    }
  }

  test("SPJ with mismatched partition value sets (pushPartValues padding)") {
    warehouse
    // one side populates only HALF the buckets: Spark pads the missing
    // partition values (pushPartValues) and the join still plans with
    // zero Exchange and returns exactly the matching rows
    spark.sql("CREATE TABLE geospj.db.dimsub (id BIGINT, w STRING) USING geo " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO geospj.db.dimsub " +
      "SELECT id, concat('s', id) FROM range(0, 1000) WHERE pmod(hash(id), 4) IN (0, 1)")
    val expected = spark.sql(
      "SELECT count(*) FROM range(0, 1000) WHERE pmod(hash(id), 4) IN (0, 1)")
      .head().getLong(0)
    assert(expected > 0 && expected < 1000)
    withSQLConf(spjConfs: _*) {
      val j = spark.sql(
        """SELECT f.id FROM geospj.db.fact f
          |JOIN geospj.db.dimsub d ON f.id = d.id""".stripMargin)
      assert(shuffles(j).isEmpty,
        s"mismatched-value-set SPJ must still be exchange-free:\n${j.queryExecution.executedPlan}")
      assert(j.count() == expected)
    }
  }

  test("shuffle-one-side: a plain table shuffles INTO the geo table's grouping") {
    warehouse
    // fact/dim from the first test: fact is bucket(4, id)-partitioned.
    // With v2.bucketing.shuffle enabled, joining a NON-geo table shuffles
    // only that side into the reported key grouping — the geo side reads
    // in place (one Exchange total, on the plain side).
    val plainDir = java.nio.file.Files.createTempDirectory("geo_spj_plain").toString
    spark.range(0, 500).selectExpr("id", "concat('p', id) AS p")
      .write.mode("overwrite").parquet(plainDir)
    spark.read.parquet(plainDir).createOrReplaceTempView("spj_plain")
    withSQLConf(spjConfs :+
      ("spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true"): _*) {
      val j = spark.sql(
        """SELECT f.id, f.v, p.p FROM geospj.db.fact f
          |JOIN spj_plain p ON f.id = p.id""".stripMargin)
      val ex = shuffles(j)
      assert(ex.length == 1,
        s"expected exactly one Exchange (the plain side):\n${j.queryExecution.executedPlan}")
      // the shuffled side must be the plain parquet side, not the geo scan
      assert(!ex.head.child.toString.contains("GeoCowScan"),
        s"the GEO side was shuffled:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 500)
    }
  }

  test("non-co-partitioned and unpartitioned joins still shuffle correctly") {
    warehouse
    spark.sql("CREATE TABLE geospj.db.plain (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geospj.db.plain SELECT id, concat('p', id) FROM range(0, 1000)")
    withSQLConf(spjConfs: _*) {
      // unpartitioned side: no KeyGroupedPartitioning -> normal shuffled join
      val j = spark.sql(
        """SELECT f.id, p.v FROM geospj.db.fact f
          |JOIN geospj.db.plain p ON f.id = p.id""".stripMargin)
      assert(shuffles(j).nonEmpty, "a plain-side join must still shuffle")
      assert(j.count() == 1000)
    }
  }

  test("bucketing on but pushPartValues off: SPJ is withheld, join degrades to shuffle") {
    warehouse
    // This scan also advertises runtime V2 filtering; with pushPartValues
    // disabled Spark cannot tolerate a runtime-shrunk group set and fails
    // at execution rather than re-planning. The scan therefore withholds
    // KeyGroupedPartitioning unless the conf pair is complete — the query
    // must plan a normal shuffled join and stay correct.
    withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "true",
                "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "false",
                "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT f.id, f.v, d.w FROM geospj.db.fact f
          |JOIN geospj.db.dim d ON f.id = d.id""".stripMargin)
      assert(shuffles(j).nonEmpty,
        s"without pushPartValues the scan must not report key grouping:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 1000)
    }
  }

  test("null partition values disable SPJ (min/max stats cannot express a NULL key)") {
    warehouse
    // The hazard shape: min/max ignore nulls, so a file holding NULL
    // partition values plus one non-null value reads lo==hi and WOULD be
    // claimed single-valued from stats alone. NULL is a legal partition
    // value — under KeyGroupedPartitioning each append's null-carrying
    // file could claim a DIFFERENT value, mis-clustering null rows
    // (duplicate NULL groups in an exchange-eliminated GROUP BY). The
    // writer records a per-transform saw-null flag; the scan must refuse
    // to report SPJ for such files, and the query shuffles as usual.
    withSQLConf("spark.graft.write.rollMinRows" -> "100000", // merge the null run into the value file
                "spark.sql.shuffle.partitions" -> "1") {     // one task = one file per append
      spark.sql("CREATE TABLE geospj.db.nullp (k BIGINT, v STRING) USING geo " +
        "PARTITIONED BY (k)")
      spark.sql("INSERT INTO geospj.db.nullp " +
        "SELECT IF(id < 50, CAST(NULL AS BIGINT), 7L), concat('a', id) FROM range(0, 100)")
      spark.sql("INSERT INTO geospj.db.nullp " +
        "SELECT IF(id < 50, CAST(NULL AS BIGINT), 9L), concat('b', id) FROM range(0, 100)")
    }
    val m = GeoManifest.read(spark, s"$warehouse/db/nullp")
    val live = m.files.filter(_.rows > 0)
    // every live file must carry the recorded flag, and the dangerous
    // shape must actually be present: saw-null AND single-valued min/max
    assert(live.forall(_.pnulls.nonEmpty), s"writers must record pnulls: $live")
    assert(live.exists(f => f.pnulls.head && f.pstats.nonEmpty &&
        f.pstats.head._1 == f.pstats.head._2),
      s"test should produce a null-plus-single-value file: " +
        live.map(f => (f.pstats, f.pnulls)).mkString(", "))
    withSQLConf(spjConfs: _*) {
      val g = spark.sql("SELECT k, count(*) AS n FROM geospj.db.nullp GROUP BY k")
      assert(shuffles(g).nonEmpty,
        s"a null-carrying table must not be key-grouped:\n${g.queryExecution.executedPlan}")
      val got = g.collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toMap
      assert(got == Map(-1L -> 100L, 7L -> 50L, 9L -> 50L))
      // null-safe self-join: every NULL row matches every NULL row
      val j = spark.sql(
        "SELECT count(*) AS n FROM geospj.db.nullp a JOIN geospj.db.nullp b ON a.k <=> b.k")
      assert(j.head().getLong(0) == 100L * 100 + 50L * 50 + 50L * 50)
    }
  }

  test("CoW DML preserves SPJ: joins stay exchange-free with NO intervening OPTIMIZE") {
    warehouse
    spark.sql("CREATE TABLE geospj.db.mut (id BIGINT, v STRING) USING geo " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO geospj.db.mut SELECT id, concat('m', id) FROM range(0, 2000)")
    // The CoW rewrite requests the same transform-space clustering as
    // batch inserts and rolls files at tuple boundaries, so a DML
    // statement leaves every file single-valued — SPJ survives DML
    // without an OPTIMIZE roundtrip (the Iceberg fanout-writer property).
    spark.sql("UPDATE geospj.db.mut SET v = 'upd' WHERE id < 1500")
    val m1 = GeoManifest.read(spark, s"$warehouse/db/mut")
    assert(m1.files.filter(_.rows > 0)
      .forall(f => f.pstats.nonEmpty && f.pstats.head._1 == f.pstats.head._2),
      s"DML must keep files single-valued in bucket(4, id): " +
        m1.files.filter(_.rows > 0).map(_.pstats).mkString(", "))
    withSQLConf(spjConfs: _*) {
      val j1 = spark.sql(
        """SELECT a.id FROM geospj.db.mut a JOIN geospj.db.dim d ON a.id = d.id""")
      assert(shuffles(j1).isEmpty,
        s"post-UPDATE join must be exchange-free WITHOUT OPTIMIZE:\n${j1.queryExecution.executedPlan}")
      assert(j1.count() == 1000)
      assert(spark.sql("SELECT count(*) FROM geospj.db.mut WHERE v = 'upd'")
        .head().getLong(0) == 1500)
      // a DELETE that rewrites files (not metadata-drop) also preserves it
      spark.sql("DELETE FROM geospj.db.mut WHERE id < 100 AND id % 2 = 0")
      val m2 = GeoManifest.read(spark, s"$warehouse/db/mut")
      assert(m2.files.filter(_.rows > 0)
        .forall(f => f.pstats.nonEmpty && f.pstats.head._1 == f.pstats.head._2),
        "DELETE must keep files single-valued")
      val j2 = spark.sql(
        """SELECT a.id FROM geospj.db.mut a JOIN geospj.db.dim d ON a.id = d.id""")
      assert(shuffles(j2).isEmpty,
        s"post-DELETE join must be exchange-free:\n${j2.queryExecution.executedPlan}")
      assert(j2.count() == 950)
    }
  }
}
