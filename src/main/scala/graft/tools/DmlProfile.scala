package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev: per-statement + per-job timing of the geo_dml_delete_eq_sql
  * workflow (7 commits) — separates plan time from commit overhead.
  *
  * usage: runMain graft.tools.DmlProfile [sfDir] [reps]
  */
object DmlProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)
    spark.sql("SELECT COUNT(*) FROM customer").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    def time[T](name: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      println(f"[dml] $name%-22s ${dt}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }

    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val t0 = System.nanoTime()
      val s = spark
      if (s.conf.getOption("spark.sql.catalog.geoeqv").isEmpty) {
        s.conf.set("spark.sql.catalog.geoeqv", classOf[graft.tables.GeoCatalog].getName)
        s.conf.set("spark.sql.catalog.geoeqv.warehouse",
          java.nio.file.Files.createTempDirectory("geo_eqv_wh").toString)
      }
      time("namespace+drop") {
        s.sql("CREATE NAMESPACE IF NOT EXISTS geoeqv.db")
        s.sql("DROP TABLE IF EXISTS geoeqv.db.sq")
      }
      time("create") {
        s.sql("CREATE TABLE geoeqv.db.sq (id BIGINT, nat BIGINT) USING geo")
      }
      time("evens checkpoint") {
        s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM customer " +
          "WHERE c_custkey % 2 = 0").localCheckpoint()
          .createOrReplaceTempView("eqsql_evens")
      }
      time("insert v1") {
        s.sql("INSERT INTO geoeqv.db.sq SELECT id, nat FROM eqsql_evens")
      }
      time("delete IN v2") {
        s.sql("DELETE FROM geoeqv.db.sq WHERE id IN (4, 10, 22, 40, 78)")
      }
      time("delete = v3") {
        s.sql("DELETE FROM geoeqv.db.sq WHERE id = 100")
      }
      val root = java.nio.file.Files.createTempDirectory("geo_eqs_p").toString + "/t"
      time("path create") {
        graft.tables.GeoTable.create(s, root, s.table("eqsql_evens"), None)
        graft.tables.GeoTable.register(s, "eqsql_path_t", root)
      }
      time("subquery delete") {
        graft.tables.GeoSql.exec(s, "DELETE FROM eqsql_path_t WHERE id IN " +
          "(SELECT id FROM eqsql_evens WHERE id % 31 = 9)")
      }
      time("merge") {
        s.sql("SELECT id, CAST(-1 AS BIGINT) AS nat FROM eqsql_evens WHERE id % 7 = 0 " +
          "UNION ALL SELECT id + 10000000, CAST(-2 AS BIGINT) FROM eqsql_evens " +
          "WHERE id % 13 = 0")
          .createOrReplaceTempView("eqsql_path_src")
        graft.tables.GeoSql.exec(s,
          """MERGE INTO eqsql_path_t t USING eqsql_path_src s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET id = s.id, nat = s.nat
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      time("final select") {
        s.sql("""
          SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id,
                 CAST(SUM(nat) AS BIGINT) AS sum_nat
          FROM geoeqv.db.sq
          UNION ALL
          SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT), CAST(SUM(nat) AS BIGINT)
          FROM eqsql_path_t
          ORDER BY phase""").collect()
      }
      println(f"[dml] TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
