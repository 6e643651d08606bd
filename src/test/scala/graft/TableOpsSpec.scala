package graft

import graft.functions.GraftFunctions._

import org.apache.spark.sql.functions._

/**
 * The reference's remaining behavioral contract beyond queries
 * (reference: extension/src/test/scala/org/apache/iceberg/
 * TestSedonaIcebergExtension.scala drives CTAS, caching, and UPDATE with a
 * spatial predicate against Iceberg tables) — here against parquet-backed
 * tables: CTAS via saveAsTable/sql, CACHE TABLE, and predicate-driven
 * copy-on-write update (the table-format-free analog of spatial DML).
 */
class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("CTAS with geometry column + cache + spatial query on cached table") {
    spark.sql("DROP TABLE IF EXISTS geo_ctas")
    spark.range(100).selectExpr("id", "st_point(CAST(id % 10 AS DOUBLE), CAST(id % 7 AS DOUBLE)) AS g")
      .createOrReplaceTempView("geo_src")
    spark.sql("CREATE TABLE geo_ctas USING parquet AS SELECT * FROM geo_src")
    spark.sql("CACHE TABLE geo_ctas")
    try {
      val n = sql1("SELECT COUNT(*) FROM geo_ctas WHERE st_contains(st_makeenvelope(-0.5,-0.5,4.5,3.5), g)")
      val expected = (0L until 100L).count(i => (i % 10) <= 4 && (i % 7) <= 3)
      assert(n == expected)
      // cached plan is InMemoryRelation
      val plan = spark.sql("SELECT * FROM geo_ctas").queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"))
    } finally {
      spark.sql("UNCACHE TABLE geo_ctas")
      spark.sql("DROP TABLE geo_ctas")
    }
  }

  test("copy-on-write UPDATE with spatial predicate (parquet analog of spatial DML)") {
    val dir = java.nio.file.Files.createTempDirectory("geodml").toString
    spark.range(50).selectExpr("id", "st_point(CAST(id AS DOUBLE), 0.0D) AS g", "0 AS flag")
      .write.mode("overwrite").parquet(dir)

    // UPDATE t SET flag = 1 WHERE st_within(g, <envelope>)
    val t = spark.read.parquet(dir)
    val fence = st_polygonFromEnvelope(lit(9.5), lit(-1.0), lit(19.5), lit(1.0))
    val updated = t.withColumn("flag",
      when(st_within(col("g"), fence), lit(1)).otherwise(col("flag")))
    val out = dir + "_v2"
    updated.write.mode("overwrite").parquet(out)

    val flags = spark.read.parquet(out).selectExpr("id", "flag").as[(Long, Int)].collect().toMap
    assert((0L until 50L).forall(i => flags(i) == (if (i >= 10 && i <= 19) 1 else 0)))
  }

  test("geometry survives a write/read cycle through parquet tables byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("geort").toString
    val src = spark.range(20).selectExpr("id",
      "st_buffer(st_point(CAST(id AS DOUBLE), 1.0D), 0.5D) AS g")
    src.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = src.selectExpr("id", "st_astext(g) AS w").as[(Long, String)].collect().toMap
    val b = back.selectExpr("id", "st_astext(g) AS w").as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
