package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: langId accuracy vs the documents table's true lang, per SF. */
object LangAcc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .withColumn("pred", graft.ops.TextAnalysis.langId(col("text")))
      val mis = d.where(col("pred") =!= col("lang"))
      println(s"$sf: total=${d.count()} mismatches=${mis.count()}")
      mis.groupBy("lang", "pred").count().orderBy(desc("count")).show(10, false)
    }
    spark.stop()
  }
}
