package graft

import graft.tables.{GeoManifest, GeoTable}
import graft.tables.GeoManifest.{FileEntry, Manifest}

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Manifest format v5: sharded file lists (SURVEY.md §2.8b — the Iceberg
  * manifest-list/manifest split). Above `spark.graft.manifest.shardSize`
  * entries the manifest becomes a list referencing immutable shard
  * files, so a commit rewrites O(changed files) metadata, not the whole
  * inventory. */
class GeoManifestShardSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def entries(n: Int, from: Int = 0): Seq[FileEntry] =
    (from until from + n).map(i =>
      // addedAt pinned: write() stamps the sentinel -1 to the committing
      // version, so round-trip comparisons need the post-commit value
      FileEntry(s"/data/part-$i.parquet", 10L, i, 0.0, i + 1.0, 1.0, addedAt = 0))

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"geoshard_$tag").toString + "/t"

  private def shardFilesOnDisk(root: String): Set[String] = {
    val d = new java.io.File(root, "_manifests")
    Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("s-")).toSet
  }

  private def withShardSize[A](n: Int)(body: => A): A = {
    spark.conf.set("spark.graft.manifest.shardSize", n.toString)
    try body finally spark.conf.unset("spark.graft.manifest.shardSize")
  }

  test("sharded manifests round-trip; appends reuse unchanged shards") {
    withShardSize(16) {
      val root = tmpRoot("rt")
      val m0 = Manifest(0, schema, None, entries(100))
      GeoManifest.write(spark, root, m0)

      // the list file carries shard lines, no inline file lines
      val listText = java.nio.file.Files.readString(
        java.nio.file.Path.of(root, "_manifests", "m0.txt"))
      assert(listText.startsWith("graftgeo\t5"), listText.take(40))
      assert(listText.contains("\nshard\t") && !listText.contains("\nfile\t"))

      val r0 = GeoManifest.read(spark, root)
      assert(r0.files.sortBy(_.path) == m0.files.sortBy(_.path))
      assert(r0.schema == schema && r0.baseShards.nonEmpty)
      // header-only ts fast path agrees with the full parse
      assert(GeoManifest.commitTsOf(spark, root, 0) == r0.commitTs.get)

      // append ONE file: full shards are referenced unchanged, only the
      // tail micro-shard (<= ss/4 entries, folded by design) is rewritten
      val m1 = r0.copy(version = 1, files = r0.files ++ entries(1, from = 100))
      GeoManifest.write(spark, root, m1)
      val r1 = GeoManifest.read(spark, root)
      assert(r1.files.map(_.path).toSet == m1.files.map(_.path).toSet)
      val shared = r1.baseShards.map(_.name).toSet
        .intersect(r0.baseShards.map(_.name).toSet)
      assert(shared.size == 6, // 100 = 6 full shards of 16 + a tail of 4
        s"6 full shards must be reused by reference, shared=$shared")
    }
  }

  test("removing a file dissolves only its shard") {
    withShardSize(16) {
      val root = tmpRoot("rm")
      GeoManifest.write(spark, root, Manifest(0, schema, None, entries(96)))
      val r0 = GeoManifest.read(spark, root)
      assert(r0.baseShards.length == 6 && r0.baseShards.forall(_.entries.length == 16))
      val victim = r0.baseShards.head.entries.head.path
      val m1 = r0.copy(version = 1, files = r0.files.filterNot(_.path == victim))
      GeoManifest.write(spark, root, m1)
      val r1 = GeoManifest.read(spark, root)
      assert(r1.files.length == 95 && !r1.files.exists(_.path == victim))
      val shared = r1.baseShards.map(_.name).toSet
        .intersect(r0.baseShards.map(_.name).toSet)
      assert(shared.size == 5, s"five untouched shards must survive, shared=$shared")
    }
  }

  test("vacuum drops shard files no kept manifest references") {
    withShardSize(16) {
      val root = tmpRoot("gc")
      GeoManifest.write(spark, root, Manifest(0, schema, None, entries(100)))
      val r0 = GeoManifest.read(spark, root)
      val m1 = r0.copy(version = 1,
        files = r0.files.drop(20) ++ entries(10, from = 100)) // dissolve shard 1+2
      GeoManifest.write(spark, root, m1)
      val before = shardFilesOnDisk(root)
      val r1 = GeoManifest.read(spark, root)
      assert(before.size > r1.baseShards.length, "orphaned v0 shards exist pre-vacuum")

      GeoTable.vacuum(spark, root, keepVersions = 1)
      assert(shardFilesOnDisk(root) == r1.baseShards.map(_.name).toSet,
        "exactly the current version's shards survive vacuum")
      // current snapshot still reads
      assert(GeoManifest.read(spark, root).files.length == 90)
    }
  }

  test("end-to-end: a sharded table serves reads, CoW DML, and time travel") {
    withShardSize(3) {
      val root = tmpRoot("e2e")
      val df = spark.range(100).toDF("id")
        .withColumn("flag", lit(0))
        .withColumn("geo", st_point(col("id").cast("double"), lit(0.0)))
        .repartitionByRange(6, col("id"))
      GeoTable.create(spark, root, df, Some("geo"))
      val v0 = GeoManifest.read(spark, root)
      assert(v0.baseShards.nonEmpty, "6 files >= shardSize 3 must shard")

      val n = GeoTable.update(spark, root, Seq("flag" -> lit(1)),
        expr("st_within(geo, st_makeenvelope(10.5D, -1.0D, 19.5D, 1.0D))"))
      assert(n == 9)
      val v1 = GeoManifest.read(spark, root)
      assert(v1.baseShards.nonEmpty && v1.version == v0.version + 1)

      val flags = GeoTable.read(spark, root).select("id", "flag")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      (0L until 100L).foreach(i =>
        assert(flags(i) == (if (i >= 11 && i <= 19) 1 else 0), s"id $i"))
      // time travel across sharded versions
      val back = GeoTable.readAt(spark, root, v0.version)
      assert(back.filter(col("flag") === 1).count() == 0)
    }
  }
}
