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
      // addedAt/spec pinned: write() stamps the sentinels -1 to the
      // committing version / current spec id, so round-trip comparisons
      // need the post-commit values
      FileEntry(s"/data/part-$i.parquet", 10L, i, 0.0, i + 1.0, 1.0,
        addedAt = 0, spec = 0))

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

  test("a second write of an existing manifest version fails loudly, first commit intact") {
    // cross-JVM lost-commit detection: same-JVM writers serialize on the
    // commit lock and remapVersion past existing files, so a version-file
    // collision can only be a second JVM's racing commit (the optimistic
    // _current check is atomic per JVM only) — overwriting would silently
    // discard one commit's files
    val root = tmpRoot("excl")
    GeoManifest.write(spark, root, Manifest(0, schema, None, entries(3)))
    // ConcurrentModificationException: the commit paths' retry loops
    // catch it, and retrying slides past the winner to a free version
    val e = intercept[java.util.ConcurrentModificationException] {
      GeoManifest.write(spark, root, Manifest(0, schema, None, entries(5)))
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    assert(GeoManifest.read(spark, root).files.length == 3)
  }

  test("fuzz: manifests round-trip arbitrary stats, saw-null flags, eq ranges") {
    // deterministic fuzz over the full file-line + eqdelete-line grammar:
    // every combination of bbox/NaN, 0..3 transform pairs, absent/present
    // saw-null flags, addedAt, leading + tail key ranges — inline AND
    // sharded layouts — must read back exactly (eq deletes modulo the
    // writer's liveness GC, which the test recomputes with the public
    // rule). This is the guard for the v8 token + parity disambiguation.
    val rnd = new scala.util.Random(421L)
    for (it <- 0 until 40) {
      val nT = rnd.nextInt(4) // transforms
      val parts = (0 until nT).map(i =>
        graft.tables.GeoPartition.PTransform("stats", 0, s"c$i"))
      val sch = StructType(StructField("id", LongType) +:
        (0 until nT).map(i => StructField(s"c$i", LongType)))
      val nF = 1 + rnd.nextInt(30)
      val files = (0 until nF).map { i =>
        val hasP = nT > 0 && rnd.nextBoolean()
        val ps = if (hasP) (0 until nT).map { _ =>
          val lo = rnd.nextLong() % 100000
          (lo, lo + rnd.nextInt(1000)) } else Seq.empty
        val pn = if (hasP && rnd.nextBoolean()) (0 until nT).map(_ => rnd.nextBoolean())
                 else Seq.empty[Boolean]
        val bbox = if (rnd.nextBoolean()) Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
                   else Seq(rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble() + 1, rnd.nextDouble() + 1)
        FileEntry(s"/data/part-$it-$i.parquet", 1 + rnd.nextInt(100),
          bbox(0), bbox(1), bbox(2), bbox(3), ps, addedAt = rnd.nextInt(3), pnulls = pn)
      }
      val nE = rnd.nextInt(3)
      val eqs = (0 until nE).map { j =>
        val nc = 1 + rnd.nextInt(math.max(nT, 1))
        val cols = (0 until nc).map(i => s"c${i % math.max(nT, 1)}")
        val withRange = rnd.nextBoolean()
        GeoManifest.EqDeleteEntry(s"/data/e$it-$j.parquet", 1 + rnd.nextInt(10),
          cols, version = 5,
          kmin = if (withRange) Some(rnd.nextLong() % 1000) else None,
          kmax = if (withRange) Some(rnd.nextLong() % 1000 + 2000) else None,
          kranges = if (withRange && nc > 1)
            (0 until nc - 1).map(_ =>
              if (rnd.nextBoolean()) Some((rnd.nextLong() % 1000, rnd.nextLong() % 1000 + 2000))
              else None)
          else Seq.empty)
      }
      val root = tmpRoot(s"fuzz$it")
      val written = Manifest(0, sch, None, files, eqDeletes = eqs, partitions = parts)
      withShardSize(if (rnd.nextBoolean()) 8 else 100000) {
        GeoManifest.write(spark, root, written)
      }
      val back = GeoManifest.read(spark, root)
      // the writer GC's eq deletes that can apply to no file — recompute
      // the survivor set with the same public rule; addedAt persists
      // ONLY while eq deletes are live (designed lossiness: without
      // them, "oldest" is exact), so the oracle zeroes it in that case
      val expectEq0 = eqs.filter(e => files.exists(f => GeoManifest.eqApplies(parts, e, f)))
      val keepSeq = expectEq0.nonEmpty
      // NaN != NaN under case-class equality — compare via string bboxes
      def norm(f: FileEntry) = (f.path, f.rows,
        Seq(f.xmin, f.ymin, f.xmax, f.ymax).map(_.toString),
        f.pstats.toList, if (keepSeq) f.addedAt else 0, f.pnulls.toList)
      assert(back.files.sortBy(_.path).map(norm) == files.sortBy(_.path).map(norm),
        s"it=$it files mismatch:\n${back.files.sortBy(_.path)}\nvs\n${files.sortBy(_.path)}")
      assert(back.eqDeletes == expectEq0,
        s"it=$it eq mismatch:\n${back.eqDeletes}\nvs\n$expectEq0")
      assert(back.partitions == parts && back.schema == sch)
    }
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
