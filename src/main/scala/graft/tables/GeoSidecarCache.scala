package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow

/**
 * Driver-side cache of materialized delete sidecars. Every catalog scan
 * build loads the snapshot's live position sidecars (a (file, ordinal)
 * map) and equality-delete key sets (UnsafeRows for the reader's
 * byte-hash probes); on a busy table that is a repeated per-query driver
 * cost bounded only by `maxLiveDeleteRows`. Sidecar parquet files are
 * IMMUTABLE — a path (plus the cast column list for key sets) fully
 * identifies the content — so the materialization is cached by path set
 * under SoftReferences: repeated scans of an unchanged table pay one
 * parquet read, new commits mint new paths and miss naturally, and the
 * GC reclaims entries under memory pressure.
 */
object GeoSidecarCache {

  private val MaxEntries = 256

  // access-ordered LRU: at capacity only the least-recently-USED entry is
  // evicted — a driver serving many busy tables keeps its hot sidecars
  // memoized instead of dumping all of them at once and re-loading
  // everything (the old clear()-at-capacity behavior)
  private val cache =
    new java.util.LinkedHashMap[String, java.lang.ref.SoftReference[AnyRef]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.ref.SoftReference[AnyRef]]): Boolean =
        size() > MaxEntries
    }

  /** Loads that could not be served from cache, per key — observable by
    * specs pinning the one-read-per-sidecar-set contract (keyed so
    * concurrent suites in one JVM don't interfere). */
  val misses = new java.util.concurrent.atomic.AtomicLong()
  private val loadCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total cache-miss loads of keys mentioning `pathFragment`. */
  def loadsFor(pathFragment: String): Long = {
    var n = 0L
    loadCounts.forEach((k, v) => if (k.contains(pathFragment)) n += v)
    n
  }

  // private[graft]: the LRU-survival spec drives the cache with synthetic
  // keys (256+ real sidecar parquet files would make the spec IO-bound)
  private[graft] def getOrLoad[A <: AnyRef](key: String)(load: => A): A = {
    val hit = cache.synchronized {
      val ref = cache.get(key) // get() refreshes LRU recency
      if (ref == null) null else ref.get()
    }
    if (hit != null) return hit.asInstanceOf[A]
    misses.incrementAndGet()
    loadCounts.merge(key, 1L, (a, b) => a + b)
    val v = load
    cache.synchronized {
      cache.put(key, new java.lang.ref.SoftReference[AnyRef](v)): Unit
    }
    v
  }

  /** (normalized data-file path -> sorted deleted ordinals) for a set of
    * position sidecars — the map every MoR-merging scan and changelog
    * leg resolves per partition. */
  def positions(spark: SparkSession,
                entries: Seq[GeoManifest.DeleteEntry]): Map[String, Array[Long]] =
    if (entries.isEmpty) Map.empty
    else getOrLoad("pos:" + entries.map(_.path).sorted.mkString("\u0000")) {
      spark.read.parquet(entries.map(_.path): _*)
        .select("file_path", "pos").collect()
        .groupBy(r => GeoManifest.norm(r.getString(0)))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted.toArray }
    }

  /** One equality-delete sidecar's key tuples as UnsafeRows cast to the
    * table column types (byte-layout-identical to the reader-side key
    * projection, so membership is a raw-bytes hash probe). */
  def eqKeys(spark: SparkSession, e: GeoManifest.EqDeleteEntry,
             tableSchema: org.apache.spark.sql.types.StructType): Array[InternalRow] =
    getOrLoad("eq:" + e.path + ":" + e.cols.mkString(",")) {
      spark.read.parquet(e.path)
        .select(e.cols.map(c => org.apache.spark.sql.functions.col(c)
          .cast(tableSchema(c).dataType)): _*)
        .queryExecution.toRdd.map(_.copy()).collect()
    }
}
