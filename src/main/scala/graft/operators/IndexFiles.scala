package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem plumbing shared by the persisted indexes ([[DedupIndex]],
  * [[IvfPqIndex]]): existence-gated artifact reads (tombstones, bloom,
  * applied-epoch markers are all optional sidecars) and the staged
  * compact swap.
  *
  * Everything goes through the Hadoop `FileSystem` API resolved FROM THE
  * PATH — never `java.io.File` — because build/append/search already run
  * through Spark and work on any Hadoop-compatible store; at the 100 TB
  * daily-ingest target the index lives on distributed storage, where a
  * `java.io.File` rename would fail after writing the staged copy
  * (the round-8 compact bug). */
private[graft] object IndexFiles {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  /** The optional-sidecar read: None when the directory was never
    * written (e.g. an index with no deletes has no tombstones). */
  def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(spark, dir)) Some(spark.read.parquet(dir)) else None

  def remove(spark: SparkSession, dir: String): Unit = {
    fs(spark, dir).delete(new Path(dir), true); ()
  }

  /** Swap a staged rewrite into place: live → `<live>_old`, staged →
    * live, drop old. A crash before the first rename leaves the original
    * intact; between the renames the original survives at `_old` (the
    * require message says where). Not safe against a CONCURRENT reader
    * across the swap instant — compacts run in the index's write lane,
    * like appends. */
  def swapIn(spark: SparkSession, live: String, staged: String): Unit = {
    val lp = new Path(live)
    val sp = new Path(staged)
    val f = fs(spark, live)
    val old = new Path(live + "_old")
    f.delete(old, true)
    require(f.rename(lp, old) && f.rename(sp, lp),
      s"compact swap failed for $live — original left at $old")
    f.delete(old, true)
    ()
  }
}
