package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics
import graft.streaming.StreamMetrics

class StreamMetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_smetrics_$tag").toString

  private type Grade = (Long, Long, Double, Long, Double, Double)
  private def gradeRow(df: org.apache.spark.sql.DataFrame): Grade = {
    val r = df.collect().head
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Double]("auc"),
      r.getAs[Long]("n"), r.getAs[Double]("ece"), r.getAs[Double]("mce"))
  }
  private def batchGrade(rows: Seq[(Double, Long)]): Grade = {
    val df = rows.toDF("score", "y")
    gradeRow(Metrics.auc(df, col("score"), col("y"))
      .crossJoin(broadcast(Metrics.ece(df, col("score"), col("y")))))
  }

  test("per-epoch cumulative grade == batch grade over the rows seen; " +
    "replayed epoch never double-counts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("twin")
    val e1 = Seq((0.9, 1L), (0.2, 0L), (0.7, 1L), (0.7, 0L))
    val e2 = Seq((0.4, 0L), (0.95, 1L), (0.7, 1L)) // re-hits the 0.7 bin
    val mem = MemoryStream[(Double, Long)]
    val grades = scala.collection.mutable.Map[Long, Grade]()
    val q = StreamMetrics.writer(mem.toDS().toDF("score", "y"),
        col("score"), col("y"), dir) { (g, epoch) =>
      grades(epoch) = gradeRow(g); ()
    }.start()
    try {
      mem.addData(e1); q.processAllAvailable()
      mem.addData(e2); q.processAllAvailable()
    } finally q.stop()
    val byEpoch = grades.toSeq.sortBy(_._1).map(_._2)
    assert(byEpoch == Seq(batchGrade(e1), batchGrade(e1 ++ e2)),
      s"$byEpoch")
    // replay guard: re-processing the last epoch must change nothing
    val replayed = gradeRow(StreamMetrics.processEpoch(
      e2.toDF("score", "y"), 1L, col("score"), col("y"), dir))
    assert(replayed == batchGrade(e1 ++ e2), s"$replayed")
    // the store grades without any stream running (shared batch lane)
    assert(gradeRow(StreamMetrics.grade(spark, dir)) ==
      batchGrade(e1 ++ e2))
  }

  test("compactEvery folds the store in-loop: grade identical to the " +
    "never-compacted store, file count bounded, replay still no-ops") {
    val dir = tmp("autoc")
    val ref = tmp("autoc_ref")
    val epochs = Seq(
      Seq((0.9, 1L), (0.2, 0L)), Seq((0.4, 0L), (0.95, 1L)),
      Seq((0.7, 1L), (0.7, 0L)), Seq((0.6, 1L), (0.1, 0L)))
    epochs.zipWithIndex.foreach { case (rows, e) =>
      StreamMetrics.processEpoch(rows.toDF("score", "y"), e.toLong,
        col("score"), col("y"), dir, compactEvery = 2)
      StreamMetrics.processEpoch(rows.toDF("score", "y"), e.toLong,
        col("score"), col("y"), ref)
    }
    assert(gradeRow(StreamMetrics.grade(spark, dir)) ==
      gradeRow(StreamMetrics.grade(spark, ref)),
      "in-loop compaction must not change the grade")
    assert(gradeRow(StreamMetrics.grade(spark, dir)) ==
      batchGrade(epochs.flatten))
    // boundary compact ran after epochs 1 and 3 → the store is ONE
    // compacted shard (epoch 3 was the last boundary)
    val files = new java.io.File(s"$dir/hist").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"store must be folded at the boundary: $files files")
    // a replayed folded epoch still no-ops at the (sealed) marker
    val replayed = gradeRow(StreamMetrics.processEpoch(
      epochs(1).toDF("score", "y"), 1L, col("score"), col("y"), dir,
      compactEvery = 2))
    assert(replayed == batchGrade(epochs.flatten), s"$replayed")
  }

  test("crash between hist append and marker + replay never double-counts; " +
    "compact folds shards to O(1) files with the grade unchanged") {
    val dir = tmp("compact")
    val e1 = Seq((0.9, 1L), (0.2, 0L), (0.7, 1L))
    val e2 = Seq((0.4, 0L), (0.95, 1L), (0.7, 0L))
    StreamMetrics.processEpoch(e1.toDF("score", "y"), 0L,
      col("score"), col("y"), dir)
    // simulate the crash window: epoch 1's hist append commits but the
    // applied_epochs marker never lands
    Metrics.scoreHistogram(e2.toDF("score", "y"), col("score"), col("y"))
      .withColumn("epoch", lit(1L))
      .write.mode("append").parquet(s"$dir/hist")
    // the foreachBatch replay re-runs epoch 1: the guard sees no marker
    // and appends AGAIN — the epoch stamp must make that a read-time no-op
    val g = gradeRow(StreamMetrics.processEpoch(
      e2.toDF("score", "y"), 1L, col("score"), col("y"), dir))
    assert(g == batchGrade(e1 ++ e2), s"$g")
    // compact: grade unchanged, shard fan-out collapses to one file
    StreamMetrics.compact(spark, dir)
    assert(gradeRow(StreamMetrics.grade(spark, dir)) == batchGrade(e1 ++ e2))
    val files = new java.io.File(s"$dir/hist").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"$files parquet files after compact")
    // a replayed epoch AFTER compaction still no-ops at the marker guard
    val replayed = gradeRow(StreamMetrics.processEpoch(
      e2.toDF("score", "y"), 1L, col("score"), col("y"), dir))
    assert(replayed == batchGrade(e1 ++ e2), s"$replayed")
  }

  test("compact inside the crash window SEALS the pending epoch: the later " +
    "replay no-ops instead of double-counting under a fresh stamp") {
    val dir = tmp("seal")
    val e1 = Seq((0.9, 1L), (0.2, 0L))
    val e2 = Seq((0.4, 0L), (0.95, 1L))
    StreamMetrics.processEpoch(e1.toDF("score", "y"), 0L,
      col("score"), col("y"), dir)
    // crash window: epoch 1's hist rows land, the marker does NOT
    Metrics.scoreHistogram(e2.toDF("score", "y"), col("score"), col("y"))
      .withColumn("epoch", lit(1L))
      .write.mode("append").parquet(s"$dir/hist")
    // compact runs BEFORE the replay (the round-11 hole: folding epoch
    // 1's stamp away would let the replay re-append as a non-duplicate)
    StreamMetrics.compact(spark, dir)
    assert(gradeRow(StreamMetrics.grade(spark, dir)) == batchGrade(e1 ++ e2))
    // the foreachBatch replay of epoch 1 must now no-op at the sealed
    // marker — NOT re-append under its real stamp
    val replayed = gradeRow(StreamMetrics.processEpoch(
      e2.toDF("score", "y"), 1L, col("score"), col("y"), dir))
    assert(replayed == batchGrade(e1 ++ e2),
      s"post-compact replay double-counted: $replayed")
    assert(gradeRow(StreamMetrics.grade(spark, dir)) == batchGrade(e1 ++ e2))
  }

  test("pre-stamp store (no epoch column) reads, grades and compacts: " +
    "every legacy row kept, including same-score rows from two epochs") {
    val dir = tmp("legacy")
    val e1 = Seq((0.7, 1L), (0.2, 0L))
    val e2 = Seq((0.7, 1L), (0.2, 0L)) // identical shape: the collapse trap
    // simulate a store written before the epoch stamp existed: two
    // separate appends, no epoch column anywhere
    Metrics.scoreHistogram(e1.toDF("score", "y"), col("score"), col("y"))
      .write.mode("append").parquet(s"$dir/hist")
    Metrics.scoreHistogram(e2.toDF("score", "y"), col("score"), col("y"))
      .write.mode("append").parquet(s"$dir/hist")
    // a constant backfill would collapse the two identical epochs; the
    // unique placeholder must keep both (old merge-everything behavior)
    assert(gradeRow(StreamMetrics.grade(spark, dir)) == batchGrade(e1 ++ e2))
    StreamMetrics.compact(spark, dir)
    assert(gradeRow(StreamMetrics.grade(spark, dir)) == batchGrade(e1 ++ e2))
    // and the store keeps working with stamped appends after migration
    val e3 = Seq((0.5, 1L))
    val g = gradeRow(StreamMetrics.processEpoch(e3.toDF("score", "y"), 9L,
      col("score"), col("y"), dir))
    assert(g == batchGrade(e1 ++ e2 ++ e3), s"$g")
  }
}
