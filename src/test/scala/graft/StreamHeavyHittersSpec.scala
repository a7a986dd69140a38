package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin
import graft.streaming.StreamHeavyHitters

class StreamHeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed sketch == batch sketch; estimates never undercount") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamHeavyHitters.windowedSketch(
      mem.toDS().toDF("ts", "word"), "word", "ts",
      windowDur = "1 hour", watermark = "0 seconds", depth = 4, width = 256)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_out").start()
    // window 10:00: heavy=5x, light=1x; window 11:00: only other=2x
    val w1 = (1 to 5).map(i => (ts(s"2024-01-01 10:0$i:00"), "heavy")) :+
      (ts("2024-01-01 10:30:00"), "light")
    val w2 = Seq((ts("2024-01-01 11:10:00"), "other"),
      (ts("2024-01-01 11:20:00"), "other"))
    try {
      mem.addData(w1.take(3)) // split across micro-batches to force merges
      q.processAllAvailable()
      mem.addData(w1.drop(3) ++ w2)
      q.processAllAvailable()
      val frames = spark.table("hh_out").collect()
      // update mode re-emits refined rows and sink row order is not
      // specified: keep the sketch with the largest total count per
      // window (counters only grow, so that IS the latest refinement)
      val byWindow = frames.groupBy(_.getTimestamp(0)).map { case (k, rs) =>
        k -> rs.map(_.getSeq[Long](2).toArray).maxBy(_.sum)
      }
      assert(byWindow.size == 2)
      val sk1 = byWindow(ts("2024-01-01 10:00:00"))
      val sk2 = byWindow(ts("2024-01-01 11:00:00"))
      def est(sk: Array[Long], word: String): Long = {
        val h = spark.range(1).select(xxhash64(lit(word))).head().getLong(0)
        CountMin.estimate(sk, 4, 256, h)
      }
      // 256-wide table, 3 keys: no collisions — estimates exact here
      assert(est(sk1, "heavy") == 5L)
      assert(est(sk1, "light") == 1L)
      assert(est(sk2, "other") == 2L)
      assert(est(sk2, "heavy") == 0L, "windows must not bleed")
      // streaming result == batch sketch over the same window-1 rows
      val batch = w1.toDF("ts", "word")
        .agg(CountMin.sketch(4, 256)(xxhash64(col("word"))))
        .head().getSeq[Long](0).toArray
      assert(sk1.toSeq == batch.toSeq, "streaming/batch sketch divergence")
    } finally q.stop()
  }
}
