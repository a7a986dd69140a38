package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.streaming.StreamAsOf
import graft.streaming.StreamAsOf.In

class StreamAsOfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def mark(k: String, t: String, v: Double) = In(k, ts(t), 0, -1L, v)
  private def ev(k: String, t: String, id: Long) = In(k, ts(t), 1, id, 0.0)

  test("streaming as-of equals the batch as-of under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamAsOf.enrich(mem.toDS(), watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    val rows = Seq(
      mark("A", "2024-01-01 10:00:00", 10.0),
      ev("A", "2024-01-01 10:02:00", 1L),
      ev("A", "2024-01-01 09:59:00", 2L),   // before any mark
      mark("A", "2024-01-01 10:05:00", 11.0),
      ev("A", "2024-01-01 10:06:00", 3L),
      ev("B", "2024-01-01 10:03:00", 4L),   // key with no marks
      mark("A", "2024-01-01 10:30:00", 12.0),
      ev("A", "2024-01-01 10:31:00", 5L))
    try {
      // batch 1: the first events, marks out of order
      mem.addData(rows(1), rows(0), rows(2))
      q.processAllAvailable()
      // batch 2: a LATE mark (10:05) arrives after event 3's peers but
      // before the watermark passes 10:06 — must still match event 3
      mem.addData(rows(4), rows(3), rows(5))
      q.processAllAvailable()
      // batch 3: advance the watermark far enough to flush everything
      mem.addData(rows(6), rows(7))
      q.processAllAvailable()
      mem.addData(mark("A", "2024-01-01 12:00:00", 99.0),
        mark("B", "2024-01-01 12:00:00", 99.0))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .select("event_id", "m_value").collect()
        .map(r => r.getLong(0) ->
          Option(r.getAs[java.lang.Double]("m_value")).map(_.toDouble)).toMap
      // batch reference over the same rows
      val all = rows :+ mark("A", "2024-01-01 12:00:00", 99.0) :+
        mark("B", "2024-01-01 12:00:00", 99.0)
      val batch = AsOf.asofJoinBackward(
          all.filter(_.side == 1).toDS().select("key", "ts", "event_id"),
          all.filter(_.side == 0).toDS()
            .select(col("key"), col("ts"), col("m_value")),
          Seq("key"), "ts", "ts", Seq("m_value"))
        .select("event_id", "m_value").collect()
        .map(r => r.getLong(0) ->
          Option(r.getAs[java.lang.Double]("m_value")).map(_.toDouble)).toMap
      assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L),
        s"all watermark-matured events emitted exactly once, got ${got.keySet}")
      got.keys.foreach { id => assert(got(id) == batch(id),
        s"event $id: stream ${got(id)} != batch ${batch(id)}") }
    } finally q.stop()
  }

  test("events are held back until the watermark passes them (no early emit)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamAsOf.enrich(mem.toDS(), watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_hold").start()
    try {
      mem.addData(mark("A", "2024-01-01 10:00:00", 1.0),
        ev("A", "2024-01-01 10:01:00", 1L))
      q.processAllAvailable()
      // watermark is 09:56 — the event at 10:01 must NOT be out yet
      assert(spark.table("asof_hold").isEmpty)
      mem.addData(ev("A", "2024-01-01 10:20:00", 2L)) // wm → 10:15
      q.processAllAvailable()
      val got = spark.table("asof_hold").collect()
      assert(got.map(_.getAs[Long]("event_id")).toSet == Set(1L))
    } finally q.stop()
  }
}
