package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ErddapUrl
import graft.operators.Catalog
import graft.streaming.Sessionize

class CatalogStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val catalog = Seq(
    ("ru29-20210630T1343", ts("2021-06-30 00:00:00"), ts("2021-08-01 00:00:00"),
      -74.0, -73.0, 38.5, 39.5),
    ("sp10-20220101T0000", ts("2022-01-01 00:00:00"), ts("2022-02-01 00:00:00"),
      19.0, 21.0, 9.0, 11.0)
  ).toDF("dataset_id", "start_date", "end_date",
    "lon_min", "lon_max", "lat_min", "lat_max")

  test("S2 catalog search: bbox intersect + time overlap + text") {
    val hit = Catalog.search(catalog,
      bbox = Some(Catalog.BBox(-73.9, 39.0, -73.5, 39.2)),
      minTime = Some("2021-07-15 00:00:00"), maxTime = Some("2021-09-01 00:00:00"))
    assert(hit.select("dataset_id").collect().map(_.getString(0)).toSeq ==
      Seq("ru29-20210630T1343"))
    // bbox that misses everything
    assert(Catalog.search(catalog,
      bbox = Some(Catalog.BBox(0, 0, 1, 1))).count() == 0)
    // text search
    assert(Catalog.search(catalog, searchFor = Some("SP10"))
      .count() == 1)
  }

  test("S5 wmo-id multiplicity guard: >1 distinct → absent") {
    val obs = Seq(
      ("a", "4802960"), ("a", "4802960"),
      ("b", "111"), ("b", "222"),
      ("c", null.asInstanceOf[String])
    ).toDF("dataset_id", "wmo_id")
    val w = Catalog.wmoIds(obs, "dataset_id", "wmo_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(w("a") == "4802960")
    assert(w("b") == null) // two distinct ids → treated as absent
    assert(w("c") == null)
  }

  test("ErddapUrl builds projection+constraint download URLs") {
    val u = ErddapUrl.tabledap("https://srv/erddap", "ru29-20210630T1343",
      Seq("time", "depth", "profile id"),
      Seq("time>=2021-06-30T00:00:00Z", "platform_code=\"ru29\""))
    assert(u.startsWith("https://srv/erddap/tabledap/ru29-20210630T1343.csv?"))
    assert(u.contains("time%2Cdepth%2Cprofile%20id"))
    assert(u.contains("&time>=2021-06-30T00%3A00%3A00Z"))
    assert(u.contains("&platform_code=%22ru29%22"))
    val s = ErddapUrl.advancedSearch("https://srv/erddap",
      Map("minTime" -> "2021-06-30T00:00:00Z"))
    assert(s.contains("itemsPerPage=1000000"))
  }

  test("sessionize: late event within gap extends session start backwards") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessionize(mem.toDS(), gapSeconds = 600,
      watermark = "1 day")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()
    try {
      mem.addData(Sessionize.Event(1L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // late event 5 min EARLIER — within gap of the open session interval
      mem.addData(Sessionize.Event(1L, ts("2024-01-01 11:55:00"), 2.0))
      q.processAllAvailable()
      // push watermark forward to close it
      mem.addData(Sessionize.Event(9L, ts("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(8L, ts("2024-01-05 00:00:00"), 0.0))
      q.processAllAvailable()
      val s = spark.table("late_sessions").where(col("user_id") === 1L).collect()
      assert(s.length == 1)
      assert(s(0).getAs[java.sql.Timestamp]("session_start") == ts("2024-01-01 11:55:00"))
      assert(s(0).getAs[Long]("n_events") == 2)
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessionize(mem.toDS(), gapSeconds = 600,
      watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two bursts separated by > gap; user 2: one burst
      mem.addData(
        Sessionize.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
        Sessionize.Event(1L, ts("2024-01-01 10:05:00"), 2.0),
        Sessionize.Event(2L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      mem.addData(
        Sessionize.Event(1L, ts("2024-01-01 11:00:00"), 3.0)) // > 10 min gap
      q.processAllAvailable()
      // advance watermark far past everything so open sessions time out
      mem.addData(Sessionize.Event(99L, ts("2024-01-01 23:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(98L, ts("2024-01-02 23:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .orderBy("user_id", "session_start").collect()
      val u1 = got.filter(_.getLong(0) == 1L)
      assert(u1.length == 2, got.mkString("; "))
      assert(u1(0).getAs[Long]("n_events") == 2)
      assert(u1(0).getAs[Double]("total_value") == 3.0)
      assert(u1(1).getAs[Long]("n_events") == 1)
      val u2 = got.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2(0).getAs[Double]("total_value") == 5.0)
    } finally q.stop()
  }
}
