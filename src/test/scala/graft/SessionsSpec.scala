package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Parity, Sessions}
import graft.streaming.Sessionize

class SessionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: two sessions split by a > 10 min gap
    (1L, ts("2024-01-01 12:00:00"), 1.0),
    (1L, ts("2024-01-01 12:05:00"), 2.0),
    (1L, ts("2024-01-01 12:14:59"), 3.0),
    (1L, ts("2024-01-01 13:00:00"), 4.0),
    // user 2: exactly-at-gap boundary stays ONE session (gap is <=)
    (2L, ts("2024-01-01 00:00:00"), 5.0),
    (2L, ts("2024-01-01 00:10:00"), 6.0),
    // user 3: single event
    (3L, ts("2024-01-02 09:00:00"), 7.0)
  ).toDF("user_id", "ts", "value")

  test("sessionize: gap rule, boundary inclusivity, aggregates") {
    val out = Sessions.sessionize(events, Seq("user_id"), "ts",
        gapSeconds = 600, extraAggs = Seq(sum("value").as("total_value")))
      .orderBy("user_id", "session_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L)))
    val s10 = out(0)
    assert(s10.getAs[Timestamp]("session_start") == ts("2024-01-01 12:00:00"))
    assert(s10.getAs[Timestamp]("session_end") == ts("2024-01-01 12:14:59"))
    assert(s10.getAs[Long]("n_events") == 3)
    assert(s10.getAs[Double]("total_value") == 6.0)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("n_events") == 2) // 10-min gap == gapSeconds: same session
  }

  test("one exchange total: session aggregate reuses the window's partitioning") {
    val plan = Sessions.sessionize(events, Seq("user_id"), "ts", 600)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"expected exactly 1 exchange (HashPartitioning(user_id) satisfies the " +
        s"(user_id, session_idx) aggregate's distribution), got $shuffles:\n$plan")
  }

  test("calendar SVG heatmap: geometry, labels, annotations, null cells") {
    val df = Seq(
      (2023L, java.lang.Double.valueOf(3.0), java.lang.Double.valueOf(10.0)),
      (2024L, java.lang.Double.valueOf(7.0), null.asInstanceOf[java.lang.Double])
    ).toDF("year", "m1", "m2")
    val svg = graft.io.CalendarSvg.render(df)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
    val rects = doc.getElementsByTagName("rect")
    assert(rects.getLength == 4) // 2 rows × 2 month columns
    val texts = (0 until doc.getElementsByTagName("text").getLength)
      .map(doc.getElementsByTagName("text").item(_).getTextContent)
    // month COLUMNS get full names; year index labels rows; %.0f annotations
    assert(texts.contains("January") && texts.contains("February"))
    assert(texts.contains("2023") && texts.contains("2024"))
    assert(texts.contains("3") && texts.contains("7") && texts.contains("10"))
    // the null cell is blank: 3 annotated values only
    assert(texts.count(t => Set("3", "7", "10").contains(t)) == 3)
    // (year, month) index → "Mon YYYY" labels; day columns keep numbers
    val ymd = Seq((2024L, 2L, 1.0)).toDF("year", "month", "d5")
    val svg2 = graft.io.CalendarSvg.render(ymd)
    assert(svg2.contains(">Feb 2024<") && svg2.contains(">5<"))
    // diverging mode emits blue-side and red-side fills around the center
    val div = graft.io.CalendarSvg.render(df, center = Some(7.0))
    assert(div.contains("fill=\"#ffffff\"")) // the center cell is white
    // a non-calendar frame is rejected loudly
    intercept[IllegalArgumentException] {
      graft.io.CalendarSvg.render(Seq((1L, 2.0)).toDF("foo", "bar"))
    }
  }

  test("calendar PNG raster: same grid/colormap as the SVG, pixel-verified") {
    val df = Seq(
      (2023L, java.lang.Double.valueOf(3.0), java.lang.Double.valueOf(10.0)),
      (2024L, java.lang.Double.valueOf(7.0), null.asInstanceOf[java.lang.Double])
    ).toDF("year", "m1", "m2")
    val png = graft.io.CalendarPng.render(df)
    // PNG magic + decodes
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // dimensions come from the SHARED grid model (month columns → top=80)
    val grid = graft.io.CalendarSvg.grid(df, 200)
    assert(img.getWidth == grid.w && img.getHeight == grid.h)
    val cell = graft.io.CalendarSvg.Cell
    // sample inside each cell fill, away from the annotation text and the
    // hairline border; the pixel must equal the SHARED colormap's hex
    def px(ri: Int, ci: Int): Int =
      img.getRGB(grid.left + ci * cell + 4, grid.top + ri * cell + 4) & 0xFFFFFF
    def expected(v: Double): Int =
      Integer.decode(graft.io.CalendarSvg.color(v, grid.lo, grid.hi, None)).intValue()
    assert(px(0, 0) == expected(3.0), f"cell(0,0) ${px(0, 0)}%06x")
    assert(px(0, 1) == expected(10.0), f"cell(0,1) ${px(0, 1)}%06x")
    assert(px(1, 0) == expected(7.0), f"cell(1,0) ${px(1, 0)}%06x")
    assert(px(1, 1) == 0xFFFFFF, "null cell must render white")
    // diverging mode: the center cell is white, like the SVG
    val div = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      graft.io.CalendarPng.render(df, center = Some(7.0))))
    assert((div.getRGB(grid.left + 4, grid.top + cell + 4) & 0xFFFFFF) == 0xFFFFFF)
    // file write path round-trips
    val f = java.io.File.createTempFile("cal", ".png")
    try {
      graft.io.CalendarPng.write(df, f.getAbsolutePath)
      assert(javax.imageio.ImageIO.read(f).getWidth == grid.w)
    } finally f.delete()
  }

  test("calendar SVG ticks real Calendars pivots with unpadded numbers") {
    // the actual producers zero-pad columns (d01..d31 / m01..m12) for
    // lexicographic order; the reference's ticks are bare numbers /
    // month names — render must strip the padding
    val src = Seq(
      (ts("2024-02-05 10:00:00"), 2.0),
      (ts("2024-02-15 10:00:00"), 3.0),
      (ts("2023-07-01 10:00:00"), 4.0)
    ).toDF("t", "v")
    val svg = graft.io.CalendarSvg.render(
      graft.operators.Calendars.ymdCalendar(src, "t", col("v")))
    assert(svg.contains(">5<") && svg.contains(">15<"))
    assert(!svg.contains(">05<"), "day ticks must not be zero-padded")
    val svg2 = graft.io.CalendarSvg.render(
      graft.operators.Calendars.ymCalendar(src, "t", col("v")))
    assert(svg2.contains("February") && svg2.contains("July"))
  }

  test("batch sessionize == streaming Sessionize on mature data (sf events slice)") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      // LTZ view of the (possibly NTZ) source ts: the streaming twin's
      // Event case class carries java.sql.Timestamp, and the UTC session
      // makes the reinterpretation epoch-exact
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    // compare at MILLISECOND precision: the streaming op's per-key state
    // stores epoch millis (Timestamp.getTime), batch keeps full micros
    val batch = Sessions.sessionize(ev, Seq("user_id"), "ts", gapSeconds = 4 * 3600,
        tieBreak = Seq("value"),
        extraAggs = Seq(round(Parity.moneySum(col("value")), 2).as("total_value")))
      .select(col("user_id"), unix_millis(col("session_start")).as("session_start"),
        unix_millis(col("session_end")).as("session_end"),
        col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3), r.get(4))).toSet

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionize(mem.toDS(), gapSeconds = 4 * 3600,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_batch_eq")
      .outputMode("append").start()
    try {
      mem.addData(ev.collect().map(r =>
        Sessionize.Event(r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toIndexedSeq)
      q.processAllAvailable()
      // push the watermark far past the data so every open session times out
      mem.addData(Sessionize.Event(-1L, ts("2030-01-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val stream = spark.table("sess_batch_eq")
        .where(col("user_id") >= 0)
        .select(col("user_id"), unix_millis(col("session_start")).as("session_start"),
          unix_millis(col("session_end")).as("session_end"),
          col("n_events"),
          round(col("total_value").cast("decimal(20,2)"), 2).cast("double").as("total_value"))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3), r.get(4))).toSet
      assert(stream == batch,
        s"batch/stream diverge: onlyBatch=${(batch -- stream).take(3)} " +
          s"onlyStream=${(stream -- batch).take(3)}")
    } finally q.stop()
  }

  test("StreamAnomaly == batch rollingZScore under out-of-order arrival") {
    import graft.operators.Anomaly
    import graft.streaming.StreamAnomaly
    import graft.streaming.StreamAnomaly.In
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[In]
    val out = StreamAnomaly.detect(mem.toDS(), lookback = 4, minPoints = 3,
      zThreshold = 2.0, watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    val base = Seq(
      In(1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      In(1L, ts("2024-01-01 10:01:00"), 2L, 10.5),
      In(1L, ts("2024-01-01 10:02:00"), 3L, 9.5),
      In(1L, ts("2024-01-01 10:03:00"), 4L, 10.0),
      In(1L, ts("2024-01-01 10:04:00"), 5L, 50.0),  // spike
      In(1L, ts("2024-01-01 10:05:00"), 6L, 10.0),
      In(2L, ts("2024-01-01 10:01:30"), 7L, 1.0),
      In(2L, ts("2024-01-01 10:02:30"), 8L, 2.0))
    try {
      // out-of-order feed across two epochs, then a watermark-advancer
      mem.addData(base(2), base(0), base(6))
      q.processAllAvailable()
      mem.addData(base(1), base(4), base(3), base(7), base(5))
      q.processAllAvailable()
      mem.addData(In(1L, ts("2024-01-01 11:00:00"), 99L, 10.0),
        In(2L, ts("2024-01-01 11:00:00"), 98L, 1.0))
      q.processAllAvailable()
      val got = spark.table("anom_out")
        .where($"event_id" < 90)
        .select("event_id", "n_prev", "mean_prev", "z", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3),
          r.getBoolean(4))).toSet
      val batch = Anomaly.rollingZScore(
          (base ++ Seq(In(1L, ts("2024-01-01 11:00:00"), 99L, 10.0),
            In(2L, ts("2024-01-01 11:00:00"), 98L, 1.0))).toDS()
            .select($"key".as("user_id"), $"ts", $"event_id", $"value"),
          "user_id", "ts", "event_id", "value",
          lookback = 4, minPoints = 3, zThreshold = 2.0)
        .where($"event_id" < 90)
        .select("event_id", "n_prev", "mean_prev", "z", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3),
          r.getBoolean(4))).toSet
      assert(got == batch,
        s"stream/batch diverge: onlyStream=${(got -- batch).take(3)} " +
          s"onlyBatch=${(batch -- got).take(3)}")
      // the spike row itself flagged
      assert(got.exists(t => t._1 == 5L && t._5))
    } finally q.stop()
  }

  test("StreamFunnel == batch userSteps under out-of-order arrival; " +
    "pre-view clicks never advance the frontier") {
    import graft.operators.Funnel
    import graft.streaming.StreamFunnel
    import graft.streaming.StreamFunnel.In
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[In]
    val out = StreamFunnel.track(mem.toDS(),
      Seq("view", "click", "purchase"), watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fun_out").start()
    val base = Seq(
      In(1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      In(1L, ts("2024-01-01 10:02:00"), 2L, "click"),
      In(1L, ts("2024-01-01 10:04:00"), 3L, "purchase"),
      In(2L, ts("2024-01-01 10:00:30"), 4L, "click"),    // pre-view click
      In(2L, ts("2024-01-01 10:01:30"), 5L, "view"),
      In(2L, ts("2024-01-01 10:03:30"), 6L, "purchase"), // click never came
      In(3L, ts("2024-01-01 10:01:00"), 7L, "view"))
    val flush = Seq(
      In(1L, ts("2024-01-01 11:00:00"), 99L, "view"),
      In(2L, ts("2024-01-01 11:00:00"), 98L, "view"),
      In(3L, ts("2024-01-01 11:00:00"), 97L, "view"))
    try {
      // out-of-order across epochs (purchase before its click arrives)
      mem.addData(base(2), base(0), base(4))
      q.processAllAvailable()
      mem.addData(base(1), base(3), base(6), base(5))
      q.processAllAvailable()
      mem.addData(flush: _*)
      q.processAllAvailable()
      def key(u: Long, s: Long, e: String, t: java.sql.Timestamp) =
        (u, s, e, t.getTime)
      val got = spark.table("fun_out")
        .where($"t" < ts("2024-01-01 10:30:00"))
        .collect().map(r => key(r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3))).toSet
      val batch = Funnel.userSteps(
          (base ++ flush).toDS().toDF("user", "ts", "event_id", "event_type"),
          "user", "ts", "event_type", Seq("view", "click", "purchase"))
        .where($"t" < ts("2024-01-01 10:30:00"))
        .collect().map(r => key(r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3))).toSet
      assert(got == batch,
        s"stream/batch diverge: onlyStream=${got -- batch} " +
          s"onlyBatch=${batch -- got}")
      // user 1 completed all three; user 2 stalled at view (the early
      // click and the click-less purchase never advance the frontier)
      assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("windowed funnel (maxGaps): out-of-window steps don't count, " +
    "stream twin == batch, unconstrained call unchanged") {
    import graft.operators.Funnel
    import graft.streaming.StreamFunnel
    import graft.streaming.StreamFunnel.In
    implicit val sqlCtx = spark.sqlContext
    // user 1: click 2 min after view (in the 5-min window), purchase
    //   1 min after click (in) — full funnel
    // user 2: click 10 min after view (OUT of window) — frontier stalls
    //   at view forever, later in-window events of later steps ignored
    // user 3: first click out of window at +7 min, SECOND click back in?
    //   no — window is (t, t+5min]; a later click is further out. give
    //   user 3 an in-window click at +4 min AFTER an out-of-window
    //   purchase: purchase at +6 min from click is out of the 5-min
    //   purchase window → stalls at click
    val rows = Seq(
      In(1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      In(1L, ts("2024-01-01 10:02:00"), 2L, "click"),
      In(1L, ts("2024-01-01 10:03:00"), 3L, "purchase"),
      In(2L, ts("2024-01-01 10:00:00"), 4L, "view"),
      In(2L, ts("2024-01-01 10:10:00"), 5L, "click"),
      In(2L, ts("2024-01-01 10:11:00"), 6L, "purchase"),
      In(3L, ts("2024-01-01 10:00:00"), 7L, "view"),
      In(3L, ts("2024-01-01 10:04:00"), 8L, "click"),
      In(3L, ts("2024-01-01 10:10:00"), 9L, "purchase"))
    val flush = Seq(
      In(1L, ts("2024-01-01 11:00:00"), 99L, "view"),
      In(2L, ts("2024-01-01 11:00:00"), 98L, "view"),
      In(3L, ts("2024-01-01 11:00:00"), 97L, "view"))
    val df = (rows ++ flush).toDS().toDF("user", "ts", "event_id", "event_type")
    val gaps = Seq(Some("5 minutes"), Some("5 minutes"))
    val cut = ts("2024-01-01 10:30:00")
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.where($"t" < cut).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3).getTime)).toSet
    val batch = keys(Funnel.userSteps(df, "user", "ts", "event_type",
      Seq("view", "click", "purchase"), gaps))
    // windowed reach: u1 all 3 steps, u2 view only, u3 view+click
    assert(batch.count(_._1 == 1L) == 3, s"u1 full funnel: $batch")
    assert(batch.count(_._1 == 2L) == 1, s"u2 stalls at view: $batch")
    assert(batch.count(_._1 == 3L) == 2, s"u3 stalls at click: $batch")
    // the summary form gates the same rows
    val sums = Funnel.funnel(df, "user", "ts", "event_type",
        Seq("view", "click", "purchase"), gaps)
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("users")).toMap
    assert(sums == Map(0L -> 3L, 1L -> 2L, 2L -> 1L), s"$sums")
    // stream twin with the same gaps (ms) matches batch exactly
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[In]
    val out = StreamFunnel.track(mem.toDS(),
      Seq("view", "click", "purchase"), watermark = "5 minutes",
      maxGapsMs = Seq(Some(300000L), Some(300000L)))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fun_win_out").start()
    try {
      // out-of-order within the watermark lag: u1's purchase lands
      // before its click (batch-1 max ts stays at 10:03 so nothing in
      // batch 2 is late-beyond-watermark)
      mem.addData(rows(2), rows(0), rows(6))
      q.processAllAvailable()
      mem.addData(rows(1), rows(4), rows(3), rows(7), rows(5), rows(8))
      q.processAllAvailable()
      mem.addData(flush: _*)
      q.processAllAvailable()
      val got = keys(spark.table("fun_win_out").toDF(
        "user", "step", "event_type", "t"))
      assert(got == batch,
        s"stream/batch diverge: onlyStream=${got -- batch} " +
          s"onlyBatch=${batch -- got}")
    } finally q.stop()
  }

  test("rollingZScore: spike flags against its trailing window only") {
    import graft.operators.Anomaly
    // user 1: stable 10.0±0.5 baseline, then a 100.0 spike, then back —
    // the spike flags; the row AFTER it scores against a window that now
    // CONTAINS the spike (inflated variance) and must not flag
    val base = (1 to 10).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:${i}%02d:00"),
        if (i % 2 == 0) 10.5 else 9.5))
    val rows = base ++ Seq(
      (11L, 1L, ts("2024-01-01 00:11:00"), 100.0),
      (12L, 1L, ts("2024-01-01 00:12:00"), 10.0)) ++
      // user 2: only 3 events — below minPoints, never scored
      (1 to 3).map(i => (20L + i, 2L, ts(s"2024-01-01 01:0$i:00"), 50.0 * i))
    val out = Anomaly.rollingZScore(rows.toDF("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value",
        lookback = 20, minPoints = 5, zThreshold = 3.0)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out(11L).getAs[Boolean]("anomaly"), s"spike must flag: ${out(11L)}")
    assert(out(11L).getAs[Double]("z") > 100)
    assert(!out(12L).getAs[Boolean]("anomaly"),
      s"post-spike return must not flag (spike inflates the window): ${out(12L)}")
    // warm-up rows (n_prev < minPoints) carry null z and never flag
    (1 to 5).foreach { i =>
      assert(out(i.toLong).isNullAt(out(i.toLong).fieldIndex("z")))
      assert(!out(i.toLong).getAs[Boolean]("anomaly"))
    }
    assert((21 to 23).forall(i => !out(i.toLong).getAs[Boolean]("anomaly")))
    // constant baseline → zero variance → null z, not Infinity
    val const = (1 to 8).map(i =>
      (i.toLong, 1L, ts(s"2024-01-01 02:0$i:00"), 5.0)) :+
      (9L, 1L, ts("2024-01-01 02:09:00"), 5.0)
    val c = Anomaly.rollingZScore(const.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value").collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("z")) &&
      !r.getAs[Boolean]("anomaly")))
  }
}
