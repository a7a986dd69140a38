package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamContamination

class StreamContaminationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val benchmark = Seq(
    "the quick brown fox jumps over dogs",
    "eval question about spark shuffles here"
  ).toDF("text")

  private lazy val filter =
    StreamContamination.benchmarkFilter(benchmark, "text", n = 3)

  test("batch flags: overlapping shingle caught, clean text clean") {
    val docs = Seq(
      (1L, "training doc with the quick brown fox inside"), // shares 3-gram
      (2L, "completely unrelated corpus material talking weather"),
      (3L, "question about spark shuffles here verbatim tail"), // shares
      (4L, "")
    ).toDF("doc_id", "text")
    val out = StreamContamination.flag(docs, "text", filter)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) && out(3L), "contaminated docs must be flagged")
    assert(!out(2L) && !out(4L), "clean/empty docs must pass")
    assert(out.size == 4)
  }

  test("stateless sampling ops run unchanged on streams (split, mixture)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDS().toDF("doc_id", "lang")
    // withSplit and mixture are pure hash-threshold projections — no
    // state, no watermark: the SAME operator object works on a stream
    val q = graft.operators.Sampling.mixture(
        graft.operators.Sampling.withSplit(src, "doc_id", testFraction = 0.2),
        "lang", Map("en" -> 2.0), defaultWeight = 1.0, idCol = "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sampling_stream").start()
    try {
      val rows = (0L until 50L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      mem.addData(rows)
      q.processAllAvailable()
      val stream = spark.table("sampling_stream")
        .select("doc_id", "split", "epoch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val batch = graft.operators.Sampling.mixture(
          graft.operators.Sampling.withSplit(
            rows.toDF("doc_id", "lang"), "doc_id", testFraction = 0.2),
          "lang", Map("en" -> 2.0), defaultWeight = 1.0, idCol = "doc_id")
        .select("doc_id", "split", "epoch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(stream == batch, "stream != batch for stateless sampling")
      assert(batch.exists(_._3 == 1), "en docs must gain a second epoch")
    } finally q.stop()
  }

  test("streaming flags identical to batch (stateless, no watermark)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "training doc with the quick brown fox inside"),
      (2L, "completely unrelated corpus material talking weather"),
      (3L, "question about spark shuffles here verbatim tail"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamContamination.flag(
        mem.toDS().toDF("doc_id", "text"), "text", filter)
      .select("doc_id", "contaminated")
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_out").start()
    try {
      mem.addData(docs.take(1))
      mem.addData(docs.drop(1))
      q.processAllAvailable()
      val stream = spark.table("contam_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val batch = StreamContamination.flag(docs.toDF("doc_id", "text"),
          "text", filter)
        .select("doc_id", "contaminated").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(stream == batch, s"stream $stream != batch $batch")
    } finally q.stop()
  }

  test("StreamCurate.curateStateless: stream == batch, gate + scrub + cost") {
    import graft.streaming.StreamCurate
    implicit val sqlCtx = spark.sqlContext
    val prose = (("the curation pipeline reads documents and scores " +
      "that content with care because quality matters here ") * 4) +
      "contact user5@example.com for details"
    val docs = Seq(
      (1L, prose),                       // passes the gate; email scrubbed
      (2L, "too short to pass"),         // word-count band rejects
      (3L, ""))                          // empty rejects
    val gopher = graft.operators.TextStats.GopherParams(minStopwordHits = 1)
    val mem = MemoryStream[(Long, String)]
    val q = StreamCurate.curateStateless(
        mem.toDS().toDF("doc_id", "text"), "text", gopher)
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_stream").start()
    try {
      mem.addData(docs.take(2))
      mem.addData(docs.drop(2))
      q.processAllAvailable()
      val stream = spark.table("curate_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = StreamCurate.curateStateless(
          docs.toDF("doc_id", "text"), "text", gopher).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(stream == batch, s"stream $stream != batch $batch")
      assert(stream.map(_._1) == Set(1L), s"only prose survives: $stream")
      val kept = stream.head
      assert(kept._2.contains("<EMAIL>") && !kept._2.contains("@example.com"),
        s"PII must be scrubbed post-gate: ${kept._2.takeRight(60)}")
      assert(kept._3 > 50L, s"token cost of the scrubbed text: ${kept._3}")
    } finally q.stop()
  }
}
