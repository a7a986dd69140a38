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

  test("flagSemantic: flags == the batch decontamination drop set; " +
    "stream == batch; zero-norm and empty-matrix behavior") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),    // the eval vector itself → flag
      (2L, Seq(0.99, 0.14, 0.0)),  // cos ≈ 0.990 → flag
      (3L, Seq(0.0, 1.0, 0.0)),    // orthogonal → clean
      (4L, Seq(0.6, 0.8, 0.0)),    // cos 0.6 → clean
      (5L, Seq(0.0, 0.0, 0.0))     // zero norm → clean
    )
    val ev = Seq((100L, Seq(2.0, 0.0, 0.0)), (101L, Seq(0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding") // zero-norm eval row must drop
    val mat = StreamContamination.benchmarkMatrix(ev, "embedding")
    assert(mat.length == 1, "zero-norm eval row must be dropped")
    assert(math.abs(mat.head.map(x => x * x).sum - 1.0) < 1e-12,
      "matrix rows must be unit-normalized")
    val cdf = corpus.toDF("vec_id", "embedding")
    val flags = StreamContamination.flagSemantic(cdf, "embedding", mat,
        minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> false), s"flags: $flags")
    // flag set == exactly the batch op's drop set
    val kept = graft.operators.Similarity.semanticDecontaminate(cdf,
        ev, "vec_id", "embedding", minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(flags.filter(!_._2).keySet == kept,
      s"clean set ${flags.filter(!_._2).keySet} != batch kept $kept")
    // empty matrix flags nothing
    assert(StreamContamination.flagSemantic(cdf, "embedding",
      Array.empty[Array[Double]], 0.95)
      .where(col("contaminated")).isEmpty)
    // stream == batch (stateless map-side expression, no watermark)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamContamination.flagSemantic(
        mem.toDS().toDF("vec_id", "embedding"), "embedding", mat, 0.95)
      .select("vec_id", "contaminated")
      .writeStream.outputMode("append")
      .format("memory").queryName("sem_contam_out").start()
    try {
      mem.addData(corpus.take(2))
      mem.addData(corpus.drop(2))
      q.processAllAvailable()
      val stream = spark.table("sem_contam_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(stream == flags, s"stream $stream != batch $flags")
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
