package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupIndex}

class DedupIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def corpus = docs.where(col("doc_id") % 2 === 0)
  private def batch = docs.where(col("doc_id") % 2 === 1)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dedupidx_$tag").toString

  private def rows(df: DataFrame): Set[(Long, Boolean, Option[Double], Boolean)] =
    df.collect().map { r =>
      (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))
    }.toSet

  test("checkBatch over a built index == the in-memory dedupAgainstCorpus") {
    val dir = tmp("parity")
    DedupIndex.build(corpus, "doc_id", "text", dir, n = 3)
    val served = DedupIndex.checkBatch(batch, "doc_id", "text", dir,
      minJaccard = 0.5)
    val inMem = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
      n = 3, minJaccard = 0.5)
    assert(rows(served) == rows(inMem))
    assert(served.count() == batch.count()) // one verdict per batch doc
  }

  test("append is row-identical to a full rebuild (no trained state)") {
    val split = tmp("split"); val full = tmp("full")
    DedupIndex.build(corpus.where(col("doc_id") % 4 === 0),
      "doc_id", "text", split, n = 3)
    DedupIndex.append(corpus.where(col("doc_id") % 4 === 2),
      "doc_id", "text", split)
    DedupIndex.build(corpus, "doc_id", "text", full, n = 3)
    val a = DedupIndex.checkBatch(batch, "doc_id", "text", split, 0.5)
    val b = DedupIndex.checkBatch(batch, "doc_id", "text", full, 0.5)
    assert(rows(a) == rows(b))
  }

  test("broadcast check never shuffles the stored corpus tables") {
    val dir = tmp("plan")
    DedupIndex.build(corpus, "doc_id", "text", dir, n = 3)
    val plan = DedupIndex.checkBatch(batch, "doc_id", "text", dir, 0.5)
      .queryExecution.executedPlan.toString
    // both corpus-facing joins (shingle h-join, fp hit-join) must be
    // broadcast joins with the BATCH side built — the stored tables are
    // scanned in place. The verdict assembly SMJs on batch `id` are
    // batch×batch-sized and allowed; what must NOT appear is a shuffle
    // join on the corpus-facing keys.
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected >= 2 broadcast joins in:\n$plan")
    assert("(SortMergeJoin|ShuffledHashJoin) \\[(h|fp)#".r
      .findFirstIn(plan).isEmpty,
      s"stored corpus side shuffle-joined on h/fp:\n$plan")
  }

  test("frozen meta: check hashes with the stored shingle width") {
    val dir = tmp("meta")
    DedupIndex.build(corpus, "doc_id", "text", dir, n = 5)
    val served = DedupIndex.checkBatch(batch, "doc_id", "text", dir, 0.5)
    val inMem = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
      n = 5, minJaccard = 0.5)
    assert(rows(served) == rows(inMem)) // n came from meta, not a default
  }

  test("compact shrinks the layout, collapses fps, verdicts unchanged") {
    val dir = tmp("compact")
    val parts = (0 until 4).map(i => corpus.where(col("doc_id") % 8 === i * 2))
    DedupIndex.build(parts.head, "doc_id", "text", dir, n = 3)
    parts.tail.foreach(p => DedupIndex.append(p, "doc_id", "text", dir))
    // duplicate fps on purpose: re-append an already-indexed slice
    DedupIndex.append(parts.head, "doc_id", "text", dir)
    def files(part: String): Int = new java.io.File(dir, part).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = rows(DedupIndex.checkBatch(batch, "doc_id", "text", dir, 0.5))
    val shinglesBefore = files("shingles")
    val fpsRowsBefore = spark.read.parquet(s"$dir/fps").count()
    DedupIndex.compact(spark, dir)
    assert(rows(DedupIndex.checkBatch(batch, "doc_id", "text", dir, 0.5))
      == before, "verdicts must be byte-identical across the swap")
    assert(files("shingles") <= 4 && files("shingles") < shinglesBefore,
      s"layout must shrink: ${files("shingles")} vs $shinglesBefore")
    assert(spark.read.parquet(s"$dir/fps").count() < fpsRowsBefore,
      "duplicate fps must collapse")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.contains("compacting")), "no staging leftovers")
  }

  test("streaming ingest with appendKept: later epochs dedupe against earlier") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("stream")
    val corpusA = "the quick brown fox jumps over the lazy dog tonight"
    val novel1 = "entirely fresh words about spark shuffles and broadcast joins"
    val novel2 = "another brand new document covering parquet pruning stats"
    DedupIndex.build(Seq((1L, corpusA)).toDF("doc_id", "text"),
      "doc_id", "text", dir, n = 3)
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = graft.streaming.StreamIndexDedup.writer(
        mem.toDS().toDF("doc_id", "text"), "doc_id", "text", dir,
        minJaccard = 0.5, appendKept = true) { (kept, epoch) =>
      seen(epoch) = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      ()
    }.start()
    try {
      mem.addData((10L, corpusA), (11L, novel1)) // 10 dups the corpus
      q.processAllAvailable()
      mem.addData((20L, novel1), (21L, novel2))  // 20 dups epoch-0's keeper
      q.processAllAvailable()
      val byEpoch = seen.toSeq.sortBy(_._1).map(_._2)
      assert(byEpoch == Seq(Set(11L), Set(21L)),
        s"expected epoch keeps [Set(11), Set(21)], got $byEpoch")
    } finally q.stop()
  }

  test("empty batch in, empty verdicts out; unknown text keeps") {
    val dir = tmp("empty")
    DedupIndex.build(corpus, "doc_id", "text", dir, n = 3)
    assert(DedupIndex.checkBatch(batch.limit(0), "doc_id", "text", dir, 0.5)
      .count() == 0)
    import spark.implicits._
    val novel = Seq((9_000_001L, "zyx wvu tsr qpo nml kji hgf edc ba"))
      .toDF("doc_id", "text")
    val out = DedupIndex.checkBatch(novel, "doc_id", "text", dir, 0.5)
      .collect()
    assert(out.length == 1 && out(0).getAs[Boolean]("keep")
      && !out(0).getAs[Boolean]("dropped_exact"))
  }
}
