package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine BPE vocabulary trainer — byte-pair-encoding merge learning
  * (Sennrich et al. 2016) run as Spark aggregates: iteratively merge
  * the corpus's most frequent adjacent token pair, starting from
  * characters. The tokenizer-construction counterpart to the trained
  * classifier (X84): training state lives in the engine, every step is
  * deterministic, and a SQL oracle replays the whole merge trajectory.
  *
  * Scale contract — the reason BPE fits 100 TB: training runs on the
  * WORD HISTOGRAM (distinct word, count), never the corpus. One
  * tokenize-and-count pass reduces 100 TB of text to a vocabulary-sized
  * frame (millions of rows at web scale); each merge step is then ONE
  * hash aggregate over that bounded frame plus a ONE-ROW collect (the
  * argmax pair — the gradient-collect pattern), and the re-tokenization
  * is a map-only literal `replace` on the histogram rows. Nothing in
  * the loop touches corpus-sized data.
  *
  * Determinism contract: token sequences are represented as strings
  * with every token wrapped in U+001F separators ("␟a␟␟b␟" for [a,b]),
  * so one literal `replace("␟a␟␟b␟" → "␟ab␟")` performs the standard
  * greedy leftmost non-overlapping merge IDENTICALLY in any engine
  * ("aaa" + merge(a,a) → [aa, a]); the argmax pair breaks count ties
  * on (left, right) ascending. Tokens are normalized [a-z0-9] chars
  * (Dedup.words), so they can never contain the separator.
  */
object Bpe {

  /** The separator wrapping every token in the string representation. */
  val Sep = "\u001f"

  /** (w, cnt) word histogram — the ONLY corpus-sized pass. */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Initial sequence string: every character wrapped in separators. */
  private def charSeq(w: Column): Column =
    regexp_replace(w, "(.)", Sep + "$1" + Sep)

  /** One learned merge. */
  final case class Merge(l: String, r: String, count: Long) {
    def merged: String = l + r
  }

  /** Learn `k` merges from the corpus. Returns them in training order.
    * Cost: one corpus tokenize pass, then per merge ONE aggregate over
    * the histogram + a one-row collect. */
  def train(df: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    require(k >= 1 && k <= 1000, s"k out of range: $k")
    val hist = wordHistogram(df, textCol)
      .select(col("cnt"), charSeq(col("w")).as("seq"))
      .localCheckpoint()
    var seqCol: Column = col("seq")
    val out = Seq.newBuilder[Merge]
    for (_ <- 1 to k) {
      val cur = hist.select(col("cnt"), seqCol.as("seq"))
      val toks = split(trim(col("seq"), Sep), Sep + Sep)
      // single-token words carry no pairs (and sequence(1, 0) DESCENDS
      // in Spark rather than being empty — it must never be built)
      val top = cur
        .where(size(toks) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("l"),
            element_at(toks, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) return out.result()
      val m = Merge(top(0).getAs[String]("l"), top(0).getAs[String]("r"),
        top(0).getAs[Long]("c"))
      out += m
      seqCol = mergeOnce(seqCol, m)
    }
    out.result()
  }

  /** Apply one merge to a sequence-string column (literal replace —
    * greedy leftmost non-overlapping by construction). */
  private def mergeOnce(seq: Column, m: Merge): Column =
    call_function("replace", seq,
      lit(Sep + m.l + Sep + Sep + m.r + Sep), lit(Sep + m.merged + Sep))

  /** Tokenize a (normalized single-word) column with a learned merge
    * list: k chained literal replaces — a fixed codegen'd expression,
    * no state, serves batch or stream rows identically. Returns the
    * token ARRAY. */
  def encodeWord(w: Column, merges: Seq[Merge]): Column = {
    val seq = merges.foldLeft(charSeq(w))(mergeOnce)
    split(trim(seq, Sep), Sep + Sep)
  }

  /** Merges as a small DataFrame (step, l_tok, r_tok, merged,
    * pair_count) — the persistable vocabulary artifact. */
  def mergesFrame(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i.toLong + 1, m.l, m.r, m.merged, m.count) }
      .toDF("step", "l_tok", "r_tok", "merged", "pair_count")
  }
}
