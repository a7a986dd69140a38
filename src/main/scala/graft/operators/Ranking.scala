package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword ranking over a text corpus — BM25 (Okapi) with the standard
  * k1/b parametrization.
  *
  * Determinism: per-term tf and df are INTEGERS aggregated exactly; the
  * document score is assembled in FIXED term order from one conditional
  * aggregate column per query term — never a row-order-dependent double
  * sum — so the DuckDB oracle reproduces the score doubles bit-for-bit
  * (constants are forced to DOUBLE on both sides; the only transcendental
  * is one ln per term).
  *
  * Scale shape: one token explode, ONE hash aggregate per doc (count +
  * |terms| conditional sums, map-side combinable), one single-row global
  * stats aggregate broadcast back, then a map-side score projection.
  * Shuffle ∝ docs, never ∝ tokens × terms. `topK` (optional) plans as
  * TakeOrderedAndProject.
  */
object Ranking {

  /** Per-doc token stats for `terms`: (id, len, tf_0..tf_{m-1}). */
  private def docStats(df: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String]): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(Dedup.words(col(textCol))).as("t"))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("t") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    tok.groupBy("id")
      .agg(count(lit(1)).as("len"), tfAggs: _*)
  }

  /** BM25 scores for every document matching ≥1 term, ordered
    * (score desc, id). Score is rounded to 6 dp for cross-engine
    * reproducibility. */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 0): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    val d = docStats(df, idCol, textCol, terms)
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val g = d.agg(count(lit(1)).as("n"),
      (sum(col("len")).as("sumlen") +: dfAggs): _*)
    val scored = d.crossJoin(broadcast(g))
    val avgdl = col("sumlen").cast("double") / col("n")
    val contribs = terms.indices.map { i =>
      val tf = col(s"tf$i")
      val dfi = col(s"df$i")
      val idf = log(lit(1.0) + (col("n") - dfi + lit(0.5)) / (dfi + lit(0.5)))
      (idf * (tf * lit(k1 + 1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / avgdl))
    }
    val anyMatch = terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0
    val ranked = scored
      .where(anyMatch)
      .select(col("id").as(idCol),
        round(contribs.reduce(_ + _), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
    if (topK > 0) ranked.limit(topK) else ranked
  }
}
