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

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard score-free way to merge heterogeneous retrieval lists
    * (BM25 ∪ dense ANN, the hybrid-serving default in Lucene/Vespa-class
    * stacks): fused(d) = Σ_lists 1/(k + rank_list(d)), summed over the
    * lists that contain d.
    *
    * `lists` pairs a name with a candidate frame carrying `idCol` +
    * `rankCol` (1-based; ties must already be broken — both this
    * package's BM25 and ANN rankers emit deterministic ranks). Output:
    * one row per id seen in ANY list, its per-list ranks as nullable
    * `rank_<name>` columns, and `rrf` rounded to 6 dp, ordered
    * (rrf desc, id).
    *
    * Determinism: ranks are exact integers and the fused score is a
    * FIXED-ORDER sum of |lists| doubles (one coalesce'd term per list,
    * assembled left to right) — never a row-order-dependent aggregate —
    * so a DuckDB oracle replays the doubles bit-for-bit.
    *
    * Scale shape: inputs are top-N candidate artifacts (k-bounded by
    * their rankers), so the outer-join cascade touches N·|lists| rows
    * regardless of corpus size — at 100 TB the fusion cost is the
    * serving tier's, not the scan tier's. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list required")
    require(lists.map(_._1).distinct.size == lists.size,
      "list names must be unique")
    require(k >= 0, s"rank constant k must be non-negative: $k")
    val renamed = lists.map { case (name, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$name"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val terms = lists.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"rank_$name")), lit(0.0))
    }
    joined.select(
      (col(idCol) +: lists.map { case (n, _) => col(s"rank_$n") }) :+
        round(terms.reduce(_ + _), 6).as("rrf"): _*)
      .orderBy(desc("rrf"), col(idCol))
  }
}
