package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order (Morton)
  * clustering of a table on 2–3 columns before writing, so parquet
  * row-group/file min–max stats stay tight on EVERY clustered column and
  * predicate pushdown can skip most of the data on any of them.
  *
  * A plain `orderBy(a, b)` write gives perfect pruning on `a` and none
  * on `b` (each file spans b's full range); interleaving the quantized
  * bits of both keys gives near-√ pruning on each. This is the layout
  * step a 100 TB corpus runs once per ingest — one range-partitioned
  * sort job, no driver state, no O(n²) anything.
  *
  * Quantization needs per-column (min, max) bounds: pass known bounds
  * (`zOrdered`) or let `zOrderedByStats` compute them in one tiny
  * aggregate job first (table stats would supply them for free on a
  * real lakehouse table). Values outside the bounds clamp to the edge
  * buckets — layout quality degrades gracefully, correctness is
  * unaffected (layout never changes row content).
  */
object Layout {

  /** Bucketed table write for CO-LOCATED joins: hash-partition the data
    * on `bucketCol` into `numBuckets` files at WRITE time
    * (`bucketBy(...).sortBy(...).saveAsTable`), so two tables bucketed
    * on their join keys with the same bucket count join WITHOUT a
    * shuffle on either side — the sort-merge join reads matching
    * buckets pairwise. This is the repeated-join amortization a 100 TB
    * star schema lives on: pay one layout shuffle per ingest, then every
    * fact⋈fact / fact⋈big-dim join on that key skips its exchange
    * forever (broadcast handles the SMALL dims; bucketing handles the
    * joins where NEITHER side fits in memory). Sorting within buckets
    * additionally lets the join skip its per-task sort when each bucket
    * is a single file. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortWithinBuckets: Boolean = true): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortWithinBuckets) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Quantize `c` into [0, 2^bits) against fixed [min, max] bounds. */
  private def quantize(c: Column, min: Column, max: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    val span = max.cast("double") - min.cast("double")
    val scaled = when(span <= 0, lit(0L)).otherwise(
      floor((c.cast("double") - min.cast("double")) / span * levels).cast("long"))
    least(greatest(scaled, lit(0L)), lit(levels))
  }

  /** Morton interleave of pre-quantized values (each in [0, 2^bits)):
    * bit i of input j lands at position i·n + j. Pure bitwise column
    * arithmetic — codegen'd, no UDF. */
  private[graft] def interleave(qs: Seq[Column], bits: Int): Column = {
    val n = qs.length
    val terms = for {
      i <- 0 until bits
      (q, j) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value column for `cols` with caller-supplied (min, max) bounds
    * per column. 2–3 columns, `bits` per column (default 16 ⇒ 32/48-bit
    * z-values). */
  def zValue(cols: Seq[(Column, Column, Column)], bits: Int = 16): Column = {
    require(cols.size >= 2 && cols.size <= 3, "z-order works on 2-3 columns")
    require(bits * cols.size <= 62, s"bits ($bits) too wide for ${cols.size} columns")
    interleave(cols.map { case (c, mn, mx) => quantize(c, mn, mx, bits) }, bits)
  }

  /** Cluster `df` by the z-value of `zCols` (with known bounds) into
    * `numFiles` range partitions, each sorted by z-value — the written
    * files' min–max stats are tight on every z column. */
  def zOrdered(df: DataFrame, zCols: Seq[(String, Double, Double)],
               numFiles: Int, bits: Int = 16): DataFrame = {
    require(!df.columns.contains("_z"),
      "column _z collides with z-order internals — alias it")
    val z = zValue(zCols.map { case (name, mn, mx) =>
      (col(name), lit(mn), lit(mx)) }, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** `zOrdered` with bounds from one aggregate job over the input (at
    * scale, prefer table-level stats and the explicit-bounds form). */
  def zOrderedByStats(df: DataFrame, zCols: Seq[String], numFiles: Int,
                      bits: Int = 16): DataFrame = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"_mn_$c"),
      max(col(c).cast("double")).as(s"_mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bounds = zCols.map { c =>
      (c, row.getAs[Double](s"_mn_$c"), row.getAs[Double](s"_mx_$c"))
    }
    zOrdered(df, bounds, numFiles, bits)
  }
}
