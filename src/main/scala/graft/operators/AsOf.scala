package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly:
  * backward as-of join (each left row picks the latest right row at or
  * before its timestamp) and interval range join (points matched to
  * enclosing intervals).
  *
  * Scale design — both avoid the naive per-row scan:
  *  - `asofJoinBackward` is the union + keyed-window formulation (the
  *    standard distributed as-of shape, cf. pandas `merge_asof` semantics
  *    and Flink temporal joins): ONE shuffle on the key columns, a
  *    within-partition sort, no join at all — so it scales with the
  *    larger side instead of |left|×|right| and never builds a range
  *    index on the driver.
  *  - `rangeJoin` turns the non-equi interval predicate into an equi-join
  *    on (key, time-bin): intervals explode into the bins they cover,
  *    points map to exactly one bin, and the exact between-filter runs
  *    only on bin-collocated candidates. A broadcast nested-loop never
  *    appears; `maxBinsPerInterval` fails loudly on pathological interval
  *    lengths instead of silently exploding.
  */
object AsOf {

  /** Can this type appear in an ORDER BY / max(struct)? (MapType cannot,
    * at any nesting depth — Spark has no map ordering.) */
  private def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => isOrderable(f.dataType))
      case a: ArrayType => isOrderable(a.elementType)
      case _ => true
    }
  }

  /** Backward (inclusive) as-of join: for every left row, attach the
    * payload of the LATEST right row with `rightTs <= leftTs` and equal
    * keys, or nulls when no such row exists (left outer semantics —
    * matches DuckDB `ASOF LEFT JOIN` and pandas `merge_asof`).
    *
    * `payload` columns (from `right`) must not collide with left column
    * names — alias them on the way in. The right side must be UNIQUE per
    * (keys, rightTs): with duplicates the picked peer is tie-broken
    * arbitrarily; pre-aggregate (`groupBy(keys, ts).agg(...)`) first.
    * `matchedTsName` receives the matched right timestamp. `tolerance`
    * (an interval Column, e.g. `expr("INTERVAL 1 DAY")`) nulls out
    * matches older than `leftTs - tolerance`.
    *
    * Implementation: union right rows (side 0) under left rows (side 1),
    * sort each key partition by (ts, side), and carry the last-seen right
    * row forward with `last(struct, ignoreNulls)` — the payload struct
    * keeps (ts, values) atomic so the matched timestamp and values always
    * come from the SAME right row. Null keys / null timestamps follow SQL
    * join semantics: they match nothing.
    *
    * Skew caveat: the keyed window sorts each key's full union in one
    * task. Fine when keys are plentiful (symbols, sensors, users); for a
    * LOW-cardinality key at extreme scale, pre-split the key with a
    * coarse time bucket and run this per bucket, carrying each bucket's
    * last mark into the next (one tiny per-bucket aggregate) — the same
    * group-is-the-parallelism-unit trade `packIntoShards` documents. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTsCol: String, rightTsCol: String,
                       payload: Seq[String],
                       matchedTsName: String = "matched_ts",
                       tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoinBackward needs at least one key column")
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty,
      s"payload columns ${collide.mkString(", ")} collide with left columns — alias them")
    val reserved = Seq("_ts", "_side", "_m", "_m2").filter(left.columns.contains)
    require(reserved.isEmpty,
      s"left columns ${reserved.mkString(", ")} collide with as-of internals — alias them")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_ts", col(leftTsCol)).withColumn("_side", lit(1))
    // SQL join semantics for nulls: a null key or null timestamp on the
    // right can match nothing (equality and >= are both false against
    // null) — drop those rows BEFORE the union, otherwise the keyed
    // window would group null keys together and a null-ts mark would sort
    // first and leak its payload into every left row
    val r = right
      .where(col(rightTsCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select((keys.map(col) :+ col(rightTsCol).as("_ts")) ++
        payload.map(col): _*)
      .withColumn("_side", lit(0))
    // allowMissingColumns fills the non-shared columns with nulls on the
    // other side — exactly the sentinel the ignoreNulls window wants
    val u = l.unionByName(r, allowMissingColumns = true)
    val packed = struct((col("_ts").as("_mts") +: payload.map(col)): _*)
    // tie-break sort key: duplicate marks at the SAME (key, ts) resolve
    // deterministically to the payload-MAX row (last() under asc order) —
    // for fully-orderable payloads this is the identical tie rule
    // asofJoinBackwardBucketed gets from its max(struct) bucket
    // aggregate, so the two paths never diverge there. Only ORDERABLE
    // payload columns join the sort key: a MapType payload can be
    // carried (struct values don't need ordering) but not sorted on —
    // such payloads work ONLY on this path (the bucketed variant rejects
    // them loudly), with ties falling back to the orderable subset
    // (nondeterministic only if two marks differ solely in unorderable
    // columns)
    val rSchema = r.schema
    val tieCols = payload.filter(p => isOrderable(rSchema(p).dataType))
    val tieKey: Seq[Column] =
      if (tieCols.isEmpty) Nil
      else Seq(struct(tieCols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("_ts") +: col("_side") +: tieKey): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = u.withColumn("_m",
      last(when(col("_side") === 0, packed), ignoreNulls = true).over(w))
    // a null-keyed LEFT row must also match nothing (its window partition
    // could only contain other null-keyed rows, and null-keyed right rows
    // are already excluded — but be explicit rather than structural)
    val keyedMatch =
      when(keys.map(col(_).isNotNull).reduce(_ && _), col("_m"))
    val matched = tolerance match {
      case Some(tol) => when(keyedMatch.isNotNull &&
          col("_ts") - col("_m._mts") <= tol, col("_m"))
      case None => keyedMatch
    }
    m.where(col("_side") === 1)
      .withColumn("_m2", matched)
      .select(leftCols.map(col) ++ (col("_m2._mts").as(matchedTsName) +:
        payload.map(p => col(s"_m2.$p").as(p))): _*)
  }

  /** Skew-resilient as-of join for LOW-cardinality keys: identical
    * semantics to `asofJoinBackward`, but each key's timeline is split
    * into `bucketSeconds`-wide buckets and the window partitions on
    * (key, bucket) — parallelism becomes keys × buckets instead of keys,
    * so five event types over a year of data no longer sort in five
    * tasks.
    *
    * Correctness across bucket boundaries: a bucket's events may need
    * the last mark of an EARLIER bucket. A compact per-(key, bucket)
    * aggregate (one row per non-empty mark bucket) is scanned with a
    * small running-last window, and each bucket gets its predecessor's
    * final mark injected as a seed row — so the per-bucket window sees
    * exactly the marks `asofJoinBackward`'s global per-key window would
    * have seen (asserted by equivalence in the spec). The seed table is
    * ∝ distinct (key, bucket) — negligible next to the data. */
  def asofJoinBackwardBucketed(left: DataFrame, right: DataFrame,
                               keys: Seq[String], leftTsCol: String,
                               rightTsCol: String, payload: Seq[String],
                               bucketSeconds: Long,
                               matchedTsName: String = "matched_ts",
                               tolerance: Option[Column] = None): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(!left.columns.contains("_bk") && !payload.contains("_bk"),
      "column _bk collides with as-of internals — alias it")
    // the bucketed mechanism AGGREGATES marks with max(struct(payload)),
    // so every payload column must be orderable here (the plain path
    // merely degrades its tie-break for unorderable columns) — reject
    // loudly up front instead of an AnalysisException mid-plan
    val unorderable = payload.filter(p =>
      !isOrderable(right.schema(p).dataType))
    require(unorderable.isEmpty,
      s"asofJoinBackwardBucketed requires ORDERABLE payload columns " +
        s"(max(struct) aggregation); ${unorderable.mkString(", ")} are not " +
        s"— use asofJoinBackward, or project maps into orderable columns")
    def bucketOf(ts: Column): Column = floor(unix_timestamp(ts) / bucketSeconds)
    val r = right.where(col(rightTsCol).isNotNull &&
      keys.map(col(_).isNotNull).reduce(_ && _))
    // last mark per (key, bucket): map-side-combinable max(struct)
    val payloadStruct = struct((col(rightTsCol).as("_mts") +:
      payload.map(col)): _*)
    val bucketLast = r
      .groupBy((keys.map(col) :+ bucketOf(col(rightTsCol)).as("_bk")): _*)
      .agg(max(payloadStruct).as("_last"))
    // every LEFT bucket needs the final mark of the nearest EARLIER mark
    // bucket (most buckets hold no mark at all when marks are sparse) —
    // run a running-last window over the compact union of left-bucket
    // markers and mark-bucket rows, ordered so a same-bucket mark stays
    // OUT of its own bucket's seed frame (in-bucket marks are already in
    // the union below)
    val leftBuckets = left
      .where(col(leftTsCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+ bucketOf(col(leftTsCol)).as("_bk"): _*)
      .distinct()
      .withColumn("_isMark", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_bk"), col("_isMark"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = leftBuckets
      .unionByName(bucketLast.withColumn("_isMark", lit(1)),
        allowMissingColumns = true)
      .withColumn("_seed", last(col("_last"), ignoreNulls = true).over(w))
      .where(col("_isMark") === 0 && col("_seed").isNotNull)
      .select(keys.map(col) ++ Seq(col("_bk"),
        col("_seed._mts").as(rightTsCol)) ++
        payload.map(p => col(s"_seed.$p").as(p)): _*)
    // NOTE the seed keeps its ORIGINAL timestamp (from the earlier
    // bucket), so tolerance still evaluates against the true mark age.
    val rBucketed = r.select(keys.map(col) ++ Seq(
        bucketOf(col(rightTsCol)).as("_bk"), col(rightTsCol)) ++
        payload.map(col): _*)
      .unionByName(seeds)
    val lBucketed = left.withColumn("_bk", bucketOf(col(leftTsCol)))
    asofJoinBackward(lBucketed, rBucketed, keys :+ "_bk", leftTsCol,
      rightTsCol, payload, matchedTsName, tolerance)
      .drop("_bk")
  }

  /** Interval range join: every (point, interval) pair with equal keys
    * and `startCol <= pointTs <= endCol` (inclusive both ends, SQL
    * BETWEEN). Output: all point columns plus `ivCols` from `intervals`.
    *
    * Equi-join on (keys, bin): each interval is exploded into the
    * `binSeconds`-wide epoch bins it covers; each point belongs to
    * exactly one bin, so no post-join dedup is needed. Pick `binSeconds`
    * near the typical interval length: shorter bins multiply interval
    * rows, longer bins widen candidate sets. Intervals covering more than
    * `maxBinsPerInterval` bins raise rather than fan out unboundedly
    * (an open-ended interval would otherwise explode the build side). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTs: String, startCol: String, endCol: String,
                ivCols: Seq[String], binSeconds: Long,
                maxBinsPerInterval: Int = 1000): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val collide = ivCols.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty,
      s"interval columns ${collide.mkString(", ")} collide with point columns — alias them")
    require(!points.columns.contains("_bin") && !ivCols.contains("_bin"),
      "column _bin collides with range-join internals — alias it")
    def binOf(ts: Column): Column = floor(unix_timestamp(ts) / binSeconds)
    val iv = intervals
      .withColumn("_b0", binOf(col(startCol)))
      .withColumn("_b1", binOf(col(endCol)))
      .withColumn("_bin", explode(when(
        col("_b1") - col("_b0") < lit(maxBinsPerInterval.toLong),
        sequence(col("_b0"), col("_b1"))).otherwise(raise_error(concat(
          lit(s"interval spans more than $maxBinsPerInterval bins of "),
          lit(s"$binSeconds s: "), col(startCol).cast("string"), lit(" .. "),
          col(endCol).cast("string"))))))
      .select((keys.map(col) :+ col("_bin")) ++
        (Seq(startCol, endCol) ++ ivCols).map(col): _*)
    val pts = points.withColumn("_bin", binOf(col(pointTs)))
    pts.join(iv, keys :+ "_bin")
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .select(points.columns.toSeq.map(col) ++ ivCols.map(col): _*)
  }

  /** Range join for SMALL interval tables: a plain broadcast non-equi
    * join — simpler plan, right choice when the interval side fits in a
    * broadcast (dimension-table-sized calendars, maintenance windows). */
  def broadcastRangeJoin(points: DataFrame, intervals: DataFrame,
                         keys: Seq[String], pointTs: String, startCol: String,
                         endCol: String, ivCols: Seq[String]): DataFrame = {
    val cond = keys.map(k => points(k) === intervals(k))
      .reduce(_ && _) &&
      points(pointTs) >= intervals(startCol) && points(pointTs) <= intervals(endCol)
    points.join(broadcast(intervals), cond)
      .select(points.columns.toSeq.map(points(_)) ++ ivCols.map(intervals(_)): _*)
  }
}
