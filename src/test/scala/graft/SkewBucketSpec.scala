package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

class SkewBucketSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag").collect()
    assert(salted.length == direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      assert(d.getAs[Long]("n") == s.getAs[Long]("n"))
      assert(math.abs(d.getAs[Double]("total") - s.getAs[Double]("total")) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val salted = Skew.saltedJoin(o, c, "o_custkey")
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    assert(plain.length == salted.length)
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("salted LEFT join keeps unmatched facts once; bad types loud") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "fv")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "dv")
    val out = Skew.saltedJoin(fact, dim, "k", saltBuckets = 4,
        joinType = "left").orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "a", "x"), (2L, "b", "y"), (99L, "orphan", null)))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, "k", joinType = "full"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact.withColumn("_salt", lit(1)), dim, "k"))
  }

  test("bucket-size guard prunes oversized buckets without a window over the bucket key") {
    import graft.operators.Dedup
    // 20 filler docs all sharing one stop phrase (their shingles form
    // mega-buckets), plus one near-dup pair with UNIQUE shingles
    val filler = (10L until 30L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val docs = (filler ++ Seq(
      (1L, "zebra quokka wombat dingo platypus echidna cassowary"),
      (2L, "zebra quokka wombat dingo platypus echidna kookaburra")
    )).toDF("doc_id", "text")
    val rows = Dedup.shingleHashRows(docs, "doc_id", "text", n = 3)
      .persist()
    val guarded = Dedup.jaccardPairsFromHashes(rows, minJaccard = 0.3,
      maxBucketSize = 10)
    // plan assertion: the only window is the per-doc n_sh count (partition
    // key = doc id) — the bucket-key prune must NOT be a window (it would
    // funnel the whole pathological bucket into one task)
    val winParts = guarded.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.sql.toLowerCase).mkString(",")
    }
    assert(winParts.nonEmpty && winParts.forall(p => p.contains("id") && !p.contains("`s`")),
      s"expected only the per-doc window, got partitions: $winParts")
    val pairs = guarded.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)),
      s"guard should drop mega-bucket pairs, keep the unique-shingle pair: ${pairs.toSet}")
    // unguarded: the identical filler docs pair up (sanity that the guard
    // is what pruned them)
    val unguarded = Dedup.jaccardPairsFromHashes(rows, minJaccard = 0.3,
      maxBucketSize = Int.MaxValue)
    assert(unguarded.count() > 1)
    rows.unpersist()

    // embedding variant: one mega-bucket of identical vectors, one close
    // pair elsewhere; guard keeps only the close pair, and the guarded
    // plan has NO window at all
    val mega = (10L until 30L).map(i => (i, Array(1.0, 0.0, 0.0, 0.0)))
    val vecs = (mega ++ Seq(
      (1L, Array(0.0, 1.0, 0.05, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.05))
    )).toDF("vec_id", "embedding")
    val g = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      minCosine = 0.9, planes = 8, bands = 4, dim = 4, maxBucketSize = 10)
    val gw = g.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(gw.isEmpty, "guarded embeddingNearDups must be window-free")
    val gp = g.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gp.toSet == Set((1L, 2L)), s"got ${gp.toSet}")
  }

  test("LSH band exchange carries only (id, band, bhash), not the signature") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "zebra quokka wombat dingo platypus echidna cassowary"),
      (2L, "zebra quokka wombat dingo platypus echidna kookaburra"),
      (3L, "completely different text about catalyst physical plans here")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 64)
    val pairs = Dedup.lshCandidatePairs(sig, bands = 16, rowsPerBand = 4)
    // the posexploded band rows are 16× the doc count — if the 64-long
    // signature rode along, the band exchange would be signature-dominated
    // (~21× the bytes); assert the repartition's output excludes it
    val reps = pairs.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
          if r.partitionExpressions.map(_.sql.toLowerCase)
            .exists(_.contains("band")) => r
    }
    assert(reps.nonEmpty, "expected the (band, bhash) repartition in the plan")
    reps.foreach { r =>
      val out = r.output.map(_.name.toLowerCase)
      assert(!out.exists(_.contains("sig")),
        s"band exchange must not carry the signature, got: $out")
    }
    val got = pairs.collect()
    val nearDup = got.find(p =>
      p.getAs[Long]("id_a") == 1L && p.getAs[Long]("id_b") == 2L)
    assert(nearDup.isDefined, s"expected (1,2) candidate, got ${got.toSeq}")
    assert(got.forall { r =>
      val e = r.getAs[Double]("est_jaccard"); e >= 0.0 && e <= 1.0
    })
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable broadcast so the co-located (bucketed) path is what avoids
    // the shuffle, not a broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("joinCardinality: exact blowup prediction equals the real join " +
    "size; unmatched keys counted on their side only") {
    // left a:3 b:1 c:2, right a:2 b:4 d:5 -> shared {a,b},
    // est = 3*2 + 1*4 = 10, max = 6, hot = 0.6
    val l = (Seq.fill(3)("a") ++ Seq("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val rt = (Seq.fill(2)("a") ++ Seq.fill(4)("b") ++ Seq.fill(5)("d"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val r = Skew.joinCardinality(l, rt, "k").collect().head
    assert((r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
      r.getAs[Long]("keys_left"), r.getAs[Long]("keys_right"),
      r.getAs[Long]("keys_shared"), r.getAs[Long]("est_rows"),
      r.getAs[Long]("max_key_rows"), r.getAs[Double]("hot_key_frac")) ==
      ((6L, 11L, 3L, 3L, 2L, 10L, 6L, 0.6)), s"$r")
    // the prediction IS the join size
    assert(l.join(rt.withColumnRenamed("v", "v2"), Seq("k")).count() == 10L)
    // disjoint keys: est 0, null hot fraction, max null
    val d0 = Skew.joinCardinality(l,
      Seq(("z", 1L)).toDF("k", "v"), "k").collect().head
    assert(d0.getAs[Long]("est_rows") == 0L
      && d0.isNullAt(d0.fieldIndex("hot_key_frac")))
  }

  test("keySkewReport: hand-computed Gini from the block rank-sum, " +
    "rank-defined p99, balanced keys give 0") {
    // keys a:4 b:2 c:1 d:1 -> sizes asc 1,1,2,4; S = 1+2+6+16 = 25
    // gini = 2*25/(4*8) - 5/4 = 0.3125; p99 = smallest size with
    // cum keys >= ceil(.99*4)=4 -> 4
    val rows = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val r = Skew.keySkewReport(rows, Seq("k"), q = 0.99).collect().head
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("max_count"), r.getAs[Long]("p99_count"),
      r.getAs[Double]("mean_count"), r.getAs[Double]("gini")) ==
      ((4L, 8L, 4L, 4L, 2.0, 0.3125)), s"$r")
    val even = Seq("a", "a", "b", "b").zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val e = Skew.keySkewReport(even, Seq("k")).collect().head
    assert(e.getAs[Double]("gini") == 0.0 &&
      e.getAs[Long]("p99_count") == 2L, s"$e")
  }
}
