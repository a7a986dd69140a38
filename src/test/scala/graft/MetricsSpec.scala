package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics

class MetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(Double, Long)]): (Long, Long, Option[Double]) = {
    val r = Metrics.auc(rows.toDF("score", "y"), col("score"), col("y"))
      .collect()(0)
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      if (r.isNullAt(r.fieldIndex("auc"))) None
      else Some(r.getAs[Double]("auc")))
  }

  test("auc: hand-computed with a tie at half credit") {
    // pos-neg pairs: (0.9,0.8-)win (0.9,0.1)win (0.8+,0.8-)tie=0.5
    // (0.8+,0.1)win -> 3.5/4 = 0.875
    assert(aucOf(Seq((0.9, 1L), (0.8, 0L), (0.8, 1L), (0.1, 0L))) ==
      (2L, 2L, Some(0.875)))
  }

  test("auc: perfect separation is 1.0, inverted is 0.0, all-tied 0.5") {
    assert(aucOf(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)))._3 ==
      Some(1.0))
    assert(aucOf(Seq((0.1, 1L), (0.2, 1L), (0.8, 0L), (0.9, 0L)))._3 ==
      Some(0.0))
    assert(aucOf(Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L)))._3 ==
      Some(0.5))
  }

  test("auc: single-class input is undefined (null), not 0.5") {
    assert(aucOf(Seq((0.9, 1L), (0.1, 1L))) == (2L, 0L, None))
    assert(aucOf(Seq((0.9, 0L), (0.1, 0L))) == (0L, 2L, None))
  }

  test("calibrationBins: hand-computed bins, exact regridded means, " +
    "score 1.0 clamps into the top bin") {
    val rows = Seq((0.05, 0L), (0.95, 1L), (0.95, 1L), (0.96, 0L), (1.0, 1L))
    val out = Metrics.calibrationBins(rows.toDF("score", "y"),
        col("score"), col("y"), bins = 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate"),
          r.getAs[Double]("gap"))).toMap
    assert(out.keySet == Set(0L, 9L), s"${out.keySet}")
    assert(out(0L) == (1L, 0L, 0.05, 0.0, -0.05))
    // bin 9: n=4 (1.0 clamped in), mean = (0.95+0.95+0.96+1.0)/4 = 0.965
    assert(out(9L) == (4L, 3L, 0.965, 0.75, -0.215), s"${out(9L)}")
  }

  test("prCurve: hand-computed sweep with a tie row; no-positive " +
    "corpus gives null recall/f1") {
    val rows = Seq((0.9, 1L), (0.9, 0L), (0.7, 1L), (0.5, 0L))
    val out = Metrics.prCurve(rows.toDF("score", "y"),
        col("score"), col("y"))
      .collect().map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("fpr"), r.getAs[Double]("f1"))).toMap
    assert(out.keySet == Set(0.9, 0.7, 0.5))
    assert(out(0.9) == (1L, 1L, 1L, 0.5, 0.5, 0.5, 0.5))
    assert(out(0.7) == (2L, 1L, 0L, 0.666667, 1.0, 0.5, 0.8))
    assert(out(0.5) == (2L, 2L, 0L, 0.5, 1.0, 1.0, 0.666667))
    val neg = Metrics.prCurve(Seq((0.3, 0L), (0.8, 0L))
        .toDF("score", "y"), col("score"), col("y")).collect()
    assert(neg.forall(r => r.isNullAt(r.fieldIndex("recall"))
      && r.isNullAt(r.fieldIndex("f1"))))
    assert(neg.map(r => r.getAs[Double]("precision")).toSet == Set(0.0))
    // the ROC side stays defined: fpr sweeps over the negatives
    assert(neg.map(r => r.getAs[Double]("fpr")).toSet == Set(0.5, 1.0))
  }

  test("ece: weighted mean and max of the calibration-bin gaps") {
    // same rows as the calibrationBins spec: bins 0 (n=1, gap -0.05)
    // and 9 (n=4, gap -0.215) -> ece = (0.05 + 4*0.215)/5, mce = 0.215
    val rows = Seq((0.05, 0L), (0.95, 1L), (0.95, 1L), (0.96, 0L), (1.0, 1L))
    val r = Metrics.ece(rows.toDF("score", "y"),
      col("score"), col("y"), bins = 10).collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("ece") == 0.182)
    assert(r.getAs[Double]("mce") == 0.215)
  }

  test("histogram forms reproduce the example forms exactly, and " +
    "merged shard histograms grade like the whole corpus") {
    val rows = Seq((0.05, 0L), (0.95, 1L), (0.95, 1L), (0.96, 0L),
      (1.0, 1L), (0.42, 1L), (0.42, 0L), (0.42, 1L))
    val df = rows.toDF("score", "y")
    val hist = Metrics.scoreHistogram(df, col("score"), col("y"))
    assert(Metrics.calibrationFromHistogram(hist).orderBy("bin")
      .collect().toSeq ==
      Metrics.calibrationBins(df, col("score"), col("y")).orderBy("bin")
        .collect().toSeq)
    assert(Metrics.eceFromHistogram(hist).collect().toSeq ==
      Metrics.ece(df, col("score"), col("y")).collect().toSeq)
    // mergeability: shard histograms summed == whole-corpus histogram
    val (h1, h2) = (rows.take(3), rows.drop(3))
    val merged = Metrics.mergeHistograms(
      Metrics.scoreHistogram(h1.toDF("score", "y"), col("score"), col("y"))
        .union(Metrics.scoreHistogram(h2.toDF("score", "y"),
          col("score"), col("y"))))
    assert(Metrics.aucFromHistogram(merged).collect().toSeq ==
      Metrics.auc(df, col("score"), col("y")).collect().toSeq)
    assert(Metrics.eceFromHistogram(merged).collect().toSeq ==
      Metrics.ece(df, col("score"), col("y")).collect().toSeq)
  }

  test("brier: hand-computed exact-grid score; perfect prediction 0; " +
    "histogram form matches") {
    // (0.8,1) -> 0.04, (0.8,0) -> 0.64 => mean 0.34
    val rows = Seq((0.8, 1L), (0.8, 0L))
    val r = Metrics.brier(rows.toDF("score", "y"), col("score"), col("y"))
      .collect().head
    assert((r.getAs[Long]("n"), r.getAs[Double]("brier")) == ((2L, 0.34)))
    val perfect = Metrics.brier(Seq((1.0, 1L), (0.0, 0L)).toDF("score", "y"),
      col("score"), col("y")).collect().head
    assert(perfect.getAs[Double]("brier") == 0.0)
    val h = Metrics.brierFromHistogram(Metrics.scoreHistogram(
      rows.toDF("score", "y"), col("score"), col("y"))).collect().head
    assert((h.getAs[Long]("n"), h.getAs[Double]("brier")) == ((2L, 0.34)))
  }

  test("psi: hand-computed two-bin drift with Laplace smoothing; " +
    "identical distributions give 0; histogram form matches") {
    // bins=2: ref [0.1, 0.6] -> p = (0.5, 0.5); cur [0.1, 0.1] ->
    // q = (0.75, 0.25). terms: -0.25*ln(2/3) -> 0.101366,
    // 0.25*ln(2) -> 0.173287; psi = 0.274653
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = Seq(0.1, 0.6).toDF("s")
    val cur = Seq(0.1, 0.1).toDF("s")
    val out = Metrics.psi(ref, cur, col("s"), col("s"), bins = 2)
      .collect().head
    val expect = r6(r6((0.5 - 0.75) * math.log(0.5 / 0.75))
      + r6((0.5 - 0.25) * math.log(0.5 / 0.25)))
    assert((out.getAs[Long]("n_ref"), out.getAs[Long]("n_cur"),
      out.getAs[Double]("psi")) == ((2L, 2L, expect)), s"$out vs $expect")
    assert(expect == 0.274653)
    val same = Metrics.psi(ref, ref, col("s"), col("s"), bins = 2)
      .collect().head
    assert(same.getAs[Double]("psi") == 0.0)
    // histogram form == example form
    val hOut = Metrics.psiFromHistograms(
      Metrics.scoreHistogram(ref, col("s"), lit(1L)),
      Metrics.scoreHistogram(cur, col("s"), lit(0L)), bins = 2)
      .collect().head
    assert(hOut.getAs[Double]("psi") == expect)
  }

  private def kappaOf(rows: Seq[(String, String)])
      : (Long, Double, Double, Option[Double]) = {
    val r = Metrics.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    (r.getAs[Long]("n"), r.getAs[Double]("po"), r.getAs[Double]("pe"),
      if (r.isNullAt(r.fieldIndex("kappa"))) None
      else Some(r.getAs[Double]("kappa")))
  }

  test("cohenKappa: hand-computed 2x2 case; perfect agreement; " +
    "single shared label is undefined") {
    // (0,0)x4 (0,1)x1 (1,1)x3 (1,0)x2: po=0.7;
    // marginals a(0)=5,a(1)=5 / b(0)=6,b(1)=4 -> pe=(30+20)/100=0.5;
    // kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(4)(("0", "0")) ++ Seq(("0", "1")) ++
      Seq.fill(3)(("1", "1")) ++ Seq.fill(2)(("1", "0"))
    assert(kappaOf(rows) == (10L, 0.7, 0.5, Some(0.4)))
    // perfect agreement over 2 classes: po=1, pe=0.5 -> kappa=1
    assert(kappaOf(Seq(("x", "x"), ("y", "y")))._4 == Some(1.0))
    // both raters always say the same single label: pe=1 -> undefined
    assert(kappaOf(Seq(("z", "z"), ("z", "z"))) == (2L, 1.0, 1.0, None))
    // disjoint label sets: po=0, pe=0 -> kappa=0
    assert(kappaOf(Seq(("p", "q"), ("p", "q"))) == (2L, 0.0, 0.0, Some(0.0)))
  }

  test("scoreHistogram regrids structurally: 10M RAW doubles stay within " +
    "the 1e-6 grid bound; gridded scores are a regrid fixpoint") {
    // raw 9-decimal scores - without the regrid this histogram would
    // have ~10M distinct rows and the AUC window would sort the corpus
    val raw = spark.range(10000000L).select(
      ((abs(xxhash64(col("id"))) % 1000000000L).cast("double")
        / lit(1e9)).as("score"),
      (col("id") % 2).cast("long").as("y"))
    val n = Metrics.scoreHistogram(raw, col("score"), col("y")).count()
    assert(n <= 1000001L, s"histogram rows $n exceed the 1e-6 grid bound")
    // already-gridded input: the regrid is a fixpoint, so auc via
    // scoreHistogram equals auc folded from a manually built
    // no-regrid histogram
    val gridded = spark.range(20000L).select(
      round((abs(xxhash64(col("id"))) % 1000000L).cast("double")
        / lit(1e6), 6).as("score"),
      (col("id") % 2).cast("long").as("y"))
    val manual = gridded
      .groupBy("score")
      .agg(sum(col("y")).as("n_pos"),
        sum(lit(1L) - col("y")).as("n_neg"))
    assert(Metrics.auc(gridded, col("score"), col("y")).collect().toSeq ==
      Metrics.aucFromHistogram(manual).collect().toSeq)
  }
}
