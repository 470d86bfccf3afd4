package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsViews, EventSeries, ModelEval}

/** Hand-derived pins for the round's agreement/rank/series statistics
  * (q236-q250): every expected value below is computed by hand from
  * the textbook definition, so a regression in the exact-bridge
  * arithmetic (not just a Spark/DuckDB divergence) fails loudly. */
class EvalStatsSpec extends SparkSuite {
  import spark.implicits._

  private def staged(rows: Seq[(Long, String, Double)]) =
    rows.toDF("user_id", "date_s", "pct_change")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("pct_change"))

  test("runsTest: +,+,-,+,-,- has 4 runs, E[R]=4, z=0") {
    val df = staged(Seq(
      (1L, "2024-01-01", 1.0), (1L, "2024-01-02", 2.0),
      (1L, "2024-01-03", -1.0), (1L, "2024-01-04", 3.0),
      (1L, "2024-01-05", -2.0), (1L, "2024-01-06", -1.0)))
    val r = EventSeries.runsTest(df, minEach = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_pos") == 3 &&
      row.getAs[Long]("n_neg") == 3)
    assert(row.getAs[Long]("runs") == 4)
    assert(row.getAs[Double]("expected_runs") == 4.0)
    assert(row.getAs[Double]("z_stat") == 0.0)
  }

  test("runsTest drops zero changes and single-sign keys") {
    val df = staged(Seq(
      (1L, "2024-01-01", 1.0), (1L, "2024-01-02", 0.0),
      (1L, "2024-01-03", 2.0),
      (2L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)))
    assert(EventSeries.runsTest(df, minEach = 1).count() == 0)
  }

  test("cohenKappa: hand case kappa = 0.5") {
    // pred a,a,b,b vs actual a,b,b,b: agree=3, r=(2,2), c=(1,3),
    // e=2·1+2·3=8, kappa=(12-8)/(16-8)=0.5
    val base = Seq(
      (1L, "a", "a"), (1L, "a", "b"), (1L, "b", "b"), (1L, "b", "b"))
      .toDF("user_id", "predicted_class", "actual_class")
    val r = AnalyticsViews.cohenKappa(base).collect().head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("agree") == 3)
    assert(r.getAs[Double]("kappa") == 0.5)
  }

  test("cohenKappa drops the degenerate single-class key") {
    val base = Seq((1L, "a", "a"), (1L, "a", "a"))
      .toDF("user_id", "predicted_class", "actual_class")
    assert(AnalyticsViews.cohenKappa(base).count() == 0)
  }

  test("balancedAccuracy averages per-class recalls") {
    // class a: 2/2 hit; class b: 1/3 hit → (1 + 0.333333)/2 = 0.6667
    val base = Seq(
      (1L, "a", "a"), (1L, "a", "a"), (1L, "b", "b"),
      (1L, "a", "b"), (1L, "a", "b"))
      .toDF("user_id", "predicted_class", "actual_class")
    val r = AnalyticsViews.balancedAccuracy(base).collect().head
    assert(r.getAs[Long]("n_classes") == 2)
    assert(r.getAs[Double]("balanced_acc") == 0.6667)
  }

  test("matthews: hand confusion (2,1,1,0) reads 0.5774") {
    // pred = score>0: tp=2 fp=1 tn=1 fn=0 → 2/√12 = 0.57735
    val scored = Seq(
      (1L, "2024-01-01", 1.0, 1), (1L, "2024-01-02", 2.0, 1),
      (1L, "2024-01-03", 0.5, 0), (1L, "2024-01-04", -1.0, 0))
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    val r = ModelEval.matthews(scored).collect().head
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("tn") == 1 && r.getAs[Long]("fn") == 0)
    assert(r.getAs[Double]("mcc") == 0.5774)
  }

  test("mrr and precisionAtK under the deterministic score order") {
    // order by score desc: (0.9,0) (0.8,1) (0.7,0) (0.6,1)
    val scored = Seq(
      (1L, "2024-01-01", 0.9, 0), (1L, "2024-01-02", 0.8, 1),
      (1L, "2024-01-03", 0.7, 0), (1L, "2024-01-04", 0.6, 1))
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    val m = ModelEval.mrr(scored).collect().head
    assert(m.getAs[Long]("first_rank") == 2)
    assert(m.getAs[Double]("rr") == 0.5)
    val p = ModelEval.precisionAtK(scored, k = 2).collect().head
    // top-2 holds 1 positive; recall 1/2
    assert(p.getAs[Long]("hits") == 1)
    assert(p.getAs[Double]("precision_at") == 0.5)
    assert(p.getAs[Double]("recall_at") == 0.5)
  }

  test("adLine: CLV cumsum in exact scaled longs") {
    // bar1 h2 l1 c2 v5 → clv=1, mf=5; bar2 h4 l2 c2 v3 → clv=-1,
    // mf=-3 → ad: 5, 2
    val bars = Seq(
      (1L, "2024-01-01", 2.0, 2.0, 1.0, 2.0, 5L),
      (1L, "2024-01-02", 2.0, 4.0, 2.0, 2.0, 3L))
      .toDF("user_id", "date_s", "open", "high", "low", "close",
        "volume")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"))
    val r = EventSeries.adLine(bars).orderBy("date").collect()
    assert(r.map(_.getAs[Double]("money_flow")).toSeq == Seq(5.0, -3.0))
    assert(r.map(_.getAs[Double]("ad_line")).toSeq == Seq(5.0, 2.0))
  }

  test("gapStats: exact 4dp gap moments") {
    // gaps: open2−close1 = +0.5, open3−close2 = −0.25 → mean 0.125
    val bars = Seq(
      (1L, "2024-01-01", 10.0, 11.0, 9.0, 10.0, 1L),
      (1L, "2024-01-02", 10.5, 12.0, 10.0, 11.0, 1L),
      (1L, "2024-01-03", 10.75, 11.5, 10.0, 10.5, 1L))
      .toDF("user_id", "date_s", "open", "high", "low", "close",
        "volume")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"))
    val r = EventSeries.gapStats(bars, minDays = 1).collect().head
    assert(r.getAs[Long]("n_gap_up") == 1 &&
      r.getAs[Long]("n_gap_down") == 1)
    assert(r.getAs[Double]("mean_gap") == 0.125)
    assert(r.getAs[Double]("max_gap") == 0.5 &&
      r.getAs[Double]("min_gap") == -0.25)
  }

  test("silhouette/daviesBouldin: tight far clusters read separated") {
    val vecs = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0.1f, 0f), 0),
      (3L, Array(0f, 0.1f), 0),
      (4L, Array(10f, 10f), 1), (5L, Array(10.1f, 10f), 1),
      (6L, Array(10f, 10.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val s = graft.operators.EmbeddingStats.silhouette(vecs)
      .orderBy("label").collect()
    assert(s.length == 2)
    assert(s.forall(_.getAs[Double]("silhouette") > 0.9))
    val db = graft.operators.EmbeddingStats.daviesBouldin(vecs)
      .orderBy("label").collect()
    assert(db.forall(_.getAs[Double]("db_ratio") < 0.1))
    assert(db.map(_.getAs[Long]("worst_neighbor")).toSeq ==
      Seq(1L, 0L))
  }

  test("vocabRichness: hand Yule's K on a two-type source") {
    // tokens a,a,b: V=2 N=3 hapax=1 smv=5 → K = 10⁴·(5−3)/9 = 2222.2222
    val docs = Seq((1L, "a a b", "s1")).toDF("doc_id", "text", "source")
    val r = graft.operators.Relevance.vocabRichness(docs).collect().head
    assert(r.getAs[Long]("vocab") == 2 && r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Double]("hapax_rate") == 0.5)
    assert(r.getAs[Double]("yule_k") == 2222.2222)
  }
}
