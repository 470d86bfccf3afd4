package graft

import org.apache.spark.sql.functions._
import graft.operators.ModelEval

/** Ranking-quality metrics (q172-q174): AUC against the brute-force
  * pairwise definition, lift/gain invariants, log-loss against a direct
  * reference computation. */
class ModelEvalSpec extends SparkSuite {
  import spark.implicits._

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // (key, date ordinal, score, label) — includes tied scores across
  // classes (the midrank case) and a second key
  private val rows = Seq(
    (1L, 1, 0.9, 1), (1L, 2, 0.8, 0), (1L, 3, 0.8, 1), (1L, 4, 0.7, 0),
    (1L, 5, 0.5, 1), (1L, 6, 0.5, 0), (1L, 7, 0.5, 0), (1L, 8, 0.2, 0),
    (2L, 1, 0.1, 0), (2L, 2, 0.4, 1), (2L, 3, 0.4, 1), (2L, 4, 0.3, 0))

  private def scored = rows.map { case (u, i, s, y) =>
    (u, f"2024-01-$i%02d", s, y)
  }.toDF("user_id", "date_s", "score", "label")
    .select(col("user_id"), to_date(col("date_s")).as("date"),
      col("score"), col("label"))

  /** Brute-force AUC: P(score_pos > score_neg) + 0.5·P(tie). */
  private def refAuc(xs: Seq[(Double, Int)]): Double = {
    val pos = xs.filter(_._2 == 1).map(_._1)
    val neg = xs.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size * neg.size)
  }

  test("rocAuc equals the brute-force pairwise AUC with tie credit") {
    val out = ModelEval.rocAuc(scored).orderBy("user_id")
      .select("user_id", "auc").as[(Long, Double)].collect().toMap
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, xs) =>
      assert(out(k) == r4(refAuc(xs.map(t => (t._3, t._4)))),
        s"key $k")
    }
  }

  test("rocAuc drops keys missing a class; perfect/inverted rankers " +
    "read 1.0/0.0") {
    val oneClass = Seq((5L, "2024-01-01", 0.4, 1), (5L, "2024-01-02",
      0.6, 1)).toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    assert(ModelEval.rocAuc(oneClass).count() == 0)
    val perfect = Seq((6L, 0.9, 1), (6L, 0.8, 1), (6L, 0.2, 0),
        (7L, 0.1, 1), (7L, 0.9, 0))
      .map { case (u, s, y) => (u, "2024-01-01", s, y) }
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    val m = ModelEval.rocAuc(perfect).select("user_id", "auc")
      .as[(Long, Double)].collect().toMap
    assert(m(6L) == 1.0 && m(7L) == 0.0)
  }

  test("liftGain: buckets partition the set in score order, cum_gain " +
    "ends at 1.0, total positives conserved") {
    val out = ModelEval.liftGain(scored, 4)
      .orderBy("bucket")
      .select("bucket", "n", "n_pos", "cum_gain")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._2).sum == rows.size)
    assert(out.map(_._3).sum == rows.count(_._4 == 1))
    assert(out.last._4 == 1.0)
    // top bucket of 3 (12 rows / 4) holds the 3 best scores
    // (0.9, 0.8, 0.8) -> 2 positives
    assert(out.head._3 == 2L)
  }

  test("logLoss matches the clipped sigmoid reference; a perfectly " +
    "separable strong scorer beats a weak one") {
    val out = ModelEval.logLoss(scored).orderBy("user_id")
      .select("user_id", "log_loss", "brier")
      .as[(Long, Double, Double)].collect()
      .map { case (k, ll, br) => (k, (ll, br)) }.toMap
    rows.groupBy(_._1).foreach { case (k, xs) =>
      val ps = xs.map { case (_, _, s, y) =>
        val p0 = 1.0 / (1.0 + math.exp(-s))
        val p = math.min(math.max(p0, 1e-15), 1.0 - 1e-15)
        (p, y.toDouble)
      }
      val ll = ps.map { case (p, y) =>
        -(y * math.log(p) + (1 - y) * math.log(1 - p)) }.sum / ps.size
      val br = ps.map { case (p, y) =>
        (p - y) * (p - y) }.sum / ps.size
      val got = ModelEval.logLoss(scored).where(col("user_id") === k)
        .select("log_loss", "brier").as[(Double, Double)].head()
      assert(got == ((r4(ll), r4(br))), s"key $k")
    }
    assert(out.nonEmpty)
  }
}
