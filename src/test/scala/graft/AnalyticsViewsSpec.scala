package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.AnalyticsViews

class AnalyticsViewsSpec extends SparkSuite {
  import spark.implicits._

  // hand-built base: 2 keys, 3 scored days each
  private def base = Seq(
    (1L, "2024-01-01", 1.0, "low", "low", 1),
    (1L, "2024-01-02", 3.0, "medium", "high", 0),
    (1L, "2024-01-03", 6.0, "high", "high", 1),
    (2L, "2024-01-01", 1.5, "low", "medium", 0),
    (2L, "2024-01-02", 2.5, "medium", "medium", 1),
    (2L, "2024-01-03", 1.0, "low", "low", 1)
  ).toDF("user_id", "d", "volatility", "predicted_class", "actual_class",
      "is_correct")
    .withColumn("date", col("d").cast("date")).drop("d")

  test("accuracyByKey renders counts and round(x,1)::text || '%'") {
    val out = AnalyticsViews.accuracyByKey(base).orderBy("user_id")
      .select("n_predictions", "n_correct", "accuracy_pct")
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((3L, 2L, "66.7%"), (3L, 2L, "66.7%")))
  }

  test("accuracyByDay emits ordered ✅/❌ marks per key") {
    val out = AnalyticsViews.accuracyByDay(base).orderBy("date")
      .select("marks").as[String].collect()
    assert(out.toSeq == Seq("✅ ❌", "❌ ✅", "✅ ✅"))
  }

  test("confusionMatrix counts predicted × actual cells") {
    val out = AnalyticsViews.confusionMatrix(base)
      .orderBy("predicted_class", "actual_class")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("high", "high", 1L), ("low", "low", 2L),
      ("low", "medium", 1L), ("medium", "high", 1L),
      ("medium", "medium", 1L)))
  }

  test("classMetrics: precision, recall, F1 with NULLIF guard " +
    "(dashboard_views.sql:149-182)") {
    val m = AnalyticsViews.classMetrics(base).orderBy("class")
      .as[(String, Double, Double, Option[Double])].collect().toSeq
    // low: predicted 3×, correct 2 → P=0.6667; actual 2, correct 2 → R=1.0
    val low = m.find(_._1 == "low").get
    assert(low._2 == 0.6667 && low._3 == 1.0)
    assert(low._4.exists(f => math.abs(f - 0.8) < 1e-3))
    // medium: P=0.5, R=0.5, F1=0.5
    val med = m.find(_._1 == "medium").get
    assert(med._2 == 0.5 && med._3 == 0.5 && med._4.contains(0.5))
  }

  test("summary aggregates counts, distinct keys and span") {
    val s = AnalyticsViews.summary(base)
      .as[(Long, Long, Double, Long, Date, Date)].head()
    assert(s == ((6L, 4L, 66.67, 2L, Date.valueOf("2024-01-01"),
      Date.valueOf("2024-01-03"))))
  }

  test("concentration: hand-derived HHI and Gini per group — skewed " +
    "0.375/0.1667, uniform 0.5/0, monopoly 1/0") {
    // x: counts a=1,b=1,c=2 → HHI 6/16=0.375; ranked 1,1,2 →
    //    G=(2·(1+2+6)−4·4)/(3·4)=2/12=0.1667
    // y: two users × 2 → HHI 8/16=0.5, perfectly equal → G=0
    // z: one user × 3 → HHI 9/9=1, single key → G=0
    val ev = (Seq(("x", "a"), ("x", "b"), ("x", "c"), ("x", "c")) ++
      Seq(("y", "a"), ("y", "a"), ("y", "b"), ("y", "b")) ++
      Seq.fill(3)(("z", "a"))).toDF("event_type", "user_id")
    val out = AnalyticsViews.concentration(ev).orderBy("event_type")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 3L, 4L, 0.375, 0.1667),
      ("y", 2L, 4L, 0.5, 0.0), ("z", 1L, 3L, 1.0, 0.0)))
  }

  test("countDistribution: zero-fact entities land in the 0 bucket " +
    "(the LEFT-join semantics the Q13 shape exists for)") {
    val ents = Seq(1L, 2L, 3L).toDF("ck")
    val facts = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("ok", "ock")
    val out = AnalyticsViews.countDistribution(ents, facts,
        "ck", "ock", "ok")
      .orderBy("c_count").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("mcnemar: per-user-majority baseline (tie → class asc), exact " +
    "discordant counts, χ² = (b−c)²/(b+c)") {
    val rows = Seq(
      (1L, "hi", "hi"), (1L, "lo", "hi"), (1L, "lo", "hi"),
      (1L, "hi", "lo"), (1L, "lo", "lo"))
      .toDF("user_id", "predicted_class", "actual_class")
    // mode(actual) = hi (3 vs 2): b = {(lo,lo)} = 1, c = {(lo,hi)×2}
    val out = AnalyticsViews.mcnemar(rows)
      .as[(Long, Long, Long, Double)].head()
    assert(out == ((5L, 1L, 2L, 0.3333)))
  }

  test("benford: integer-cents first digits with exact shares and " +
    "the 6dp Benford constants") {
    val ev = Seq(1.0, 2.5, 0.15, 9.99, -3.0, 0.0).toDF("value")
    val out = AnalyticsViews.benford(ev).orderBy("digit")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.5, 0.30103),
      (2L, 1L, 0.25, 0.176091), (9L, 1L, 0.25, 0.045757)))
  }

  test("abTest: counts and z match a driver replay of the md5 arms; " +
    "an all-converting tape yields null z") {
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    // one active day per user; users 0-19, conversion for u < 8
    val ev = (0L until 20L).map(u =>
      (u, "2024-05-01 10:00:00",
        if (u < 8) "purchase" else "click"))
      .toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val (na, ca) = (0L until 20L).filter(arm(_) == "A")
      .map(u => if (u < 8) 1 else 0).foldLeft((0, 0)) {
        case ((n, c), x) => (n + 1, c + x) }
    val (nb, cb) = (0L until 20L).filter(arm(_) == "B")
      .map(u => if (u < 8) 1 else 0).foldLeft((0, 0)) {
        case ((n, c), x) => (n + 1, c + x) }
    val out = AnalyticsViews.abTest(ev)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert((out._1, out._2, out._3, out._4) ==
      ((na.toLong, ca.toLong, nb.toLong, cb.toLong)))
    val p = (ca + cb).toDouble / (na + nb)
    val z = (ca.toDouble / na - cb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(out._7.exists(g => math.abs(g - z) < 1e-4))
    // degenerate: every unit converts → pooled p = 1 → z null
    val allConv = ev.withColumn("event_type", lit("purchase"))
    val gz = AnalyticsViews.abTest(allConv)
      .select("z").as[Option[Double]].head()
    assert(gz.isEmpty)
  }
}
