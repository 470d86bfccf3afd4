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

  test("ndcgAtK: hand-computed binary nDCG from the generated " +
    "micro-int discount grid; perfect ranker reads 1; no-positive " +
    "keys drop") {
    // one key, 5 ranked items, labels [1,0,1,0,0] at k=3:
    // DCG = disc(1)+disc(3) = 1000000+500000; IDCG(n_pos=2) =
    // disc(1)+disc(2) = 1630930 → ndcg = 0.919721 (exact bridge)
    val s = Seq(
      (1L, "2024-01-01", 0.9, 1), (1L, "2024-01-02", 0.8, 0),
      (1L, "2024-01-03", 0.7, 1), (1L, "2024-01-04", 0.6, 0),
      (1L, "2024-01-05", 0.5, 0),
      // key 2: positives fill the top — perfect ranker
      (2L, "2024-01-01", 0.9, 1), (2L, "2024-01-02", 0.8, 1),
      (2L, "2024-01-03", 0.7, 0),
      // key 3: no positive — must drop
      (3L, "2024-01-01", 0.9, 0))
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    val got = ModelEval.ndcgAtK(s, k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1500000L, 0.919721),
      (2L, 2L, 1630930L, 1.0)))
    // the discount grid itself: disc(1)=1e6 exactly, monotone
    val d = ModelEval.ndcgDiscounts(10)
    assert(d.head == 1000000L && d == d.sortBy(-_))
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

  test("averagePrecision matches the brute-force ranked scan with the " +
    "deterministic (score desc, date) tie order; no-positive keys drop") {
    val out = ModelEval.averagePrecision(scored)
      .select("user_id", "ap").as[(Long, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, xs) =>
      val ranked = xs.sortBy(t => (-t._3, t._2)).map(_._4)
      var cum = 0; var apSum = 0.0
      ranked.zipWithIndex.foreach { case (y, i) =>
        if (y == 1) { cum += 1; apSum += cum.toDouble / (i + 1) }
      }
      assert(out(k) == r4(apSum / ranked.count(_ == 1)), s"key $k")
    }
    val negOnly = Seq((8L, "2024-01-01", 0.3, 0))
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    assert(ModelEval.averagePrecision(negOnly).count() == 0)
  }

  test("calibration: rows conserved across bins, frac_pos is the exact " +
    "count ratio, mean_p sits inside its bin") {
    val out = ModelEval.calibration(scored, 10)
      .select("bin", "n", "n_pos", "mean_p", "frac_pos")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._2).sum == rows.size)
    assert(out.map(_._3).sum == rows.count(_._4 == 1))
    out.foreach { case (bin, n, nPos, meanP, fracPos) =>
      assert(meanP >= bin / 10.0 - 1e-9 && meanP < (bin + 1) / 10.0 + 1e-9)
      assert(fracPos == r4(nPos.toDouble / n))
    }
  }

  test("spearman: +1 on any monotone pair, -1 inverted, midrank ties " +
    "match the hand-computed Pearson-of-ranks") {
    val mono = (1 to 8).map(i => (1L, i.toDouble, math.exp(i.toDouble))) ++
      (1 to 8).map(i => (2L, i.toDouble, -math.log(i.toDouble)))
    val m = ModelEval.spearman(mono.toDF("k", "x", "y"), "k", "x", "y")
      .select("k", "rho").as[(Long, Double)].collect().toMap
    assert(m(1L) == 1.0 && m(2L) == -1.0)
    // tied x values -> midranks; reference Pearson on ranks
    val tied = Seq((3L, 1.0, 2.0), (3L, 1.0, 1.0), (3L, 2.0, 3.0),
      (3L, 3.0, 4.0))
    val rx = Seq(1.5, 1.5, 3.0, 4.0); val ry = Seq(2.0, 1.0, 3.0, 4.0)
    val mx = rx.sum / 4; val my = ry.sum / 4
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val ref = cov / math.sqrt(
      rx.map(a => (a - mx) * (a - mx)).sum *
        ry.map(b => (b - my) * (b - my)).sum)
    val got = ModelEval.spearman(tied.toDF("k", "x", "y"), "k", "x", "y")
      .select("rho").as[Double].head()
    assert(got == r4(ref))
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

  test("ks: perfect separation reads 1.0; alternating ranks read the " +
    "hand-walked 0.5; single-class keys are dropped") {
    val df = Seq(
      // key 1: all positives above all negatives → KS = 1
      (1L, 0.9, 1), (1L, 0.8, 1), (1L, 0.2, 0), (1L, 0.1, 0),
      // key 2: 0/1 alternate up the score axis → max CDF gap = 1/2
      (2L, 1.0, 0), (2L, 2.0, 1), (2L, 3.0, 0), (2L, 4.0, 1),
      // key 3: positives only → undefined, dropped
      (3L, 0.5, 1), (3L, 0.6, 1)
    ).toDF("user_id", "score", "label")
    val out = ModelEval.ks(df).orderBy("user_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L, 2L, 1.0), (2L, 4L, 2L, 2L, 0.5)))
  }

  test("prCurve: hand-walked cumulative TP/FP at distinct thresholds " +
    "including a tied-score step") {
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.7, 0))
      .toDF("score", "label")
    val out = ModelEval.prCurve(df).orderBy(col("threshold").desc)
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((0.9, 1L, 0L, 1.0, 0.5),
      (0.8, 1L, 1L, 0.5, 0.5), (0.7, 2L, 2L, 0.5, 1.0)))
  }

  test("mutualInfo: sign-determines-label reads ln 2 = 0.6931; " +
    "independent cells read 0; degenerate one-cell keys read 0") {
    val df = Seq(
      // key 1: negative score ⇔ label 0 — MI = ln 2
      (1L, -1.0, 0), (1L, -2.0, 0), (1L, 1.0, 1), (1L, 2.0, 1),
      // key 2: all four (sign, label) cells equal — independent
      (2L, -1.0, 0), (2L, -1.0, 1), (2L, 1.0, 0), (2L, 1.0, 1),
      // key 3: one cell only (all up, all positive)
      (3L, 1.0, 1), (3L, 2.0, 1)
    ).toDF("user_id", "score", "label")
    val out = ModelEval.mutualInfo(df).orderBy("user_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 0.6931), (2L, 4L, 0.0), (3L, 2L, 0.0)))
  }

  test("errAtK: hand-computed cascade terms 1/(r·2^j); perfect first " +
    "hit reads 0.5; no-positive keys drop") {
    // key 1: labels [1,0,1,0,0] by score order — positives at ranks
    // 1 and 3: 1/(1·2)=500000 + round(1e6/(3·4))=83333 -> 0.583333
    // key 2: single positive at rank 1 -> 0.5
    // key 3: no positives -> dropped
    val df = Seq(
      (1L, 1, 0.9, 1), (1L, 2, 0.8, 0), (1L, 3, 0.7, 1),
      (1L, 4, 0.6, 0), (1L, 5, 0.5, 0),
      (2L, 1, 0.9, 1), (2L, 2, 0.8, 0),
      (3L, 1, 0.9, 0), (3L, 2, 0.8, 0)
    ).map { case (u, i, s, y) => (u, f"2024-01-$i%02d", s, y) }
      .toDF("user_id", "date_s", "score", "label")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("score"), col("label"))
    val out = ModelEval.errAtK(df, k = 3).orderBy("user_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 583333L, 0.583333),
      (2L, 1L, 500000L, 0.5)))
  }

  test("annRecallAtK: hand-computed hits/k; zero-hit queries still " +
    "emit; duplicate ANN pairs don't double-count; full overlap " +
    "reads 1") {
    // exact top-3 per query; k = 3
    val exact = Seq(
      (0L, 10L), (0L, 11L), (0L, 12L), // q0: ANN finds 2 of 3
      (1L, 20L), (1L, 21L), (1L, 22L), // q1: ANN finds all 3
      (2L, 30L), (2L, 31L), (2L, 32L)  // q2: ANN finds none
    ).toDF("query_id", "neighbor_id")
    val ann = Seq(
      (0L, 10L), (0L, 12L), (0L, 99L),
      (1L, 22L), (1L, 21L), (1L, 20L),
      // duplicate pair (multi-probe union) must count once
      (1L, 22L),
      (2L, 98L), (2L, 97L), (2L, 96L)
    ).toDF("query_id", "neighbor_id")
    val out = ModelEval.annRecallAtK(ann, exact, k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 3L, 2L, 0.6667), (1L, 3L, 3L, 1.0),
      (2L, 3L, 0L, 0.0)))
  }

  test("annRecallAtK: IVF probe-all provably reads recall 1 against " +
    "brute force on a real embedding frame; pruned probes stay in " +
    "[0, 1]") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 3)
    val exact = graft.operators.Similarity.bruteForceTopK(e, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val full = graft.operators.Similarity
      .ivfTopK(e, q, k = 5, nCentroids = 8, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"))
    val rFull = ModelEval.annRecallAtK(full, exact, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(rFull.length == 3 && rFull.forall(_._4 == 1.0))
    val pruned = graft.operators.Similarity
      .ivfTopK(e, q, k = 5, nCentroids = 8, nProbe = 2)
      .select(col("query_id"), col("neighbor_id"))
    val rP = ModelEval.annRecallAtK(pruned, exact, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(rP.length == 3 &&
      rP.forall(r => r._4 >= 0.0 && r._4 <= 1.0 && r._3 <= r._2))
  }
}
