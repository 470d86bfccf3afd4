package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AnalyticsViews, EventSeries, ModelEval}

/** The reference's stacked dashboard views (SURVEY §2.4 A4-A11, J2/J3,
  * F-CONCAT/F-EMOJI) over the deterministic persistence-baseline
  * prediction frame, each with a DuckDB oracle twin.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  // Partial-aggregate experiment (round-9 verdict item 3, graft
  // .AbPartial at 128×, warm best-of-3 ×2 passes): the bar aggregate's
  // combine factor is ~1 (keys grow with the inflation at ~5
  // events/(user,day)), so pre-partitioning raw events by user_id —
  // the only realizable "skip the doomed partial" in Spark 4.1 (no
  // skip-partial-aggregate conf exists) — removes one of the two
  // exchanges (raw-row shuffle feeds aggregate AND window in one
  // stage). Measured a WASH: q41 3.33 vs 3.48 s then 3.41 vs 3.14 s
  // on the re-pass; q44 2.08 vs 2.09 s. The saved bar-row exchange
  // (~n/5 rows) is offset by shuffling raw rows instead of partial
  // rows of ~the same cardinality. Below the 1.3× adoption bar →
  // current declarative form kept (it also lets Catalyst re-combine
  // when a DIFFERENT fixture does have map-side duplication).
  private def base(s: SparkSession, d: String): DataFrame =
    AnalyticsViews.predictionBase(
      EventSeries.dailyBars(Tables.events(s, d)))

  /** bars + LAG staging shared with SeriesQueries (movers/value-count
    * views aggregate over the staged frame). */
  private val STAGED_MOVERS: String = SeriesQueries.STAGED

  /** bars + actual/predicted class base, twin of AnalyticsViews
    * .predictionBase over the shared BARS CTE. */
  private val PRED_BASE: String =
    """WITH raw AS (
         SELECT user_id, CAST(ts AS DATE) AS date, value, event_id
         FROM events),
       bars AS (
         SELECT user_id, date,
                round(max(value),4) AS high,
                round(min(value),4) AS low,
                round(min(CASE WHEN rn_d = 1 THEN value END),4) AS close
         FROM (SELECT *,
                 row_number() OVER (PARTITION BY user_id, date
                                    ORDER BY event_id DESC) AS rn_d
               FROM raw) t
         GROUP BY 1, 2),
       v AS (
         SELECT user_id, date,
                round((high - low) / nullif(close, 0) * 100, 4)
                  AS volatility
         FROM bars),
       c AS (
         SELECT user_id, date, volatility,
                CASE WHEN volatility IS NULL THEN NULL
                     WHEN volatility <= 2 THEN 'low'
                     WHEN volatility <= 5 THEN 'medium'
                     ELSE 'high' END AS vol_class
         FROM v),
       base AS (
         SELECT user_id, date, volatility,
                vol_class AS predicted_class,
                lead(vol_class) OVER w AS actual_class,
                CASE WHEN vol_class = lead(vol_class) OVER w
                     THEN 1 ELSE 0 END AS is_correct
         FROM c WINDOW w AS (PARTITION BY user_id ORDER BY date)
         QUALIFY actual_class IS NOT NULL)"""

  /** Scored eval frame for the ranking-metric queries: score = today's
    * pct return, label = next-day up move (the same persistence-baseline
    * convention `predictionBase` uses for the class metrics). */
  private def scoredFrame(s: SparkSession, d: String): DataFrame = {
    val staged = EventSeries.stgDailyPrices(
      EventSeries.dailyBars(Tables.events(s, d)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("date"))
    val nc = lead(col("close"), 1).over(w)
    staged.select(col("user_id"), col("date"),
        col("pct_change").as("score"),
        when(nc > col("close"), 1).otherwise(0).as("label"), nc.as("nc"))
      .where(col("score").isNotNull && col("nc").isNotNull)
      .drop("nc")
  }

  /** q337 oracle: nDCG@k over the scored frame with the SAME
    * JVM-generated micro-int log₂ discounts the plan embeds
    * ([[ModelEval.ndcgDiscounts]]) — rendered as CASE literals so
    * neither engine evaluates a logarithm at query time; the fusion is
    * exact integer sums + one half-up bridge division. */
  private def ndcgOracle(k: Int): String = {
    val disc = ModelEval.ndcgDiscounts(k)
    val cum = disc.scanLeft(0L)(_ + _).tail
    val discCase = disc.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")
    val cumCase = cum.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")
    SCORED + s""", rk AS (
            SELECT user_id, label,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY score DESC, date ASC) AS rnk
            FROM scored),
          g AS (
            SELECT user_id, CAST(sum(label) AS BIGINT) AS n_pos,
                   CAST(sum(CASE WHEN rnk <= $k AND label = 1
                     THEN CASE rnk $discCase END ELSE 0 END)
                     AS BIGINT) AS dcg6
            FROM rk GROUP BY 1),
          h AS (
            SELECT user_id, n_pos, dcg6,
                   CASE least(n_pos, $k) $cumCase END AS idcg6
            FROM g WHERE n_pos > 0)
          SELECT user_id, n_pos, dcg6,
                 CAST((dcg6 * 2000000 + idcg6) // (2 * idcg6)
                   AS DOUBLE) / 1000000 AS ndcg_at
          FROM h ORDER BY 1"""
  }

  /** q340 oracle: ERR@k with the SAME generated 2^j literals the plan
    * embeds; each in-window positive contributes the exact bridge
    * term round(10⁶/(rnk·2^j)) — pure integer algebra. */
  private def errOracle(k: Int): String = {
    val powCase = (1 to k).map(j => s"WHEN $j THEN ${1L << j}")
      .mkString(" ")
    SCORED + s""", rk AS (
            SELECT user_id, label,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY score DESC, date ASC) AS rnk
            FROM scored),
          p AS (
            SELECT user_id, rnk,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY rnk) AS j
            FROM rk WHERE rnk <= $k AND label = 1),
          t AS (
            SELECT user_id,
                   rnk * (CASE j $powCase END) AS den
            FROM p),
          g AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_pos_at_k,
                   CAST(sum((2000000 + den) // (2 * den)) AS BIGINT)
                     AS err6
            FROM t GROUP BY 1)
          SELECT user_id, n_pos_at_k, err6,
                 CAST(err6 AS DOUBLE) / 1000000 AS err_at
          FROM g ORDER BY 1"""
  }

  /** staged + scored CTE, oracle twin of [[scoredFrame]]. */
  private val SCORED: String = SeriesQueries.STAGED +
    """, scored AS (
         SELECT user_id, date, pct_change AS score,
                CASE WHEN lead(close) OVER w > close THEN 1 ELSE 0 END
                  AS label
         FROM staged WINDOW w AS (PARTITION BY user_id ORDER BY date)
         QUALIFY pct_change IS NOT NULL
             AND lead(close) OVER w IS NOT NULL)"""

  val queries: Map[String, Q] = Map(
    // exact per-key ROC-AUC (Mann-Whitney rank sum, midrank ties) of
    // the persistence score vs next-day direction
    "q172_roc_auc" -> ((s, d) =>
      ModelEval.rocAuc(scoredFrame(s, d)).orderBy(col("user_id"))),

    // cumulative-gains / lift deciles over the same scored eval set
    "q173_lift_gain" -> ((s, d) =>
      ModelEval.liftGain(scoredFrame(s, d), 10).orderBy(col("bucket"))),

    // per-key logistic log-loss + Brier of the sigmoid-calibrated score
    "q174_log_loss" -> ((s, d) =>
      ModelEval.logLoss(scoredFrame(s, d)).orderBy(col("user_id"))),

    // per-key average precision (exact step-interpolated PR area,
    // deterministic tie order)
    "q175_avg_precision" -> ((s, d) =>
      ModelEval.averagePrecision(scoredFrame(s, d))
        .orderBy(col("user_id"))),

    // reliability / calibration table of the sigmoid score in 10
    // probability bins
    "q176_calibration" -> ((s, d) =>
      ModelEval.calibration(scoredFrame(s, d), 10).orderBy(col("bin"))),

    // per-event-type concentration of activity across users: HHI +
    // Gini, both INTEGER/INTEGER ratios through the exact bridge
    "q183_concentration" -> ((s, d) =>
      AnalyticsViews.concentration(Tables.events(s, d))
        .orderBy(col("event_type"))),

    // PSI score-drift table between the first and second half of the
    // eval window: smoothed bins, 8dp proportions, micro-nat terms
    "q184_psi" -> ((s, d) =>
      graft.operators.Drift.psi(scoredFrame(s, d)).orderBy(col("bin"))),

    // per-key Kolmogorov-Smirnov class separation — all-integer gap
    // maximization, one exact ratio at the end
    "q185_ks" -> ((s, d) =>
      ModelEval.ks(scoredFrame(s, d)).orderBy(col("user_id"))),

    // per-key mutual information between score sign and label via the
    // micro-nat DECIMAL bridge
    "q186_mutual_info" -> ((s, d) =>
      ModelEval.mutualInfo(scoredFrame(s, d)).orderBy(col("user_id"))),

    // hash-armed A/B conversion readout: exact counts/rates, pooled
    // two-proportion z
    "q196_ab_test" -> ((s, d) =>
      AnalyticsViews.abTest(Tables.events(s, d), "purchase")),

    // stepwise precision-recall curve at every distinct threshold —
    // exact integer cumulatives
    "q210_pr_curve" -> ((s, d) =>
      ModelEval.prCurve(scoredFrame(s, d))
        .orderBy(col("threshold").desc)),

    // nonparametric two-sample KS drift between the eval-window halves
    // — the binless complement of q184, all-integer gap
    "q219_ks_drift" -> ((s, d) =>
      graft.operators.Drift.ksTwoSample(scoredFrame(s, d))),

    // McNemar paired test: persistence vs per-user-majority classifier
    "q227_mcnemar" -> ((s, d) => AnalyticsViews.mcnemar(base(s, d))),

    // chance-corrected agreement of predicted vs actual class per key
    "q236_cohen_kappa" -> ((s, d) =>
      AnalyticsViews.cohenKappa(base(s, d)).orderBy(col("user_id"))),

    // Matthews correlation of the thresholded persistence score
    "q237_matthews_corr" -> ((s, d) =>
      ModelEval.matthews(scoredFrame(s, d)).orderBy(col("user_id"))),

    // mean per-class recall per key — dominant class cannot mask
    "q238_balanced_accuracy" -> ((s, d) =>
      AnalyticsViews.balancedAccuracy(base(s, d))
        .orderBy(col("user_id"))),

    // WOE / information value over score deciles
    "q315_woe_iv" -> ((s, d) =>
      ModelEval.woeIv(scoredFrame(s, d), 10).orderBy(col("decile"))),

    // reciprocal rank of the first positive under the score order
    "q241_mrr" -> ((s, d) =>
      ModelEval.mrr(scoredFrame(s, d)).orderBy(col("user_id"))),

    // precision/recall@10 per key — exact hit counts and bridges
    "q242_precision_at_k" -> ((s, d) =>
      ModelEval.precisionAtK(scoredFrame(s, d), 10)
        .orderBy(col("user_id"))),

    // nDCG@10 per key — log2 discounts generated once as micro-int
    // literals shared by plan and oracle; DCG/IDCG are exact long sums
    "q337_ndcg_at_k" -> ((s, d) =>
      ModelEval.ndcgAtK(scoredFrame(s, d), 10)
        .orderBy(col("user_id"))),

    // ERR@k (cascade-model expected reciprocal rank) over the same
    // scored frame — binary labels make each j-th positive at rank r
    // contribute exactly 1/(r·2^j), one micro-int bridge term per
    // positive (generated 2^j literals, the q337 discipline)
    "q340_err_at_k" -> ((s, d) =>
      ModelEval.errAtK(scoredFrame(s, d), 10)
        .orderBy(col("user_id"))),

    // Benford first-digit audit of the value column
    "q229_benford" -> ((s, d) =>
      AnalyticsViews.benford(Tables.events(s, d))
        .orderBy(col("digit"))),

    // one-pass declarative data-quality gate over the events table —
    // a mixed pass/fail suite (the 'error' type and the 400 cap bind)
    "q216_constraints" -> ((s, d) => {
      import graft.operators.Constraints._
      check(Tables.events(s, d), Seq(
        NotNull("user_id"), NotNull("ts"), Unique(Seq("event_id")),
        InRange("value", 0.0, 400.0),
        InSet("event_type", Seq("click", "purchase", "signup", "view")),
        MinRows(5000)))
        .orderBy(col("constraint_name"))
    }),

    // one-pass column profile of the events table (DESCRIBE-grade
    // dashboard rollup: rows / nulls / exact distincts per column)
    "q159_profile" -> ((s, d) =>
      graft.operators.Profiling.profile(Tables.events(s, d),
          Seq("event_id", "ts", "user_id", "event_type", "value",
            "props"))
        .orderBy(col("col_name"))),

    // A4 + F-CONCAT: accuracy by key with percent-string rendering
    "q41_accuracy_by_user" -> ((s, d) =>
      AnalyticsViews.accuracyByKey(base(s, d)).orderBy(col("user_id"))),

    // A5 + F-EMOJI: accuracy by day with ordered ✅/❌ mark aggregation
    "q42_accuracy_by_day" -> ((s, d) =>
      AnalyticsViews.accuracyByDay(base(s, d))
        .withColumn("date", iso(col("date")))
        .orderBy(col("date"))),

    // A8: confusion matrix
    "q43_confusion_matrix" -> ((s, d) =>
      AnalyticsViews.confusionMatrix(base(s, d))
        .orderBy(col("predicted_class"), col("actual_class"))),

    // A9-A11 + J3: per-class precision/recall joined, F1 with NULLIF guard
    "q44_class_metrics" -> ((s, d) =>
      AnalyticsViews.classMetrics(base(s, d)).orderBy(col("class"))),

    // A6: global summary (count, distinct keys, span)
    "q45_summary" -> ((s, d) =>
      AnalyticsViews.summary(base(s, d))
        .withColumn("min_date", iso(col("min_date")))
        .withColumn("max_date", iso(col("max_date")))),

    // O5 + F-FMT: top movers with sign-aware percent formatting
    "q53_top_movers" -> ((s, d) => {
      val staged = graft.operators.EventSeries.stgDailyPrices(
        graft.operators.EventSeries.dailyBars(Tables.events(s, d)))
      staged.filter(col("pct_change").isNotNull)
        .select(col("user_id"), iso(col("date")).as("date"),
          col("pct_change"),
          concat(when(col("pct_change") >= 0, "+").otherwise(""),
            format_string("%.2f", col("pct_change")), lit("%"))
            .as("pct_formatted"))
        .orderBy(col("pct_change").desc, col("user_id"), col("date"))
        .limit(10)
    }),

    // A12/A13: enrichment value counts by (topic, sentiment)
    "q54_topic_sentiment" -> ((s, d) => {
      val (state, _) = graft.jobs.DailyEtlJob.backfill(
        Tables.events(s, d),
        graft.operators.Enrichment.DeterministicProvider)
      state.enrichments
        .groupBy(col("topic"), col("sentiment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("topic"), col("sentiment"))
    }),

    // A7 + J5: accuracy by model version; latest-version-only filter
    "q55_model_versions" -> ((s, d) => {
      val preds = AnalyticsViews.multiVersionPredictions(base(s, d))
      AnalyticsViews.accuracyByModelVersion(preds)
        .withColumn("first_date", iso(col("first_date")))
        .withColumn("last_date", iso(col("last_date")))
        .orderBy(col("model_version"))
    }),
    "q56_latest_version_accuracy" -> ((s, d) => {
      val preds = AnalyticsViews.latestVersionOnly(
        AnalyticsViews.multiVersionPredictions(base(s, d)))
      preds
        .withColumn("is_correct",
          when(col("predicted_class") === col("actual_class"), 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("is_correct")).cast("long").as("n_correct"))
        .orderBy(col("user_id"))
    }),

    // Best-run search (reference mlflow_utils.py:175-198) through the
    // SQL surface: the two deterministic model versions become registry
    // runs (long-format metric rows, the mlflow metrics shape), ranked
    // per metric by RunRegistry.leaderboard — rank 1 = search_runs(
    // order_by=[metric DESC], max_results=1).
    "q94_best_run" -> ((s, d) => {
      val preds = AnalyticsViews.multiVersionPredictions(base(s, d))
      val rm = preds
        .withColumn("is_correct",
          when(col("predicted_class") === col("actual_class"), 1)
            .otherwise(0))
        .groupBy(col("model_version"), col("created_at"))
        .agg(graft.functions.ExactRound.ratio(
            sum(col("is_correct")) * 100, count(lit(1)), 2)
            .as("accuracy_pct"),
          count(lit(1)).cast("double").as("n_predictions"))
      val runsLong = rm.select(col("model_version").as("run_id"),
        lit("baseline").as("model_type"), col("created_at"),
        explode(map(
          lit("accuracy_pct"), col("accuracy_pct"),
          lit("n_predictions"), col("n_predictions")))
          .as(Seq("metric", "value")))
      graft.ml.RunRegistry.leaderboard(runsLong)
        .withColumn("created_at",
          date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy(col("metric"), col("rank"))
    }),

    // Multi-level aggregation in ONE pass: rollup (lang, source) →
    // per-source, per-lang, and grand-total rows from a single shuffle
    // instead of three scans+unions — the hierarchy-profile shape a
    // corpus dashboard needs at 100 TB.
    "q68_rollup" -> ((s, d) =>
      Tables.documents(s, d)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          (grouping(col("lang")) * 2 + grouping(col("source")))
            .cast("long").as("lvl"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("lvl"), col("n_docs"), col("sum_chars"))
        .orderBy(col("lvl"), col("lang"), col("source"))))

  val oracle: Map[String, String] = Map(
    // q172: midrank = rank() + (ties-1)/2 — the exact Mann-Whitney
    // statistic; keys lacking a class are dropped (AUC undefined)
    "q172_roc_auc" -> (SCORED +
      """, mr AS (
            SELECT user_id, label,
                   rank() OVER (PARTITION BY user_id ORDER BY score)
                     + (count(*) OVER (PARTITION BY user_id, score) - 1)
                       / 2e0 AS midrank
            FROM scored),
          a AS (
            SELECT user_id, count(*) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   sum(CASE WHEN label = 1 THEN midrank END)
                     AS pos_rank_sum
            FROM mr GROUP BY 1)
          SELECT user_id, n, n_pos, n - n_pos AS n_neg,
                 round((pos_rank_sum - n_pos * (n_pos + 1) / 2e0)
                       / (n_pos * (n - n_pos)), 4) AS auc
          FROM a WHERE n_pos > 0 AND n - n_pos > 0 ORDER BY 1"""),
    // q173: deterministic ntile order (score DESC, user, date) so the
    // bucket assignment is engine-independent
    "q173_lift_gain" -> (SCORED +
      """, b AS (
            SELECT label,
                   ntile(10) OVER (ORDER BY score DESC, user_id, date)
                     AS bucket
            FROM scored),
          pb AS (
            SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos
            FROM b GROUP BY 1),
          c AS (
            SELECT *,
                   sum(n_pos) OVER (ORDER BY bucket) AS cum_pos,
                   sum(n_pos) OVER () AS total_pos,
                   sum(n) OVER () AS total_n
            FROM pb)
          SELECT bucket, n, n_pos,
                 round(n_pos / CAST(n AS DOUBLE), 4) AS pos_rate,
                 round(cum_pos / CAST(total_pos AS DOUBLE), 4)
                   AS cum_gain,
                 round((n_pos / CAST(n AS DOUBLE))
                       / (total_pos / CAST(total_n AS DOUBLE)), 4)
                   AS lift
          FROM c ORDER BY 1"""),
    // q183: HHI = Σc²/S², Gini = (2·Σi·cᵢ − (n+1)S)/(nS) over counts
    // ranked ascending with a user_id tiebreak — all-integer ratios
    // through the exact half-up bridge
    "q183_concentration" ->
      """WITH c AS (
           SELECT event_type, user_id, count(*) AS c
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, c,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY c, user_id) AS BIGINT) AS i
           FROM c),
         a AS (
           SELECT event_type, count(*) AS n,
                  CAST(sum(c) AS BIGINT) AS s,
                  CAST(sum(c * c) AS BIGINT) AS ssq,
                  CAST(sum(i * c) AS BIGINT) AS a
           FROM r GROUP BY 1),
         g AS (
           SELECT event_type, n, s, ssq,
                  2 * a - (n + 1) * s AS num, n * s AS den
           FROM a)
         SELECT event_type, n AS n_keys, s AS total_events,
                CAST((ssq * 20000 + s * s) // (2 * s * s) AS DOUBLE)
                  / 10000 AS hhi,
                CAST(CASE WHEN num < 0
                     THEN -(((-num) * 20000 + den) // (2 * den))
                     ELSE ((num * 20000 + den) // (2 * den)) END
                     AS DOUBLE) / 10000 AS gini
         FROM g ORDER BY 1""",

    // q184: PSI between window halves — scaled-8dp proportions,
    // 6dp DECIMAL log factors, signed half-up 4dp terms and total
    "q184_psi" -> (SCORED +
      """, ext AS (
            SELECT min(score) AS vmin, max(score) AS vmax,
                   min(date) AS dmin, max(date) AS dmax FROM scored),
          mid AS (
            SELECT *, dmin + CAST(date_diff('day', dmin, dmax) // 2
              AS INTEGER) AS midd FROM ext),
          binned AS (
            SELECT CASE WHEN vmax = vmin THEN 0
                   ELSE CAST(least(floor(((score - vmin) * 10)
                     / (vmax - vmin)), 9) AS BIGINT) END AS bin,
                   CASE WHEN date <= midd THEN 'e' ELSE 'a' END AS period
            FROM scored, mid),
          counts AS (
            SELECT bin, period, count(*) AS c FROM binned GROUP BY 1, 2),
          grid AS (
            SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS bin),
          wide AS (
            SELECT g.bin, coalesce(e.c, 0) + 1 AS ce,
                   coalesce(a.c, 0) + 1 AS ca
            FROM grid g
            LEFT JOIN counts e ON e.bin = g.bin AND e.period = 'e'
            LEFT JOIN counts a ON a.bin = g.bin AND a.period = 'a'),
          tot AS (
            SELECT bin, ce, ca,
                   CAST(sum(ce) OVER () AS BIGINT) AS ne,
                   CAST(sum(ca) OVER () AS BIGINT) AS na FROM wide),
          sc AS (
            SELECT bin, ce, ca, ne, na,
                   (ce * 200000000 + ne) // (2 * ne) AS pe8,
                   (ca * 200000000 + na) // (2 * na) AS pa8,
                   CAST(round(ln(CAST(ca * ne AS DOUBLE) / (ce * na)), 6)
                     AS DECIMAL(10,6)) AS ln6
            FROM tot),
          tm AS (
            SELECT bin, ce, ca, pe8, pa8,
                   CAST(CAST(pa8 - pe8 AS DECIMAL(12,0)) * ln6
                     AS DECIMAL(28,6)) AS t
            FROM sc),
          sm AS (
            SELECT bin, ce, ca, pe8, pa8,
                   CAST(t * 1000000 AS BIGINT) AS su_t,
                   CAST(sum(t) OVER () * 1000000 AS BIGINT) AS su_s
            FROM tm)
          SELECT bin, ce AS c_expected, ca AS c_actual,
                 CAST(pe8 AS DOUBLE) / 100000000 AS p_expected,
                 CAST(pa8 AS DOUBLE) / 100000000 AS p_actual,
                 CAST(CASE WHEN su_t < 0
                      THEN -((abs(su_t) * 2 + 10000000000) // 20000000000)
                      ELSE (su_t * 2 + 10000000000) // 20000000000 END
                   AS DOUBLE) / 10000 AS psi_term,
                 CAST(CASE WHEN su_s < 0
                      THEN -((abs(su_s) * 2 + 10000000000) // 20000000000)
                      ELSE (su_s * 2 + 10000000000) // 20000000000 END
                   AS DOUBLE) / 10000 AS psi
          FROM sm ORDER BY bin"""),

    // q185: KS gap maximized as the integer |cp·n⁻ − cq·n⁺|, one exact
    // half-up ratio at the end
    "q185_ks" -> (SCORED +
      """, g AS (
            SELECT user_id, score, CAST(sum(label) AS BIGINT) AS p,
                   CAST(sum(1 - label) AS BIGINT) AS q
            FROM scored GROUP BY 1, 2),
          c AS (
            SELECT user_id, p, q,
                   CAST(sum(p) OVER w AS BIGINT) AS cp,
                   CAST(sum(q) OVER w AS BIGINT) AS cq,
                   CAST(sum(p) OVER t AS BIGINT) AS np,
                   CAST(sum(q) OVER t AS BIGINT) AS nq
            FROM g WINDOW w AS (PARTITION BY user_id ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY user_id)),
          a AS (
            SELECT user_id, max(np) AS n_pos, max(nq) AS n_neg,
                   max(abs(cp * nq - cq * np)) AS dnum
            FROM c WHERE np > 0 AND nq > 0 GROUP BY 1)
          SELECT user_id, n_pos + n_neg AS n, n_pos, n_neg,
                 CAST((dnum * 20000 + n_pos * n_neg)
                   // (2 * n_pos * n_neg) AS DOUBLE) / 10000 AS ks
          FROM a ORDER BY 1"""),

    // q186: MI(sign(score), label) via 6dp micro-nat DECIMAL terms and
    // the signed half-up /n bridge
    "q186_mutual_info" -> (SCORED +
      """, cxy AS (
            SELECT user_id, CAST(sign(score) AS INTEGER) AS x, label,
                   count(*) AS c
            FROM scored GROUP BY 1, 2, 3),
          j AS (
            SELECT user_id, c,
                   CAST(sum(c) OVER (PARTITION BY user_id, x)
                     AS BIGINT) AS rx,
                   CAST(sum(c) OVER (PARTITION BY user_id, label)
                     AS BIGINT) AS cy,
                   CAST(sum(c) OVER (PARTITION BY user_id)
                     AS BIGINT) AS n
            FROM cxy),
          t AS (
            SELECT user_id, n,
                   CAST(c AS DECIMAL(12,0))
                     * CAST(round(ln(CAST(c * n AS DOUBLE) / (rx * cy)),
                         6) AS DECIMAL(10,6)) AS t
            FROM j),
          a AS (
            SELECT user_id, max(n) AS n,
                   CAST(sum(t) AS DECIMAL(38,6)) AS s
            FROM t GROUP BY 1),
          f AS (
            SELECT user_id, n, CAST(s * 1000000 AS BIGINT) AS su FROM a)
          SELECT user_id, n,
                 CAST(CASE WHEN su < 0
                      THEN -((abs(su) * 2 + n * 100) // (n * 200))
                      ELSE (su * 2 + n * 100) // (n * 200) END
                   AS DOUBLE) / 10000 AS mi
          FROM f ORDER BY 1"""),

    // q196: md5-parity arms, per-user any-conversion, pooled z with
    // the identical double expression tree
    "q196_ab_test" ->
      """WITH pu AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END) AS conv
            FROM events GROUP BY user_id, CAST(ts AS DATE)),
          armed AS (
            SELECT CASE WHEN CAST(concat('0x',
                     substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                   conv
            FROM pu),
          g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(conv) AS BIGINT) AS c
                FROM armed GROUP BY 1),
          one AS (
            SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
                   max(CASE WHEN arm = 'A' THEN c END) AS c_a,
                   max(CASE WHEN arm = 'B' THEN n END) AS n_b,
                   max(CASE WHEN arm = 'B' THEN c END) AS c_b
            FROM g),
          pz AS (
            SELECT *, CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS p
            FROM one)
          SELECT n_a, c_a, n_b, c_b,
                 CAST((c_a * 20000 + n_a) // (2 * n_a) AS DOUBLE)
                   / 10000 AS rate_a,
                 CAST((c_b * 20000 + n_b) // (2 * n_b) AS DOUBLE)
                   / 10000 AS rate_b,
                 CASE WHEN p > 0 AND p < 1 THEN
                   round((CAST(c_a AS DOUBLE) / n_a
                          - CAST(c_b AS DOUBLE) / n_b)
                         / sqrt(p * (1.0 - p)
                                * (1.0 / n_a + 1.0 / n_b)), 4) END AS z
          FROM pz""",

    // q219: per-value half counts, integer cumulative gap, one ratio
    "q219_ks_drift" -> (SCORED +
      """, ext AS (SELECT min(date) AS dmin, max(date) AS dmax
                   FROM scored),
          tg AS (
            SELECT score,
                   CASE WHEN date <= dmin +
                     CAST(date_diff('day', dmin, dmax) // 2 AS INTEGER)
                   THEN 1 ELSE 0 END AS h1
            FROM scored, ext),
          pv AS (
            SELECT score AS v, CAST(sum(h1) AS BIGINT) AS c1,
                   CAST(count(*) - sum(h1) AS BIGINT) AS c2
            FROM tg GROUP BY 1),
          c AS (
            SELECT CAST(sum(c1) OVER w AS BIGINT) AS k1,
                   CAST(sum(c2) OVER w AS BIGINT) AS k2,
                   CAST(sum(c1) OVER t AS BIGINT) AS n1,
                   CAST(sum(c2) OVER t AS BIGINT) AS n2
            FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW),
                   t AS ())
          SELECT max(n1) AS n_first, max(n2) AS n_second,
                 CAST((max(abs(k1 * n2 - k2 * n1)) * 20000
                       + greatest(max(n1) * max(n2), 1))
                      // (2 * greatest(max(n1) * max(n2), 1))
                   AS DOUBLE) / 10000 AS ks
          FROM c"""),

    // q227: per-user mode classifier (count desc, class asc), exact
    // discordant counts, one bridge ratio
    "q227_mcnemar" -> (PRED_BASE +
      """, cnt AS (
            SELECT user_id, actual_class, count(*) AS n
            FROM base GROUP BY 1, 2),
          md AS (
            SELECT user_id, actual_class AS b_pred FROM (
              SELECT user_id, actual_class,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY n DESC, actual_class ASC) AS rn
              FROM cnt) t WHERE rn = 1),
          p AS (
            SELECT CASE WHEN predicted_class = actual_class
                   THEN 1 ELSE 0 END AS a_ok,
                   CASE WHEN b_pred = actual_class
                   THEN 1 ELSE 0 END AS b_ok
            FROM base JOIN md USING (user_id)),
          g AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM p)
          SELECT n, b, c,
                 CAST(((b - c) * (b - c) * 20000 + greatest(b + c, 1))
                      // (2 * greatest(b + c, 1)) AS DOUBLE) / 10000
                   AS chi2
          FROM g"""),

    // q236: κ from exact integer marginals; NULL predictions form
    // their own never-agreeing marginal class (identical join
    // semantics both engines); signed 4dp bridge
    "q236_cohen_kappa" -> (PRED_BASE +
      """, g AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN predicted_class = actual_class
                     THEN 1 ELSE 0 END) AS BIGINT) AS agree
            FROM base GROUP BY 1),
          r AS (
            SELECT user_id, predicted_class AS k,
                   CAST(count(*) AS BIGINT) AS rk
            FROM base WHERE predicted_class IS NOT NULL GROUP BY 1, 2),
          cm AS (
            SELECT user_id, actual_class AS k,
                   CAST(count(*) AS BIGINT) AS ck
            FROM base GROUP BY 1, 2),
          e AS (
            SELECT user_id, CAST(sum(rk * ck) AS BIGINT) AS e
            FROM r JOIN cm USING (user_id, k) GROUP BY 1)
          SELECT g.user_id, n, agree,
                 CAST(CASE WHEN n * agree - e < 0
                      THEN -((abs(n * agree - e) * 20000 + (n * n - e))
                             // (2 * (n * n - e)))
                      ELSE ((n * agree - e) * 20000 + (n * n - e))
                           // (2 * (n * n - e)) END AS DOUBLE) / 10000
                   AS kappa
          FROM g JOIN e USING (user_id)
          WHERE n * n <> e ORDER BY 1"""),

    // q237: exact confusion counts; √ of their product is the only
    // double (off the decimal-tie class)
    "q237_matthews_corr" -> (SCORED +
      """, g AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN score > 0 AND label = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN score > 0 AND label = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN score <= 0 AND label = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                   CAST(sum(CASE WHEN score <= 0 AND label = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM scored GROUP BY 1)
          SELECT user_id, tp, fp, tn, fn,
                 round(CAST(tp * tn - fp * fn AS DOUBLE)
                       / sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE)
                              * CAST((tn + fp) * (tn + fn) AS DOUBLE)),
                       4) AS mcc
          FROM g
          WHERE tp + fp > 0 AND tp + fn > 0
            AND tn + fp > 0 AND tn + fn > 0
          ORDER BY 1"""),

    // q315: Laplace-smoothed 8dp bridge shares; IV terms as 6dp
    // decimals before the order-free total
    "q315_woe_iv" -> (SCORED +
      """, dec AS (
            SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC,
              user_id ASC, date ASC) AS BIGINT) AS decile
            FROM scored),
          g AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(label) AS BIGINT) AS np
            FROM dec GROUP BY 1),
          t AS (
            SELECT decile, n, np, n - np AS nn,
                   CAST(sum(np) OVER () AS BIGINT) AS tp,
                   CAST(sum(n - np) OVER () AS BIGINT) AS tn
            FROM g),
          f AS (
            SELECT decile, n, np, nn,
                   CAST(((np + 1) * 200000000 + (tp + 2))
                     // (2 * (tp + 2)) AS DOUBLE) / 100000000 AS ps,
                   CAST(((nn + 1) * 200000000 + (tn + 2))
                     // (2 * (tn + 2)) AS DOUBLE) / 100000000 AS ns
            FROM t),
          iv AS (
            SELECT decile, n, np AS n_pos, nn AS n_neg,
                   round(ln(ps / ns), 4) AS woe,
                   CAST(round((ps - ns) * ln(ps / ns), 6)
                     AS DECIMAL(28,6)) AS ivt
            FROM f)
          SELECT decile, n, n_pos, n_neg, woe,
                 CAST(ivt AS DOUBLE) AS iv_term,
                 round(CAST(sum(ivt) OVER () AS DOUBLE), 6)
                   AS iv_total
          FROM iv ORDER BY 1"""),

    // q241: deterministic total order (score desc, date asc); 1/rank
    // through the 6dp bridge
    "q241_mrr" -> (SCORED +
      """, rk AS (
            SELECT user_id, label,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY score DESC, date ASC) AS rnk
            FROM scored),
          g AS (
            SELECT user_id, CAST(min(rnk) AS BIGINT) AS first_rank
            FROM rk WHERE label = 1 GROUP BY 1)
          SELECT user_id, first_rank,
                 CAST((2000000 + first_rank) // (2 * first_rank)
                   AS DOUBLE) / 1000000 AS rr
          FROM g ORDER BY 1"""),

    // q242: exact integer hits@10 under the same order, bridge ratios
    "q242_precision_at_k" -> (SCORED +
      """, rk AS (
            SELECT user_id, label,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY score DESC, date ASC) AS rnk
            FROM scored),
          g AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   CAST(sum(CASE WHEN rnk <= 10 THEN label ELSE 0 END)
                     AS BIGINT) AS hits
            FROM rk GROUP BY 1)
          SELECT user_id, n_pos, hits,
                 CAST((hits * 20000 + least(10, n))
                      // (2 * least(10, n)) AS DOUBLE) / 10000
                   AS precision_at,
                 CAST((hits * 20000 + n_pos) // (2 * n_pos) AS DOUBLE)
                   / 10000 AS recall_at
          FROM g WHERE n_pos > 0 ORDER BY 1"""),

    // q337: the SAME generated micro-int log2 discounts the plan uses
    // (ModelEval.ndcgDiscounts) — DCG/IDCG as exact long sums, no
    // runtime logarithm in either engine
    "q337_ndcg_at_k" -> ndcgOracle(10),
    // q340: ERR@k — see errOracle (shared generated 2^j literals)
    "q340_err_at_k" -> errOracle(10),

    // q238: per-class recall through a 6dp bridge, mean through a 4dp
    // bridge — integer arithmetic end to end
    "q238_balanced_accuracy" -> (PRED_BASE +
      """, pc AS (
            SELECT user_id, actual_class,
                   CAST(count(*) AS BIGINT) AS ck,
                   CAST(sum(CASE WHEN predicted_class = actual_class
                     THEN 1 ELSE 0 END) AS BIGINT) AS hit
            FROM base GROUP BY 1, 2),
          r6 AS (
            SELECT user_id, (hit * 2000000 + ck) // (2 * ck) AS r6
            FROM pc),
          g AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(sum(r6) AS BIGINT) AS s6
            FROM r6 GROUP BY 1)
          SELECT user_id, n_classes,
                 CAST((s6 * 2 + n_classes * 100)
                      // (2 * n_classes * 100) AS DOUBLE) / 10000
                   AS balanced_acc
          FROM g ORDER BY 1"""),

    // q229: integer-cents first digit via the BIGINT string form —
    // no float log10 anywhere; Benford constants as 6dp literals
    "q229_benford" ->
      """WITH c AS (
           SELECT CAST(substr(CAST(CAST(CAST(value AS DECIMAL(12,2))
             * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM events WHERE value > 0),
         g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_values
               FROM c GROUP BY 1),
         w AS (SELECT *, CAST(sum(n_values) OVER () AS BIGINT) AS t
               FROM g)
         SELECT digit, n_values,
                CAST((n_values * 20000 + greatest(t, 1))
                     // (2 * greatest(t, 1)) AS DOUBLE) / 10000
                  AS share,
                CASE digit WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091
                     WHEN 3 THEN 0.124939 WHEN 4 THEN 0.09691
                     WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
                     WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
                     ELSE 0.045757 END AS benford_share
         FROM w ORDER BY digit""",

    // q216: the same violation aggregates from one CTE row, exploded
    // by UNION ALL with identical constraint names
    "q216_constraints" ->
      """WITH a AS (
           SELECT
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS c_nn_user,
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS c_nn_ts,
             CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
               AS c_uniq,
             CAST(sum(CASE WHEN value IS NULL OR value < 0.0
               OR value > 400.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_range,
             CAST(sum(CASE WHEN event_type IS NULL OR event_type
               NOT IN ('click', 'purchase', 'signup', 'view')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_set,
             CAST(CASE WHEN count(*) >= 5000 THEN 0
               ELSE 5000 - count(*) END AS BIGINT) AS c_rows
           FROM events)
         SELECT constraint_name, violations, violations = 0 AS passed
         FROM (
           SELECT 'not_null(user_id)' AS constraint_name,
                  c_nn_user AS violations FROM a
           UNION ALL SELECT 'not_null(ts)', c_nn_ts FROM a
           UNION ALL SELECT 'unique(event_id)', c_uniq FROM a
           UNION ALL SELECT 'in_range(value,0.0,400.0)', c_range FROM a
           UNION ALL SELECT 'in_set(event_type)', c_set FROM a
           UNION ALL SELECT 'min_rows(5000)', c_rows FROM a)
         ORDER BY constraint_name""",

    // q210: cumulative TP/FP over distinct thresholds descending;
    // exact bridge ratios
    "q210_pr_curve" -> (SCORED +
      """, g AS (
            SELECT score, CAST(sum(label) AS BIGINT) AS p,
                   CAST(count(*) - sum(label) AS BIGINT) AS q
            FROM scored GROUP BY 1),
          c AS (
            SELECT score,
                   CAST(sum(p) OVER w AS BIGINT) AS tp,
                   CAST(sum(q) OVER w AS BIGINT) AS fp,
                   CAST(sum(p) OVER t AS BIGINT) AS np
            FROM g WINDOW w AS (ORDER BY score DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS ())
          SELECT score AS threshold, tp, fp,
                 CAST((tp * 20000 + (tp + fp)) // (2 * (tp + fp))
                   AS DOUBLE) / 10000 AS precision_at,
                 CAST((tp * 20000 + greatest(np, 1))
                      // (2 * greatest(np, 1)) AS DOUBLE) / 10000
                   AS recall_at
          FROM c ORDER BY threshold DESC"""),

    // q175: AP = mean over positives of precision@rank, ranked by
    // (score DESC, date) so tie runs resolve identically in both engines
    "q175_avg_precision" -> (SCORED +
      """, r AS (
            SELECT user_id, label,
                   row_number() OVER w AS k,
                   sum(label) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum_pos
            FROM scored
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY score DESC, date)),
          a AS (
            SELECT user_id, count(*) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   sum(CASE WHEN label = 1
                            THEN CAST(cum_pos AS DOUBLE) / k END) AS ap_sum
            FROM r GROUP BY 1)
          SELECT user_id, n, n_pos, round(ap_sum / n_pos, 4) AS ap
          FROM a WHERE n_pos > 0 ORDER BY 1"""),
    // q176: equal-width probability bins of sigmoid(score); frac_pos
    // rounds through the exact scaled-long bridge on both sides
    "q176_calibration" -> (SCORED +
      """, p AS (
            SELECT label, 1e0 / (1e0 + exp(-score)) AS p,
                   CAST(least(floor((1e0 / (1e0 + exp(-score))) * 10),
                              9) AS BIGINT) AS bin
            FROM scored),
          a AS (
            SELECT bin, count(*) AS n,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   round(avg(p), 4) AS mean_p
            FROM p GROUP BY 1)
          SELECT bin, n, n_pos, mean_p,
                 CAST((2 * n_pos * 10000 + n) // (2 * n) AS DOUBLE)
                   / 10000 AS frac_pos
          FROM a ORDER BY 1"""),
    // q174: p = sigmoid(score) clipped to [eps, 1-eps]; ln = Spark log
    "q174_log_loss" -> (SCORED +
      """, p AS (
            SELECT user_id, CAST(label AS DOUBLE) AS y,
                   least(greatest(1e0 / (1e0 + exp(-score)), 1e-15),
                         1e0 - 1e-15) AS p
            FROM scored)
          SELECT user_id, count(*) AS n,
                 round(avg(-(y * ln(p) + (1e0 - y) * ln(1e0 - p))), 4)
                   AS log_loss,
                 round(avg(power(p - y, 2)), 4) AS brier
          FROM p GROUP BY 1 ORDER BY 1"""),
    "q159_profile" -> (Seq("event_id", "ts", "user_id", "event_type",
        "value", "props").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
              count(*) - count($c) AS n_null,
              count(DISTINCT $c) AS n_distinct FROM events"""
      }.mkString(" UNION ALL ") + " ORDER BY col_name"),
    "q68_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS lvl,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         GROUP BY ROLLUP(lang, source)
         ORDER BY lvl, lang, source""",
    "q41_accuracy_by_user" -> (PRED_BASE +
      """ SELECT user_id, count(*) AS n_predictions,
            CAST(sum(is_correct) AS BIGINT) AS n_correct,
            -- count-ratio pct rounded in exact integer arithmetic
            -- (engine round() diverges exactly on decimal ties)
            CAST((2000 * sum(is_correct) + count(*))
                 // (2 * count(*)) AS DOUBLE) / 10 || '%'
              AS accuracy_pct,
            CAST(sum(CAST(volatility AS DECIMAL(18,4))) AS DOUBLE)
              AS sum_volatility
          FROM base GROUP BY 1 ORDER BY 1"""),
    "q42_accuracy_by_day" -> (PRED_BASE +
      """ SELECT strftime(date, '%Y-%m-%d') AS date,
            count(*) AS n_predictions,
            CAST(sum(is_correct) AS BIGINT) AS n_correct,
            string_agg(CASE WHEN is_correct = 1 THEN '✅' ELSE '❌' END,
                       ' ' ORDER BY user_id) AS marks
          FROM base GROUP BY date ORDER BY date"""),
    "q43_confusion_matrix" -> (PRED_BASE +
      """ SELECT predicted_class, actual_class, count(*) AS n
          FROM base GROUP BY 1, 2 ORDER BY 1, 2"""),
    "q44_class_metrics" -> (PRED_BASE +
      """, cm AS (
            SELECT predicted_class, actual_class, count(*) AS n
            FROM base GROUP BY 1, 2),
          m AS (
            SELECT predicted_class, actual_class,
              (20000 * n + sum(n) OVER (PARTITION BY predicted_class))
                // (2 * sum(n) OVER (PARTITION BY predicted_class))
                AS p4,
              (20000 * n + sum(n) OVER (PARTITION BY actual_class))
                // (2 * sum(n) OVER (PARTITION BY actual_class))
                AS r4
            FROM cm)
          SELECT predicted_class AS class,
                 CAST(p4 AS DOUBLE) / 10000 AS precision,
                 CAST(r4 AS DOUBLE) / 10000 AS recall,
                 CASE WHEN p4 + r4 = 0 THEN NULL
                      ELSE CAST((2 * (2 * p4 * r4) + (p4 + r4))
                           // (2 * (p4 + r4)) AS DOUBLE) / 10000
                 END AS f1
          FROM m WHERE predicted_class = actual_class ORDER BY 1"""),
    "q53_top_movers" -> (STAGED_MOVERS +
      """ SELECT user_id, strftime(date, '%Y-%m-%d') AS date, pct_change,
            (CASE WHEN pct_change >= 0 THEN '+' ELSE '' END
             || printf('%.2f', pct_change) || '%') AS pct_formatted
          FROM staged WHERE pct_change IS NOT NULL
          ORDER BY pct_change DESC, user_id, date LIMIT 10"""),
    "q54_topic_sentiment" -> (STAGED_MOVERS +
      """ SELECT
            CASE WHEN abs(pct_change) > 5 THEN 'volatility'
                 WHEN abs(pct_change) > 2 THEN 'momentum'
                 ELSE 'steady' END AS topic,
            CASE WHEN pct_change > 1 THEN 'positive'
                 WHEN pct_change < -1 THEN 'negative'
                 ELSE 'neutral' END AS sentiment,
            count(*) AS n
          FROM staged WHERE pct_change IS NOT NULL
          GROUP BY 1, 2 ORDER BY 1, 2"""),
    "q55_model_versions" -> (PRED_BASE +
      """, preds AS (
            SELECT user_id, date, actual_class, 'low' AS predicted_class,
                   'v1_always_low' AS model_version FROM base
            UNION ALL
            SELECT user_id, date, actual_class, predicted_class,
                   'v2_persistence' FROM base)
          SELECT model_version, count(*) AS n_predictions,
            CAST(sum(CASE WHEN predicted_class = actual_class
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
            CAST((20000 * sum(CASE WHEN predicted_class = actual_class
                                   THEN 1 ELSE 0 END) + count(*))
                 // (2 * count(*)) AS DOUBLE) / 100 AS accuracy_pct,
            strftime(min(date), '%Y-%m-%d') AS first_date,
            strftime(max(date), '%Y-%m-%d') AS last_date
          FROM preds GROUP BY 1 ORDER BY 1"""),
    "q56_latest_version_accuracy" -> (PRED_BASE +
      """ SELECT user_id, count(*) AS n,
            CAST(sum(CASE WHEN predicted_class = actual_class
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
          FROM base GROUP BY 1 ORDER BY 1"""),
    "q94_best_run" -> (PRED_BASE +
      """, preds AS (
            SELECT user_id, date, actual_class, 'low' AS predicted_class,
                   'v1_always_low' AS model_version,
                   TIMESTAMP '2024-02-01 00:00:00' AS created_at FROM base
            UNION ALL
            SELECT user_id, date, actual_class, predicted_class,
                   'v2_persistence', TIMESTAMP '2024-03-01 00:00:00'
            FROM base),
          rm AS (
            SELECT model_version AS run_id, created_at,
                   CAST((20000 * sum(CASE WHEN predicted_class
                                            = actual_class
                                          THEN 1 ELSE 0 END) + count(*))
                        // (2 * count(*)) AS DOUBLE) / 100
                     AS accuracy_pct,
                   CAST(count(*) AS DOUBLE) AS n_predictions
            FROM preds GROUP BY 1, 2),
          runs AS (
            SELECT run_id, 'baseline' AS model_type, created_at,
                   'accuracy_pct' AS metric, accuracy_pct AS value FROM rm
            UNION ALL
            SELECT run_id, 'baseline', created_at, 'n_predictions',
                   n_predictions FROM rm)
          SELECT run_id, model_type,
                 strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
                 metric, value,
                 CAST(row_number() OVER (PARTITION BY metric
                        ORDER BY value DESC, created_at DESC, run_id)
                      AS BIGINT) AS rank
          FROM runs ORDER BY metric, rank"""),
    "q45_summary" -> (PRED_BASE +
      """ SELECT count(*) AS n_predictions,
            CAST(sum(is_correct) AS BIGINT) AS n_correct,
            CAST((20000 * sum(is_correct) + count(*))
                 // (2 * count(*)) AS DOUBLE) / 100 AS accuracy_pct,
            count(DISTINCT user_id) AS n_keys,
            strftime(min(date), '%Y-%m-%d') AS min_date,
            strftime(max(date), '%Y-%m-%d') AS max_date
          FROM base"""))
}
