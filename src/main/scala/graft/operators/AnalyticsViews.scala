package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Indicators, WindowFns}

/** The reference's stacked analytics views (sql/dashboard_views.sql:5-182)
  * re-expressed as composable DataFrame functions (SURVEY §2.4 A4-A11,
  * §2.3 J2/J3, §2.8 F-CONCAT/F-EMOJI).
  *
  * The reference compares ML predictions against realized volatility. To
  * keep every view deterministic and oracle-checkable, the prediction
  * column here is the persistence baseline (tomorrow's class = today's
  * class) — the view algebra is identical for any model's output, and the
  * ML path (graft.ml) plugs its predictions into the same functions.
  */
object AnalyticsViews {

  /** actual_volatility twin (dashboard_views.sql:5-16): per (user, date)
    * realized volatility + class, with next-day actual and the
    * persistence prediction. */
  def predictionBase(bars: DataFrame): DataFrame = {
    val w = WindowFns.series(col("user_id"), col("date"))
    val vol = Indicators.volatility(col("high"), col("low"), col("close"))
    bars
      .withColumn("volatility", vol)
      .withColumn("vol_class", Indicators.classifyVolatility(vol))
      .withColumn("actual_class", lead(col("vol_class"), 1).over(w))
      .withColumn("predicted_class", col("vol_class"))
      .filter(col("actual_class").isNotNull)
      .withColumn("is_correct",
        when(col("predicted_class") === col("actual_class"), 1).otherwise(0))
  }

  /** prediction_accuracy / accuracy_by_stock twin
    * (dashboard_views.sql:42-51): counts, correct count, accuracy percent
    * rendered `round(x,1)::text || '%'`. */
  def accuracyByKey(base: DataFrame): DataFrame =
    base.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_predictions"),
        sum(col("is_correct")).cast("long").as("n_correct"),
        // the percentage rounds in exact integer arithmetic
        // (ExactRound scaladoc): 100·correct/n is a COUNT RATIO, which
        // can terminate exactly on the .x5 tie where double round() is
        // engine-dependent
        concat(
          format_number(graft.functions.ExactRound.ratio(
            sum(col("is_correct")) * 100, count(lit(1)), 1), 1),
          lit("%")).as("accuracy_pct"),
        // volatility is 4dp-rounded per row; summing as DECIMAL(18,4) is
        // exact and order-independent, so it reproduces bit-exactly in any
        // engine. A rounded mean is NOT reproducible: sum/count lands on
        // exact .5 rounding boundaries where engines legitimately disagree
        // (shortest-decimal vs exact-binary rounding), so the view exposes
        // the exact sum and leaves mean = sum/n to the consumer.
        sum(col("volatility").cast("decimal(18,4)")).cast("double")
          .as("sum_volatility"))

  /** accuracy_by_day twin (dashboard_views.sql:54-66) incl. the ordered
    * STRING_AGG of per-key ✅/❌ marks — array_sort∘collect_list∘
    * array_join, no custom aggregate needed. */
  def accuracyByDay(base: DataFrame): DataFrame = {
    val mark = when(col("is_correct") === 1, "✅").otherwise("❌")
    base
      .select(col("date"), col("user_id"), col("is_correct"),
        mark.as("mark"))
      .groupBy(col("date"))
      .agg(count(lit(1)).as("n_predictions"),
        sum(col("is_correct")).cast("long").as("n_correct"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("user_id").as("u"),
              col("mark").as("m")))),
            x => x.getField("m")), " ").as("marks"))
  }

  /** confusion_matrix twin (dashboard_views.sql:139-146). */
  def confusionMatrix(base: DataFrame): DataFrame =
    base.groupBy(col("predicted_class"), col("actual_class"))
      .agg(count(lit(1)).as("n"))

  /** precision/recall/F1 per class twins (dashboard_views.sql:149-182),
    * F1 with the NULLIF(p+r,0) guard.
    *
    * The reference stacks two conditional-aggregation views and joins
    * them on class (J3) — which in Spark duplicates the entire upstream
    * lineage into both join branches. Derived instead from the confusion
    * matrix in one pass: precision_den/recall_den are window sums over
    * the (≤ classes²)-row matrix, the diagonal rows carry the numerator.
    * Same numbers, ONE scan of the input. (Degenerate deviation: a class
    * with zero correct predictions has no diagonal cell and is omitted;
    * the view-join emits a 0/0-guarded row.) */
  def classMetrics(base: DataFrame): DataFrame = {
    import graft.functions.ExactRound
    val cm = confusionMatrix(base)
    val pDen = Window.partitionBy(col("predicted_class"))
    val rDen = Window.partitionBy(col("actual_class"))
    // count ratios round in exact integer arithmetic (ExactRound
    // scaladoc); the scaled e4 longs are kept so F1 — a ratio of the
    // ROUNDED P and R — also rounds exactly: with p = p4/10⁴,
    // r = r4/10⁴, round(2pr/(p+r)·10⁴) = round(2·p4·r4/(p4+r4))
    // stage each partition-sum once: ExactRound.scaled references its
    // denominator twice (half-up div), so the inline form planned each
    // sum(n) window aggregate ×2 (per-occurrence extraction, the r12
    // q11/q15 lesson)
    cm
      .withColumn("_pden", sum(col("n")).over(pDen))
      .withColumn("_rden", sum(col("n")).over(rDen))
      .withColumn("_p4", ExactRound.scaled(col("n"), col("_pden"), 4))
      .withColumn("_r4", ExactRound.scaled(col("n"), col("_rden"), 4))
      .filter(col("predicted_class") === col("actual_class"))
      .select(col("predicted_class").as("class"),
        (col("_p4").cast("double") / 10000).as("precision"),
        (col("_r4").cast("double") / 10000).as("recall"),
        when(col("_p4") + col("_r4") === 0, lit(null).cast("double"))
          .otherwise(ExactRound.ratio(
            col("_p4") * col("_r4") * 2, col("_p4") + col("_r4"), 0)
            .cast("double") / 10000).as("f1"))
  }

  /** Multi-model-version prediction log twin (analytics
    * .ml_volatility_predictions with UNIQUE(key,date,model_version)):
    * persistence baseline as v2 (newer) plus an always-low v1 —
    * deterministic stand-ins for successive trained models. */
  def multiVersionPredictions(base: DataFrame): DataFrame = {
    val common = base.select(col("user_id"), col("date"),
      col("actual_class"), col("predicted_class"))
    common
      .withColumn("model_version", lit("v1_always_low"))
      .withColumn("predicted_class", lit("low"))
      .withColumn("created_at", lit("2024-02-01 00:00:00").cast("timestamp"))
      .unionByName(common
        .withColumn("model_version", lit("v2_persistence"))
        .withColumn("created_at",
          lit("2024-03-01 00:00:00").cast("timestamp")))
  }

  /** accuracy_by_model_version twin (dashboard_views.sql:106-116):
    * per-version counts, accuracy, prediction-date span. */
  def accuracyByModelVersion(preds: DataFrame): DataFrame =
    preds
      .withColumn("is_correct",
        when(col("predicted_class") === col("actual_class"), 1).otherwise(0))
      .groupBy(col("model_version"))
      .agg(count(lit(1)).as("n_predictions"),
        sum(col("is_correct")).cast("long").as("n_correct"),
        graft.functions.ExactRound.ratio(
          sum(col("is_correct")) * 100, count(lit(1)), 2)
          .as("accuracy_pct"),
        min(col("date")).as("first_date"),
        max(col("date")).as("last_date"))

  /** Latest-model-version semi-filter twin (dashboard_views.sql:98-103):
    * keep only rows of the version with the newest created_at — the
    * scalar-subquery J5 pattern as a broadcast single-row join. */
  def latestVersionOnly(preds: DataFrame): DataFrame = {
    val latest = preds.select(col("model_version"), col("created_at"))
      .groupBy(col("model_version"))
      .agg(max(col("created_at")).as("created_at"))
      .orderBy(col("created_at").desc, col("model_version"))
      .limit(1).select(col("model_version"))
    preds.join(broadcast(latest), Seq("model_version"))
  }

  /** Concentration profile of activity per group: how unevenly `key`s
    * share the group's event volume — Herfindahl-Hirschman index
    * `HHI = Σc²/S²` and Gini `G = (2·Σᵢ i·cᵢ − (n+1)·S) / (n·S)` over
    * counts c sorted ascending (row_number tie-broken by key so both
    * engines rank identically). Both ratios are INTEGER/INTEGER, so
    * they round through the exact scaled-long bridge — no float path
    * at all. Two hash aggregates + one bounded sort-window per group;
    * Σc² fits a long for S up to ~3·10⁹ per group (repartition by
    * group key before this at larger per-group volumes). */
  def concentration(events: DataFrame, group: String = "event_type",
                    key: String = "user_id"): DataFrame = {
    val counts = events.groupBy(col(group), col(key))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(group))
      .orderBy(col("c").asc, col(key).asc)
    val ranked = counts.withColumn("i", row_number().over(w).cast("long"))
    ranked.groupBy(col(group))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ssq"),
        sum(col("i") * col("c")).as("a"))
      .select(col(group), col("n").as("n_keys"),
        col("s").as("total_events"),
        graft.functions.ExactRound.ratio(col("ssq"),
          col("s") * col("s"), 4).as("hhi"),
        graft.functions.ExactRound.signedRatio(
          lit(2) * col("a") - (col("n") + 1) * col("s"),
          col("n") * col("s"), 4).as("gini"))
  }

  /** McNemar's paired test between two DETERMINISTIC classifiers on
    * the same rows: A = the persistence prediction already in `base`,
    * B = each user's majority actual class (count desc, class asc
    * tiebreak — a total order). The discordant counts b (A right,
    * B wrong) and c (B right, A wrong) are exact integers and
    * `χ² = (b−c)²/(b+c)` is one bridge ratio — the "is the fancier
    * model actually better on the SAME examples" readout. One mode
    * window + one global fold. */
  def mcnemar(base: DataFrame): DataFrame = {
    val counts = base.groupBy(col("user_id"), col("actual_class"))
      .agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_n").desc, col("actual_class").asc)
    val modes = counts.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("actual_class").as("b_pred"))
    val paired = base.join(broadcast(modes), Seq("user_id"))
      // a null prediction (degenerate bar) is WRONG, not unknown —
      // the SQL CASE semantics
      .withColumn("a_ok",
        coalesce(col("predicted_class") === col("actual_class"),
          lit(false)).cast("long"))
      .withColumn("b_ok",
        coalesce(col("b_pred") === col("actual_class"), lit(false))
          .cast("long"))
    paired.agg(count(lit(1)).as("n"),
        sum(when(col("a_ok") === 1 && col("b_ok") === 0, 1L)
          .otherwise(0L)).cast("long").as("b"),
        sum(when(col("a_ok") === 0 && col("b_ok") === 1, 1L)
          .otherwise(0L)).cast("long").as("c"))
      .select(col("n"), col("b"), col("c"),
        graft.functions.ExactRound.ratio(
          (col("b") - col("c")) * (col("b") - col("c")),
          greatest(col("b") + col("c"), lit(1L)), 4).as("chi2"))
  }

  /** Two-dimensional skyline (Pareto front): rows maximizing `maxCol`
    * while minimizing `minCol` that no other row dominates (≥ on the
    * max axis, ≤ on the min axis, strict on at least one). Strict
    * dominance comes from a `dense_rank` over the max axis — `min(
    * minCol) over (ORDER BY rank RANGE 1 FOLLOWING → ∞)` is the best
    * min-value among STRICTLY better max-values for ANY axis type
    * (a RANGE offset of 1 directly on `maxCol` is only strict for
    * integer axes: a fractional dominator in (v, v+1) would fall
    * outside the frame); equal-max ties resolve through a second min
    * over the rank's peer group. O(n log n), one sort, no self-join —
    * runs over the entity dimension, not facts. */
  def skyline2d(df: DataFrame, maxCol: String, minCol: String)
      : DataFrame = {
    val rk = Window.orderBy(col(maxCol).asc)
    val better = Window.orderBy(col("_dr").asc)
      .rangeBetween(1L, Window.unboundedFollowing)
    val peers = Window.partitionBy(col("_dr"))
    df.withColumn("_dr", dense_rank().over(rk))
      .withColumn("_ba", min(col(minCol)).over(better))
      .withColumn("_bp", min(col(minCol)).over(peers))
      // dominated by a strictly-better max with min ≤ ours, or by an
      // equal-max peer with a strictly smaller min
      .where((col("_ba").isNull || col("_ba") > col(minCol)) &&
        col(minCol) === col("_bp"))
      .drop("_dr", "_ba", "_bp")
  }

  /** Cohen's kappa per key — chance-corrected agreement between the
    * predicted and actual class series:
    * `κ = (n·Σagree − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k)` on exact
    * integer marginals (r_k = predicted count, c_k = actual count of
    * class k). A null prediction is its own marginal class that never
    * agrees — identical join semantics in both engines. Keys where the
    * marginal product saturates n² (single-class degenerate) drop.
    * Three hash aggregates sharing the user key + one bounded
    * class-marginal join. */
  def cohenKappa(base: DataFrame): DataFrame = {
    val g = base.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(coalesce((col("predicted_class") === col("actual_class"))
          .cast("long"), lit(0L))).cast("long").as("agree"))
    val r = base.where(col("predicted_class").isNotNull)
      .groupBy(col("user_id"), col("predicted_class").as("k"))
      .agg(count(lit(1)).cast("long").as("rk"))
    val c = base.groupBy(col("user_id"), col("actual_class").as("k"))
      .agg(count(lit(1)).cast("long").as("ck"))
    val exp = r.join(c, Seq("user_id", "k"))
      .groupBy(col("user_id"))
      .agg(sum(col("rk") * col("ck")).cast("long").as("e"))
    g.join(exp, Seq("user_id"))
      .where(col("n") * col("n") =!= col("e"))
      .select(col("user_id"), col("n"), col("agree"),
        graft.functions.ExactRound.signedRatio(
          col("n") * col("agree") - col("e"),
          col("n") * col("n") - col("e"), 4).as("kappa"))
  }

  /** Balanced accuracy per key — the mean of per-class recalls, so a
    * dominant class cannot mask minority-class misses the way raw
    * accuracy does. Each recall rounds through the exact bridge to a
    * 6dp scaled long, their mean through a second bridge to 4dp —
    * integer arithmetic end to end. One (key, class) aggregate + one
    * key rollup. */
  def balancedAccuracy(base: DataFrame): DataFrame = {
    val perClass = base.groupBy(col("user_id"), col("actual_class"))
      .agg(count(lit(1)).cast("long").as("ck"),
        sum(coalesce((col("predicted_class") === col("actual_class"))
          .cast("long"), lit(0L))).cast("long").as("hit"))
      .withColumn("r6",
        graft.functions.ExactRound.scaled(col("hit"), col("ck"), 6))
    perClass.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("r6")).cast("long").as("s6"))
      .select(col("user_id"), col("n_classes"),
        graft.functions.ExactRound.ratio(col("s6"),
          col("n_classes") * 100L, 0).divide(lit(10000.0))
          .as("balanced_acc"))
  }

  /** Benford first-digit audit of a positive money-like column: the
    * value lifts to exact integer cents, the first digit comes from
    * the BIGINT's string form (engine-portable — no float log10), and
    * each digit's observed share sits next to Benford's expected
    * log₁₀(1+1/d). Deviations flag synthetic or truncated data. One
    * bounded (9-row) aggregate. */
  def benford(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val cents = (col(valueCol).cast("decimal(12,2)") * 100)
      .cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("long")
    val expected = (1 to 9).map(d =>
      BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    df.where(col(valueCol) > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_values"))
      .withColumn("_t", sum(col("n_values")).over(tot).cast("long"))
      .select(col("digit"), col("n_values"),
        graft.functions.ExactRound.ratio(col("n_values"),
          greatest(col("_t"), lit(1L)), 4).as("share"),
        element_at(array(expected.map(lit): _*),
          col("digit").cast("int")).as("benford_share"))
  }

  /** Histogram of per-entity fact counts INCLUDING zero-fact entities
    * (the TPC-H Q13 shape): LEFT join entities to facts, count
    * non-null fact keys per entity, histogram the counts. Two hash
    * aggregates — the second over the bounded count domain. */
  def countDistribution(entities: DataFrame, facts: DataFrame,
                        entityKey: String, factKey: String,
                        countedCol: String): DataFrame = {
    val per = entities
      .join(facts, col(entityKey) === col(factKey), "left")
      .groupBy(col(entityKey))
      .agg(count(col(countedCol)).as("c_count"))
    per.groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Deterministic-arm A/B conversion test: users are split into arms
    * A/B by md5-hash parity (the stable assignment an experimentation
    * system would persist), conversion is measured per ACTIVE USER-DAY
    * (a day with at least one `convType` event), and the readout is
    * the two-proportion z statistic
    * `z = (p_A − p_B)/√(p̂(1−p̂)(1/n_A + 1/n_B))` with pooled p̂ (the
    * naive reading — a clustered-error correction is downstream
    * analysis). Counts are exact integers; the arm rates go through
    * the exact bridge (count ratios are the decimal-tie class); z
    * itself passes through a √ so its double is never decimal-exact —
    * identical expression trees round identically, and z is null when
    * the pooled rate is degenerate (0 or 1). One per-user-day
    * aggregate + a 2-row fold. */
  def abTest(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val perUnit = events
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("conv"))
    val armA = graft.operators.Sampling.hashBucket(col("user_id")) % 2 === 0
    val g = perUnit
      .withColumn("arm", when(armA, lit("A")).otherwise(lit("B")))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("c"))
    val one = g.agg(
      max(when(col("arm") === "A", col("n"))).as("n_a"),
      max(when(col("arm") === "A", col("c"))).as("c_a"),
      max(when(col("arm") === "B", col("n"))).as("n_b"),
      max(when(col("arm") === "B", col("c"))).as("c_b"))
    val p = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = (col("c_a").cast("double") / col("n_a") -
      col("c_b").cast("double") / col("n_b")) /
      sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    one.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      graft.functions.ExactRound.ratio(col("c_a"), col("n_a"), 4)
        .as("rate_a"),
      graft.functions.ExactRound.ratio(col("c_b"), col("n_b"), 4)
        .as("rate_b"),
      when(p > 0 && p < 1, round(z, 4)).as("z"))
  }

  /** summary twin (dashboard_views.sql:69-78): global counts, distinct
    * keys, span. */
  def summary(base: DataFrame): DataFrame =
    base.agg(count(lit(1)).as("n_predictions"),
      sum(col("is_correct")).cast("long").as("n_correct"),
      graft.functions.ExactRound.ratio(
        sum(col("is_correct")) * 100, count(lit(1)), 2)
        .as("accuracy_pct"),
      countDistinct(col("user_id")).as("n_keys"),
      min(col("date")).as("min_date"),
      max(col("date")).as("max_date"))
}
