package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Indicators, WindowFns}

/** Port of the reference's feature pipeline (ml/feature_engineering.py:
  * 96-169) to native window/column expressions over the daily-bar series.
  *
  * Everything is lazily-composed Catalyst expressions over ONE window key
  * (user_id ordered by date): the whole feature build is a single
  * shuffle-by-key then per-partition sorted window evaluation — the same
  * plan shape at 5 keys or 5 million.
  *
  * Column-order contract (reference get_feature_columns,
  * feature_engineering.py:172-207): featureColumns is the stable ordered
  * list fed to VectorAssembler; tests pin it.
  */
object FeatureEngineering {

  val sentimentVocab: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Ordered feature-column contract. */
  val featureColumns: Seq[String] =
    Seq("volatility", "price_change_1", "price_change_3", "price_change_5",
      "rsi_14", "atr_14", "bb_width_20", "volume_ratio") ++
      (1 to 3).map(k => s"volatility_lag_$k") ++
      (1 to 3).map(k => s"volume_ratio_lag_$k") ++
      Seq(3, 5, 10, 20).flatMap(w => Seq(s"close_ma_$w", s"close_std_$w")) ++
      Seq("day_of_week", "month", "sentiment_score") ++
      sentimentVocab.map(v => s"topic_$v")

  /** Label mapping low/medium/high → 0/1/2
    * (reference: feature_engineering.py:227-228). */
  def labelOf(volClass: org.apache.spark.sql.Column) =
    when(volClass === "low", 0.0)
      .when(volClass === "medium", 1.0)
      .when(volClass === "high", 2.0)

  def classOf(label: org.apache.spark.sql.Column) =
    when(label === 0.0, "low")
      .when(label === 1.0, "medium")
      .when(label === 2.0, "high")

  /** Build the feature frame from daily bars (+ optional per-(key,day)
    * sentiment). With forPrediction=false adds next-day target columns
    * (lead + pd.cut classes + int labels) and drops unlabeled rows. */
  def apply(bars: DataFrame, sentiment: Option[DataFrame] = None,
            forPrediction: Boolean = false): DataFrame = {
    val w = WindowFns.series(col("user_id"), col("date"))
    val vol = Indicators.volatility(col("high"), col("low"), col("close"))

    val withSent = sentiment match {
      case Some(sd) => bars.join(broadcast(sd), Seq("user_id", "date"),
        "left")
      case None => bars.withColumn("sentiment", lit(null).cast("string"))
    }

    // rsi/bollinger via the staged forms: each distinct window aggregate
    // computed once instead of per textual occurrence (r12 optimization;
    // Indicators.rsiStaged scaladoc) — identical values, spec-pinned
    var df = Indicators.bollingerStaged(
      Indicators.rsiStaged(withSent
        .withColumn("volatility", vol)
        .withColumn("price_change_1", WindowFns.pctChange(col("close"), 1, w))
        .withColumn("price_change_3", WindowFns.pctChange(col("close"), 3, w))
        .withColumn("price_change_5", WindowFns.pctChange(col("close"), 5, w)),
        col("close"), w, 14, "rsi_14")
        .withColumn("atr_14",
          Indicators.atr(col("high"), col("low"), col("close"), w, 14)),
      col("close"), w, 20, 2.0, "bb_width_20")
      .withColumn("volume_ma_20",
        WindowFns.rollingMean(col("volume"), 20, 1, w))
      .withColumn("volume_ratio",
        col("volume") / nullif(col("volume_ma_20"), lit(0)))

    for (k <- 1 to 3) {
      df = df
        .withColumn(s"volatility_lag_$k", WindowFns.lagBy(col("volatility"), k, w))
        .withColumn(s"volume_ratio_lag_$k",
          WindowFns.lagBy(col("volume_ratio"), k, w))
    }
    for (win <- Seq(3, 5, 10, 20)) {
      df = df
        .withColumn(s"close_ma_$win",
          WindowFns.rollingMean(col("close"), win, 1, w))
        .withColumn(s"close_std_$win",
          WindowFns.rollingStd(col("close"), win, 1, w))
    }

    df = df
      .withColumn("day_of_week",
        Indicators.dayOfWeekMon0(col("date")).cast("double"))
      .withColumn("month", month(col("date")).cast("double"))
      // F-MAPENC analog: dominant event type → signed engagement score
      .withColumn("sentiment_score",
        coalesce(when(col("sentiment") === "purchase", 1.0)
          .when(col("sentiment") === "error", -1.0)
          .when(col("sentiment").isNotNull, 0.0), lit(0.0)))

    // F-ONEHOT: fixed vocabulary → deterministic column layout (never
    // StringIndexer — index assignment would depend on frequencies)
    for (v <- sentimentVocab)
      df = df.withColumn(s"topic_$v",
        when(col("sentiment") === v, 1.0).otherwise(0.0))

    if (forPrediction) df
    else df
      .withColumn("next_volatility",
        WindowFns.leadBy(col("volatility"), 1, w))
      .withColumn("target_class",
        Indicators.classifyVolatility(col("next_volatility")))
      .withColumn("label", labelOf(col("target_class")))
      .filter(col("label").isNotNull)
      // drop rows whose features are still in indicator warm-up BEFORE the
      // chronological split (reference feature_engineering.py:224,247
      // dropna) — otherwise short series put every complete row after the
      // split cutoff and the training set assembles empty
      .na.drop(featureColumns)
  }
}
