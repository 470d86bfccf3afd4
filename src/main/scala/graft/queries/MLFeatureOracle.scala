package graft.queries

/** DuckDB twin of graft.ml.FeatureEngineering over the shared bars CTE —
  * generated programmatically so the lag/rolling column families cannot
  * drift from the Spark side by typo. Validates the entire windowed
  * feature pipeline (27 columns) cell-exactly.
  *
  * Rounding contract: indicator columns (rsi/atr/bb/volatility) are
  * 4dp-rounded inside the library on both sides; the remaining raw
  * window outputs are rounded to 6dp AT THE QUERY BOUNDARY on both
  * sides (window-aggregate implementations legitimately differ in final
  * ulps between engines).
  */
object MLFeatureOracle {

  /** feature columns that need query-boundary 6dp rounding (everything
    * the library leaves unrounded). */
  val roundedCols: Seq[String] =
    Seq("price_change_1", "price_change_3", "price_change_5",
      "volume_ratio") ++
      (1 to 3).map(k => s"volume_ratio_lag_$k") ++
      Seq(3, 5, 10, 20).flatMap(w => Seq(s"close_ma_$w", s"close_std_$w"))

  val sql: String = {
    val lagsVol = (1 to 3).map(k =>
      s"lag(volatility, $k) OVER w AS volatility_lag_$k").mkString(",\n    ")
    val pcts = Seq(1, 3, 5).map(k =>
      s"(close - lag(close, $k) OVER w) / nullif(lag(close, $k) OVER w, 0)" +
        s" * 100 AS price_change_$k").mkString(",\n    ")
    val mas = Seq(3, 5, 10, 20).map(w =>
      s"avg(close) OVER f$w AS close_ma_$w").mkString(",\n    ")
    val stds = Seq(3, 5, 10, 20).map(w =>
      s"stddev_samp(close) OVER f$w AS close_std_$w").mkString(",\n    ")
    val frames = Seq(3, 5, 10, 20).map(w =>
      s"f$w AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN " +
        s"${w - 1} PRECEDING AND CURRENT ROW)").mkString(",\n    ")
    val lagsVr = (1 to 3).map(k =>
      s"lag(volume_ratio, $k) OVER w AS volume_ratio_lag_$k")
      .mkString(",\n    ")
    val topics = Seq("click", "error", "purchase", "signup", "view").map(v =>
      s"CASE WHEN sentiment = '$v' THEN 1.0 ELSE 0.0 END AS topic_$v")
      .mkString(",\n    ")
    val features = graft.ml.FeatureEngineering.featureColumns
    val outCols = features.map {
      case c if roundedCols.contains(c) => s"round($c, 6) AS $c"
      case c => c
    }.mkString(",\n  ")
    val notNulls = features.map(c => s"$c IS NOT NULL")
      .mkString("\n   AND ")

    s"""WITH raw AS (
       |  SELECT user_id, CAST(ts AS DATE) AS date, value, event_id,
       |         event_type
       |  FROM events),
       |bars AS (
       |  SELECT user_id, date,
       |         round(max(value),4) AS high,
       |         round(min(value),4) AS low,
       |         round(min(CASE WHEN rn_d = 1 THEN value END),4) AS close,
       |         count(*) AS volume
       |  FROM (SELECT *,
       |          row_number() OVER (PARTITION BY user_id, date
       |                             ORDER BY event_id DESC) AS rn_d
       |        FROM raw) t
       |  GROUP BY 1, 2),
       |sent AS (
       |  SELECT user_id, date, lower(event_type) AS sentiment
       |  FROM (SELECT user_id, date, event_type, count(*) AS n,
       |          row_number() OVER (PARTITION BY user_id, date
       |            ORDER BY count(*) DESC, event_type) AS rn
       |        FROM raw GROUP BY 1, 2, 3) t
       |  WHERE rn = 1),
       |f AS (
       |  SELECT b.*, s.sentiment,
       |    round((high - low) / nullif(close, 0) * 100, 4) AS volatility
       |  FROM bars b LEFT JOIN sent s USING (user_id, date)),
       |w1 AS (
       |  SELECT *,
       |    $pcts,
       |    close - lag(close, 1) OVER w AS delta,
       |    $lagsVol,
       |    avg(volume) OVER f20 AS volume_ma_20,
       |    $mas,
       |    $stds,
       |    lead(volatility, 1) OVER w AS next_volatility,
       |    greatest(high - low, abs(high - lag(close) OVER w),
       |             abs(low - lag(close) OVER w)) AS tr
       |  FROM f
       |  WINDOW w AS (PARTITION BY user_id ORDER BY date),
       |    $frames),
       |w2 AS (
       |  SELECT *,
       |    volume / nullif(volume_ma_20, 0) AS volume_ratio,
       |    CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
       |    CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss
       |  FROM w1),
       |w3 AS (
       |  SELECT *,
       |    $lagsVr,
       |    CASE WHEN count(gain) OVER f14 >= 14
       |         THEN avg(gain) OVER f14 END AS ag,
       |    CASE WHEN count(loss) OVER f14 >= 14
       |         THEN avg(loss) OVER f14 END AS al,
       |    CASE WHEN count(tr) OVER f14 >= 14
       |         THEN avg(tr) OVER f14 END AS atr_raw,
       |    CASE WHEN count(close) OVER f20b >= 20
       |         THEN avg(close) OVER f20b END AS sma20,
       |    CASE WHEN count(close) OVER f20b >= 20
       |         THEN stddev_samp(close) OVER f20b END AS sd20
       |  FROM w2
       |  WINDOW w AS (PARTITION BY user_id ORDER BY date),
       |    f14 AS (PARTITION BY user_id ORDER BY date
       |            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
       |    f20b AS (PARTITION BY user_id ORDER BY date
       |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
       |feat AS (
       |  SELECT *,
       |    round(CASE WHEN al = 0 THEN 100.0
       |               ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 4)
       |      AS rsi_14,
       |    round(atr_raw, 4) AS atr_14,
       |    round(4.0 * sd20 / nullif(sma20, 0) * 100, 4) AS bb_width_20,
       |    CAST((dayofweek(date) + 6) % 7 AS DOUBLE) AS day_of_week,
       |    CAST(month(date) AS DOUBLE) AS month,
       |    CASE WHEN sentiment = 'purchase' THEN 1.0
       |         WHEN sentiment = 'error' THEN -1.0
       |         ELSE 0.0 END AS sentiment_score,
       |    $topics,
       |    CASE WHEN next_volatility IS NULL THEN NULL
       |         WHEN next_volatility <= 2 THEN 'low'
       |         WHEN next_volatility <= 5 THEN 'medium'
       |         ELSE 'high' END AS target_class
       |  FROM w3)
       |SELECT user_id, strftime(date, '%Y-%m-%d') AS date,
       |  CASE target_class WHEN 'low' THEN 0.0 WHEN 'medium' THEN 1.0
       |       WHEN 'high' THEN 2.0 END AS label,
       |  target_class,
       |  $outCols
       |FROM feat
       |WHERE target_class IS NOT NULL
       |   AND $notNulls
       |ORDER BY 1, 2""".stripMargin
  }
}
