package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{ChronoSplit, FeatureEngineering, Predict, Train}
import graft.operators.EventSeries

/** ML capability surface (SURVEY §2.11 M1-M10): feature engineering,
  * chronological split, tree-ensemble training, next-day inference.
  * Model scoring has no SQL oracle — these are rows-only checked by the
  * driver and invariant-checked by MLSpec. */
object MLQueries {
  type Q = (SparkSession, String) => DataFrame

  private def featureFrame(s: SparkSession, d: String,
                           forPrediction: Boolean): DataFrame = {
    val events = Tables.events(s, d)
    FeatureEngineering(
      EventSeries.dailyBars(events),
      Some(EventSeries.dailySentiment(events)
        .select(col("user_id"), col("date"), col("sentiment"))),
      forPrediction = forPrediction)
  }

  val queries: Map[String, Q] = Map(
    // M1/M2: the engineered feature matrix with next-day labels.
    // Unrounded window outputs get 6dp boundary rounding (matching the
    // generated oracle in MLFeatureOracle) — engines legitimately differ
    // in window-aggregate ulps.
    "q46_ml_features" -> ((s, d) =>
      featureFrame(s, d, forPrediction = false)
        .select((Seq(col("user_id"), iso(col("date")).as("date"),
          col("label"), col("target_class")) ++
          FeatureEngineering.featureColumns.map {
            case c if MLFeatureOracle.roundedCols.contains(c) =>
              round(col(c), 6).as(c)
            case c => col(c)
          }): _*)
        .orderBy(col("user_id"), col("date"))),

    // M3-M10: train on the chronological split, score latest row per key
    "q47_ml_predict" -> ((s, d) => {
      val labeled = featureFrame(s, d, forPrediction = false)
      val (train, _, _) = ChronoSplit(labeled)
      val (model, _) = Train.fit(train, numTrees = 50)
      Predict(model, featureFrame(s, d, forPrediction = true), "rf_v1")
        .withColumn("as_of_date", iso(col("as_of_date")))
        .withColumn("prediction_date", iso(col("prediction_date")))
        .orderBy(col("user_id"))
    }),

    // M7: held-out confusion matrix of the trained model
    "q48_ml_eval" -> ((s, d) => {
      val labeled = featureFrame(s, d, forPrediction = false)
      val (train, _, test) = ChronoSplit(labeled)
      val (model, _) = Train.fit(train, numTrees = 50)
      Train.evaluate(model, test).confusion
        .orderBy(col("predicted_class"), col("actual_class"))
    }))

  val oracle: Map[String, String] =
    Map("q46_ml_features" -> MLFeatureOracle.sql)
}
