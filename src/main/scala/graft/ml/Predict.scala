package graft.ml

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Indicators, WindowFns}

/** Next-day inference (reference: ml/predict.py:83-157).
  *
  * Takes the latest row per key (A16, single hash-agg), scores it,
  * decodes the class label, derives confidence = max class probability
  * (M9, via vector_to_array + array_max — no UDF), and stamps the next
  * trading day (F-NBD). The per-class probabilities are exposed like
  * predict.py's prob_low/medium/high columns. */
object Predict {

  def apply(model: RandomForestClassificationModel, features: DataFrame,
            modelVersion: String): DataFrame = {
    val latest = WindowFns.latestPerKey(features, Seq("user_id"),
      col("date"))
    val scored = model.transform(Train.assembler.transform(latest))
    val probs = vector_to_array(col("probability"))
    scored.select(
      col("user_id"),
      col("date").as("as_of_date"),
      Indicators.nextTradingDay(col("date")).as("prediction_date"),
      FeatureEngineering.classOf(col("prediction"))
        .as("predicted_class"),
      round(array_max(probs), 4).as("confidence"),
      round(probs.getItem(0), 4).as("prob_low"),
      round(probs.getItem(1), 4).as("prob_medium"),
      round(probs.getItem(2), 4).as("prob_high"),
      lit(modelVersion).as("model_version"))
  }

  /** Same output contract for classifiers that expose no calibrated
    * probability vector (the one-vs-rest GBT mapping of the reference's
    * xgboost choice): confidence and per-class probabilities are
    * explicitly null rather than fabricated. */
  def withoutProbabilities(model: org.apache.spark.ml.Transformer,
                           features: DataFrame,
                           modelVersion: String): DataFrame = {
    val latest = WindowFns.latestPerKey(features, Seq("user_id"),
      col("date"))
    val scored = model.transform(Train.assembler.transform(latest))
    val nullProb = lit(null).cast("double")
    scored.select(
      col("user_id"),
      col("date").as("as_of_date"),
      Indicators.nextTradingDay(col("date")).as("prediction_date"),
      FeatureEngineering.classOf(col("prediction"))
        .as("predicted_class"),
      nullProb.as("confidence"),
      nullProb.as("prob_low"),
      nullProb.as("prob_medium"),
      nullProb.as("prob_high"),
      lit(modelVersion).as("model_version"))
  }
}
