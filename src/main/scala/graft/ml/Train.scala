package graft.ml

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volatility-class trainer (reference: ml/train.py:62-167).
  *
  * The reference's primary models are XGBoost and sklearn RandomForest;
  * vanilla MLlib has no XGBoost, so RandomForest (the reference's own M4
  * config: 200 trees, depth 10, minInstancesPerNode 4, seed 42) is the
  * parity model — capability parity is "tree-ensemble multiclass
  * classifier" (SURVEY §7.4). Balanced sample weights reproduce
  * sklearn's compute_sample_weight('balanced') (train.py:89-91) as a
  * groupBy-count + broadcast-join — set-oriented, no driver loop.
  */
object Train {

  case class Result(model: RandomForestClassificationModel,
                    metrics: Map[String, Double],
                    confusion: DataFrame,
                    importances: Seq[(String, Double)])

  def assembler: VectorAssembler = new VectorAssembler()
    .setInputCols(FeatureEngineering.featureColumns.toArray)
    .setOutputCol("features")
    .setHandleInvalid("skip")

  /** n_samples / (n_classes * count_c) per class (A19/M5). */
  def withBalancedWeights(df: DataFrame): DataFrame = {
    val counts = df.groupBy(col("label")).agg(count(lit(1)).as("_class_n"))
    val total = df.count()
    val nClasses = counts.count()
    df.join(broadcast(counts), Seq("label"))
      .withColumn("weight",
        lit(total.toDouble) / (lit(nClasses.toDouble) * col("_class_n")))
      .drop("_class_n")
  }

  def fit(train: DataFrame, numTrees: Int = 200, maxDepth: Int = 10,
          seed: Long = 42L): (RandomForestClassificationModel, DataFrame) = {
    val weighted = withBalancedWeights(train)
    val assembled = assembler.transform(weighted)
    val rf = new RandomForestClassifier()
      .setNumTrees(numTrees)
      .setMaxDepth(maxDepth)
      .setMinInstancesPerNode(4)
      .setSeed(seed)
      .setLabelCol("label")
      .setFeaturesCol("features")
      .setWeightCol("weight")
    (rf.fit(assembled), assembled)
  }

  /** M7 metric set: accuracy, F1, weighted precision/recall. */
  def evaluate(model: RandomForestClassificationModel,
               test: DataFrame): Result = {
    val predictions = model.transform(assembler.transform(test)).cache()
    val ev = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    val metrics = Seq("accuracy", "f1", "weightedPrecision",
      "weightedRecall").map(m =>
      m -> ev.setMetricName(m).evaluate(predictions)).toMap
    val confusion = predictions
      .groupBy(FeatureEngineering.classOf(col("prediction"))
          .as("predicted_class"),
        FeatureEngineering.classOf(col("label")).as("actual_class"))
      .agg(count(lit(1)).as("n"))
    val importances = FeatureEngineering.featureColumns
      .zip(model.featureImportances.toArray)
      .sortBy(-_._2)
    Result(model, metrics, confusion, importances)
  }
}
