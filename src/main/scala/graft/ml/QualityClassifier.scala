package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Model-based corpus quality scoring — the fastText-classifier recipe
  * of CCNet (arXiv:1911.00359) and the LLaMA data pipeline: train a
  * LINEAR classifier over hashed token features to separate a
  * reference-quality set (e.g. wiki/books) from random crawl text,
  * then keep crawl documents the model scores "reference-like".
  * Complements the rule-based gates (TextFns.qualityScore heuristics,
  * QualityFilters Gopher rules): rules catch structural garbage, the
  * classifier catches fluent-but-junk content the rules pass.
  *
  * Spark shape, end to end shuffle-light:
  *  - features: whitespace tokens → `HashingTF` (fixed 2^`hashBits`
  *    dims, no vocabulary state — the hashing trick means NOTHING is
  *    collected or broadcast that grows with the corpus) → `IDF`
  *    (one aggregation for document frequencies);
  *  - model: `LogisticRegression` — MLlib's distributed L-BFGS, a few
  *    treeAggregate passes over the training set;
  *  - scoring: model.transform is a pure map (hash + dot product per
  *    row) — linear in the 100 TB corpus, no shuffle, trivially
  *    broadcastable coefficients.
  *
  * Determinism: hashing and IDF are deterministic; L-BFGS on a fixed
  * dataset converges to the unique L2-regularized optimum, so scores
  * are reproducible run to run (spec-pinned). No DuckDB oracle by
  * design — an iterative optimizer is not SQL-replayable; the spec
  * pins separation on planted data instead.
  */
object QualityClassifier {

  case class Model(tf: HashingTF, idf: IDFModel,
                   lr: LogisticRegressionModel)

  private def featurize(docs: DataFrame, tf: HashingTF,
                        textCol: String): DataFrame =
    tf.transform(docs.withColumn("_tokens",
      TextFns.tokens(col(textCol))))

  /** Train on `labeled` (textCol + `label` 1.0 = reference-quality,
    * 0.0 = crawl). */
  def train(labeled: DataFrame, hashBits: Int = 18,
            regParam: Double = 1e-3,
            textCol: String = "text"): Model = {
    val tf = new HashingTF().setInputCol("_tokens")
      .setOutputCol("_tf").setNumFeatures(1 << hashBits)
    val featurized = featurize(labeled, tf, textCol)
    val idf = new IDF().setInputCol("_tf").setOutputCol("_feat")
      .fit(featurized)
    val lr = new LogisticRegression().setFeaturesCol("_feat")
      .setLabelCol("label").setRegParam(regParam).setMaxIter(100)
      .fit(idf.transform(featurized))
    Model(tf, idf, lr)
  }

  /** Score every document: P(reference-like) as `quality_prob`, plus
    * the binary `keep` at `threshold`. Pure map over the corpus. */
  def score(docs: DataFrame, model: Model, threshold: Double = 0.5,
            textCol: String = "text"): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.lr.transform(
        model.idf.transform(featurize(docs, model.tf, textCol)))
      .withColumn("quality_prob",
        round(element_at(vector_to_array(col("probability")), 2), 6))
      .withColumn("keep", col("quality_prob") >= threshold)
      .drop("_tokens", "_tf", "_feat", "rawPrediction", "probability",
        "prediction")
  }
}
