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

    // M3-M10: train on the chronological split, score latest row per key.
    // The scored frame is PERSISTED and re-read so the oracle can check
    // the deterministic half of the contract from the same file: the
    // DuckDB twin recomputes as_of_date (max bar date per user),
    // prediction_date (F-NBD next trading day) and model_version from
    // `events` independently, and passes the model's own outputs
    // (predicted_class, confidence, probs) through — so date stamping,
    // latest-per-key selection and row coverage get a real hash gate
    // even though the forest itself is not oracle-matchable.
    "q47_ml_predict" -> ((s, d) => {
      val labeled = featureFrame(s, d, forPrediction = false)
      val (train, _, _) = ChronoSplit(labeled)
      val (model, _) = Train.fit(train, numTrees = 50)
      val preds = Predict(model, featureFrame(s, d, forPrediction = true),
          "rf_v1")
        .withColumn("as_of_date", iso(col("as_of_date")))
        .withColumn("prediction_date", iso(col("prediction_date")))
      preds.write.mode("overwrite").parquet(s"${stageDir(d)}/q47")
      s.read.parquet(s"${stageDir(d)}/q47").orderBy(col("user_id"))
    }),

    // M7: held-out confusion matrix. Row-level (predicted, actual) pairs
    // are persisted; Spark aggregates the RE-READ frame and the oracle
    // aggregates the same parquet — the evaluation algebra (grouping,
    // counting, class decoding already applied) is cross-engine checked.
    "q48_ml_eval" -> ((s, d) => {
      val labeled = featureFrame(s, d, forPrediction = false)
      val (train, _, test) = ChronoSplit(labeled)
      val (model, _) = Train.fit(train, numTrees = 50)
      val rowPreds = model.transform(Train.assembler.transform(test))
        .select(
          FeatureEngineering.classOf(col("prediction"))
            .as("predicted_class"),
          FeatureEngineering.classOf(col("label")).as("actual_class"))
      rowPreds.write.mode("overwrite").parquet(s"${stageDir(d)}/q48")
      s.read.parquet(s"${stageDir(d)}/q48")
        .groupBy(col("predicted_class"), col("actual_class"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("predicted_class"), col("actual_class"))
    }))

  /** Per-(sfDir, process) staging dir for the persisted prediction
    * frames: the oracle SQL (run later, in another process) must find
    * the frames the queries wrote, and CONCURRENT runs — against
    * different fixture dirs OR the same one — must not overwrite each
    * other's stage between Verify and the DuckDB compare (mode is
    * overwrite). The pid component makes the path run-private; the
    * oracle strings carry the [[StageToken]] placeholder, and Verify
    * substitutes this same path when dumping oracle_sql.json (same
    * JVM, so the paths agree by construction).
    *
    * Exit-time cleanup is impossible — the DuckDB replay reads the
    * stage AFTER this JVM exits — so stale stages from dead runs are
    * garbage-collected lazily instead: any sibling stage dir untouched
    * for 24 h is deleted on the next run's first stageDir() call. */
  def stageDir(sfDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val dir = s"/tmp/graft_ml_stage_${digest}_${
      ProcessHandle.current().pid()}"
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_ml_stage_") &&
        f.getPath != dir && f.lastModified < cutoff)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    dir
  }

  val StageToken = "__GRAFT_STAGE__"

  val oracle: Map[String, String] = Map(
    "q46_ml_features" -> MLFeatureOracle.sql,

    // deterministic-column check for q47: dates recomputed from events
    // (max bar date per user; next trading day skips Sat/Sun — DuckDB
    // dayofweek: 0=Sun..6=Sat), constants pinned as literals; model
    // outputs pass through from the persisted frame
    "q47_ml_predict" -> (SeriesQueries.BARS + s"""
       , mx AS (SELECT user_id, max(date) AS d FROM bars GROUP BY 1),
         nx AS (SELECT user_id, d,
                  CASE WHEN dayofweek(d + 1) = 6 THEN d + 3
                       WHEN dayofweek(d + 1) = 0 THEN d + 2
                       ELSE d + 1 END AS pd
                FROM mx)
       SELECT p.user_id, strftime(nx.d, '%Y-%m-%d') AS as_of_date,
              strftime(nx.pd, '%Y-%m-%d') AS prediction_date,
              p.predicted_class, p.confidence, p.prob_low,
              p.prob_medium, p.prob_high, 'rf_v1' AS model_version
       FROM read_parquet('$StageToken/q47/*.parquet') p
       JOIN nx USING (user_id)
       ORDER BY user_id"""),

    "q48_ml_eval" -> s"""
       SELECT predicted_class, actual_class, CAST(count(*) AS BIGINT) AS n
       FROM read_parquet('$StageToken/q48/*.parquet')
       GROUP BY 1, 2 ORDER BY 1, 2""")
}
