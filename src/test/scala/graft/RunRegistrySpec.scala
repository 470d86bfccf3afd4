package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ml.RunRegistry

/** Run registry semantics (reference ml/mlflow_utils.py:175-198):
  * append-only long-format metric rows; best-run search total-ordered by
  * (value, created_at desc, run_id). */
class RunRegistrySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append accumulates runs; bestRun picks max value, newest run on " +
    "value ties, and minimize mode flips the ordering") {
    val dir = Files.createTempDirectory("graft_runs").toString + "/runs"
    RunRegistry.append(spark, dir, "run_a", "rf", ts("2024-01-01 10:00:00"),
      Map("accuracy" -> 0.71, "f1Macro" -> 0.60))
    RunRegistry.append(spark, dir, "run_b", "gbt", ts("2024-02-01 10:00:00"),
      Map("accuracy" -> 0.74, "f1Macro" -> 0.60))
    RunRegistry.append(spark, dir, "run_c", "rf", ts("2024-03-01 10:00:00"),
      Map("accuracy" -> 0.74))
    val runs = RunRegistry.runs(spark, dir)
    assert(runs.count() == 5)

    // accuracy: b and c tie at 0.74 — newest (c) wins
    val best = RunRegistry.bestRun(runs, "accuracy").head()
    assert(best.getString(0) == "run_c" && best.getDouble(3) == 0.74)
    // f1Macro: a and b tie — newest (b) wins
    assert(RunRegistry.bestRun(runs, "f1Macro").head().getString(0)
      == "run_b")
    // minimize: lowest accuracy is run_a
    assert(RunRegistry.bestRun(runs, "accuracy", maximize = false)
      .head().getString(0) == "run_a")
    // unknown metric → empty, not error
    assert(RunRegistry.bestRun(runs, "nope").isEmpty)
  }

  test("leaderboard ranks every run within its metric; rank 1 agrees " +
    "with bestRun") {
    val runs = Seq(
      ("a", "rf", ts("2024-01-01 00:00:00"), "acc", 0.5),
      ("b", "rf", ts("2024-01-02 00:00:00"), "acc", 0.9),
      ("c", "rf", ts("2024-01-03 00:00:00"), "acc", 0.7),
      ("a", "rf", ts("2024-01-01 00:00:00"), "loss", 1.0))
      .toDF("run_id", "model_type", "created_at", "metric", "value")
    val lb = RunRegistry.leaderboard(runs)
    assert(lb.filter(col("metric") === "acc" && col("rank") === 1)
      .head().getString(0) == "b")
    assert(lb.filter(col("metric") === "acc").count() == 3)
    assert(lb.filter(col("metric") === "loss").count() == 1)
    val bestAcc = RunRegistry.bestRun(runs, "acc").head().getString(0)
    assert(bestAcc == "b")
  }
}
