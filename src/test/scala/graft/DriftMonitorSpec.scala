package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.DriftMonitor

/** Streaming PSI monitor: reference fit, watermarked windowed bin
  * counts over a real file stream, and the exact-zero fixed point. */
class DriftMonitorSpec extends SparkSuite {
  import spark.implicits._

  // 10 scores per decile bin: 0.05, 0.15, …, 0.95 × 10 each
  private val refScores =
    (0 until 100).map(i => (i % 10) / 10.0 + 0.05)

  test("a window distributed exactly like the reference reads PSI 0; " +
    "a tail-collapsed window reads large PSI — end-to-end through a " +
    "file stream") {
    val ref = DriftMonitor.fitReference(
      refScores.toDF("score"), "score", bins = 10)
    assert(ref.counts.values.toSeq.distinct == Seq(10L))
    val srcDir = Files.createTempDirectory("graft_drift_src")
    def drop(name: String, day: String, scores: Seq[Double]): Unit = {
      val tmp = Files.createTempDirectory("graft_drift_tmp").toString
      scores.map(s => (java.sql.Timestamp.valueOf(s"$day 12:00:00"), s))
        .toDF("ts", "score").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, srcDir.resolve(name))
    }
    drop("day1.parquet", "2024-06-01", refScores)
    drop("day2.parquet", "2024-06-02", Seq.fill(100)(0.95))
    val stream = spark.readStream
      .schema("ts TIMESTAMP, score DOUBLE")
      .parquet(srcDir.toString)
    val cp = Files.createTempDirectory("graft_drift_cp").toString
    val q = DriftMonitor.windowedBinCounts(stream, ref)
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val counts = spark.table("drift_counts")
    val psi = DriftMonitor.psiPerWindow(counts, ref)
      .orderBy("window_start")
      .select(date_format(col("window_start"), "yyyy-MM-dd"),
        col("n_scored"), col("psi"))
      .as[(String, Long, Double)].collect().toSeq
    assert(psi.map(_._1) == Seq("2024-06-01", "2024-06-02"))
    assert(psi.forall(_._2 == 100L))
    // identical distribution → identical smoothed proportions → 0
    assert(psi.head._3 == 0.0)
    // all mass in bin 9 → severe drift (rule of thumb: > 0.25 acts)
    assert(psi(1)._3 > 1.0, s"day-2 psi ${psi(1)._3}")
  }

  test("out-of-reference stream values clamp into the edge bins " +
    "instead of vanishing") {
    val ref = DriftMonitor.fitReference(
      refScores.toDF("score"), "score", bins = 10)
    val srcDir = Files.createTempDirectory("graft_drift_src2")
    val tmp = Files.createTempDirectory("graft_drift_tmp2").toString
    Seq((java.sql.Timestamp.valueOf("2024-06-01 12:00:00"), -99.0),
        (java.sql.Timestamp.valueOf("2024-06-01 12:00:00"), 99.0))
      .toDF("ts", "score").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, srcDir.resolve("wild.parquet"))
    val stream = spark.readStream
      .schema("ts TIMESTAMP, score DOUBLE")
      .parquet(srcDir.toString)
    val cp = Files.createTempDirectory("graft_drift_cp2").toString
    val q = DriftMonitor.windowedBinCounts(stream, ref)
      .writeStream.format("memory").queryName("drift_clamp")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val bins = spark.table("drift_clamp")
      .select("bin").as[Long].collect().toSet
    assert(bins == Set(0L, 9L))
  }
}
