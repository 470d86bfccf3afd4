package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingTopK

/** Streaming windowed heavy hitters: end-to-end through a real file
  * stream, per-window counts and deterministic top-k ranks. */
class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  test("per-window top-3 event types rank by exact counts with " +
    "deterministic ties, across two event-time windows") {
    val srcDir = Files.createTempDirectory("graft_topk_src")
    def drop(name: String, day: String,
             typed: Seq[(String, Int)]): Unit = {
      val tmp = Files.createTempDirectory("graft_topk_tmp").toString
      typed.flatMap { case (t, n) => Seq.fill(n)(t) }
        .map(t => (java.sql.Timestamp.valueOf(s"$day 10:00:00"), t))
        .toDF("ts", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, srcDir.resolve(name))
    }
    // day 1: click 5, view 3, signup 2, purchase 1
    drop("d1.parquet", "2024-06-01",
      Seq("click" -> 5, "view" -> 3, "signup" -> 2, "purchase" -> 1))
    // day 2: tie between purchase and view (4 each) → key asc order
    drop("d2.parquet", "2024-06-02",
      Seq("purchase" -> 4, "view" -> 4, "click" -> 1))
    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING")
      .parquet(srcDir.toString)
    val cp = Files.createTempDirectory("graft_topk_cp").toString
    val q = StreamingTopK.windowedKeyCounts(stream)
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val top = StreamingTopK.topKPerWindow(
        spark.table("topk_counts"), 3)
      .orderBy("window_start", "rank")
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("window_start"),
        "yyyy-MM-dd"),
        org.apache.spark.sql.functions.col("rank"),
        org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.col("n"))
      .as[(String, Long, String, Long)].collect().toSeq
    assert(top == Seq(
      ("2024-06-01", 1L, "click", 5L),
      ("2024-06-01", 2L, "view", 3L),
      ("2024-06-01", 3L, "signup", 2L),
      ("2024-06-02", 1L, "purchase", 4L),
      ("2024-06-02", 2L, "view", 4L),
      ("2024-06-02", 3L, "click", 1L)))
  }

  test("the stateful stage matches a batch groupBy on the same data") {
    val batch = Seq(
      ("2024-06-01 09:00:00", "a"), ("2024-06-01 10:00:00", "a"),
      ("2024-06-01 11:00:00", "b"), ("2024-06-02 09:00:00", "b"))
      .map { case (ts, t) => (java.sql.Timestamp.valueOf(ts), t) }
      .toDF("ts", "event_type")
    // batch semantics of the same expression tree
    val counts = batch.groupBy(
        org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 day").as("win"),
        org.apache.spark.sql.functions.col("event_type").as("key"))
      .count().withColumnRenamed("count", "n")
    val top = StreamingTopK.topKPerWindow(counts, 1)
      .orderBy("window_start")
      .select("key", "n").as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 2L), ("b", 1L)))
  }
}
