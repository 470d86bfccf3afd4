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

  test("native session_window sessions match the custom batch " +
    "sessionizer's (user, n_events) multiset end-to-end") {
    import org.apache.spark.sql.functions.col
    val srcDir = Files.createTempDirectory("graft_sw_src")
    val tmp = Files.createTempDirectory("graft_sw_tmp").toString
    // user 1: two sessions (gap > 30 min); user 2: one session
    val rows = Seq(
      (1L, "2024-06-01 10:00:00"), (1L, "2024-06-01 10:10:00"),
      (1L, "2024-06-01 11:30:00"),
      (2L, "2024-06-01 09:00:00"), (2L, "2024-06-01 09:20:00"),
      (2L, "2024-06-01 09:40:00"))
      .map { case (u, t) => (u, java.sql.Timestamp.valueOf(t), u) }
    rows.toDF("user_id", "ts", "event_id").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, srcDir.resolve("d.parquet"))
    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
      .parquet(srcDir.toString)
    val cp = Files.createTempDirectory("graft_sw_cp").toString
    val q = graft.streaming.StreamingTopK
      .sessionWindowCounts(stream, "30 minutes")
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sw_sessions")
      .select("key", "n_events")
      .as[(Long, Long)].collect().sorted.toSeq
    // custom batch sessionizer on the same rows
    val batch = rows.toDF("user_id", "ts", "event_id")
      .withColumn("value", col("event_id").cast("double"))
    val want = graft.operators.EventSeries.sessions(batch, 30)
      .select(col("user_id"), col("n_events").cast("long"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == want && got == Seq((1L, 1L), (1L, 2L), (2L, 3L)))
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
