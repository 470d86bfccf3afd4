package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.jobs.IncrementalIngestJob
import graft.streaming.StreamingCorpusIngest

/** Dev main: per-micro-batch latency + end-to-end throughput for
  * [[StreamingCorpusIngest]] — the streaming framing of the funnel
  * whose batch-job curve lives in SCALECHECK_funnel_r12.json. Splits
  * the SF's documents table into `SPARK_GRAFT_BATCHES` drop files,
  * ingests them availableNow at one file per trigger (all stages
  * live: SimHash on), and reports each batch's triggerExecution from
  * the engine's own progress events plus the wall-clock total.
  *
  * What to expect (r13, delta snapshots): per-batch time = the
  * funnel's fixed per-batch cost plus an O(batch) delta write — flat
  * across batches except the periodic compaction batch, which also
  * writes the full folded state. (Pre-r13, every batch rewrote the
  * FULL accumulated state and later batches paid a growing write
  * share: 8-11 s/batch at sf0.1×8.)
  *
  *   SPARK_GRAFT_BATCHES=8 sbt 'runMain graft.StreamingThroughput'
  */
object StreamingThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_tp").toString
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    // one drop file per micro-batch, round-robin by doc_id so every
    // batch carries a comparable slice
    (0 until nBatches).foreach { b =>
      docs.filter(col("doc_id") % nBatches === b)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$work/source/drop_$b")
    }
    // flatten: the file stream watches one dir of parquet files
    val src = s"$work/src_flat"
    new java.io.File(src).mkdirs()
    var i = 0
    (0 until nBatches).foreach { b =>
      val dir = new java.io.File(s"$work/source/drop_$b")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$src/part_$i.parquet"))
        i += 1
      }
    }
    val evalSet = docs.filter(col("doc_id") < 50)
    val cfg = IncrementalIngestJob.Config()

    val batchSecs = scala.collection.mutable.ListBuffer.empty[Double]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ms = Option(e.progress.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        if (e.progress.numInputRows > 0) {
          batchSecs += ms / 1000.0
          println(f"[stream] batch ${e.progress.batchId}%2d  " +
            f"${e.progress.numInputRows}%6d docs in  ${ms / 1000.0}%6.2f s")
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val t0 = System.nanoTime()
    val q = StreamingCorpusIngest.ingest(spark, src,
      s"$work/target", s"$work/state", s"$work/ckpt", evalSet, cfg,
      maxFilesPerTrigger = Some(1), withSimhash = true)
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are async — drain before reporting
    Thread.sleep(2000)
    val kept = StreamingCorpusIngest.readCorpus(spark, s"$work/target")
      .count()
    println(f"[stream] TOTAL $nDocs docs / $nBatches batches in " +
      f"$wall%7.2f s = ${nDocs / wall}%6.1f docs/s ingested " +
      f"($kept survivors); per-batch " +
      batchSecs.map(s => f"$s%.1f").mkString("[", ", ", "] s"))

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
