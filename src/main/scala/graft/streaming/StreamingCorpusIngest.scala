package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.jobs.IncrementalIngestJob

/** Structured Streaming framing of the incremental corpus ingest: an
  * `availableNow` file stream over a documents drop directory, with
  * each micro-batch running the [[IncrementalIngestJob]] ladder
  * against persisted state via foreachBatch (the same reasoning as
  * [[StreamingIngest]]: the contract is a set operation against
  * persisted state, not an event-time window).
  *
  * Idempotency under at-least-once foreachBatch: state is persisted
  * as PER-BATCH SNAPSHOTS (`stateDir/after_<id>`), and batch N always
  * loads the latest snapshot with id < N — so a REPLAYED batch reloads
  * the exact state it saw the first time and rewrites identical
  * survivors/state (write-by-batch-id overwrite, the
  * [[StreamingIngest.ingestDailyBars]] discipline). Folding survivors
  * into one running state dir instead would lose the replayed batch's
  * rows: after the state absorbed them, a replay would dedup them all
  * away and overwrite the partition with nothing. Batch 0 clears the
  * target and state dirs — a fresh checkpoint means "reprocess from
  * scratch". At warehouse scale a periodic compaction folds old
  * snapshots (state frames are append-only unions of survivors).
  */
object StreamingCorpusIngest {

  /** File-stream read of a documents drop dir (schema derived from a
    * batch read, the [[StreamingIngest.readEvents]] discipline minus
    * the timestamp normalization documents don't need). */
  def readDocs(spark: SparkSession, sourceDir: String,
               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    reader.parquet(sourceDir)
  }

  private def bootstrapState(spark: SparkSession): IncrementalIngestJob.State = {
    import spark.implicits._
    IncrementalIngestJob.State(
      Seq.empty[String].toDF("fingerprint"),
      graft.operators.Dedup.minhashSignatures(
        Seq.empty[(Long, String)].toDF("doc_id", "text")))
  }

  /** Latest persisted snapshot strictly before `batchId`, if any. */
  private def latestStateBefore(spark: SparkSession, stateDir: String,
                                batchId: Long): Option[IncrementalIngestJob.State] = {
    val dirs = Option(new java.io.File(stateDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("after_"))
      .map(_.getName.stripPrefix("after_").toLong)
      .filter(_ < batchId)
    if (dirs.isEmpty) None
    else Some(IncrementalIngestJob.loadState(spark,
      s"$stateDir/after_${dirs.max}"))
  }

  /** Start the ingest: survivors land in `targetDir/batch_id=<id>`,
    * state snapshots in `stateDir/after_<id>`. */
  def ingest(spark: SparkSession, sourceDir: String, targetDir: String,
             stateDir: String, checkpointDir: String,
             evalSet: DataFrame,
             cfg: IncrementalIngestJob.Config = IncrementalIngestJob.Config(),
             maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readDocs(spark, sourceDir, maxFilesPerTrigger).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) {
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(targetDir))
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(stateDir))
        }
        val prev = latestStateBefore(spark, stateDir, batchId)
          .getOrElse(bootstrapState(spark))
        val (survivors, next, _) =
          IncrementalIngestJob.run(prev, batch, evalSet, cfg)
        survivors.write.mode("overwrite")
          .parquet(s"$targetDir/batch_id=$batchId")
        IncrementalIngestJob.saveState(next, s"$stateDir/after_$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The ingested corpus so far: union of all batch partitions. */
  def readCorpus(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir)
      .drop("batch_id")
}
