package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.operators.Writes

/** Streaming CDC: fold a change-feed file stream into a compacted
  * parquet state via foreachBatch + [[Writes.cdcCompact]].
  *
  * Correctness rests on two properties: the fold keeps max-seq per key
  * with tombstones (so batch boundaries are invisible — a stale update
  * in a later micro-batch loses to the stored tombstone), and it is
  * idempotent (re-folding a replayed batch changes nothing), which is
  * what at-least-once foreachBatch delivery requires. The target write
  * uses the stage-then-swap pattern: the next state is fully
  * materialized to a temp dir BEFORE the old dir is retired, so no
  * lazy plan ever reads a directory it is replacing.
  */
object StreamingCdc {

  def applyStream(spark: SparkSession, sourceDir: String,
                  targetDir: String, checkpointDir: String,
                  keys: Seq[String], schema: StructType,
                  maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    reader.parquet(sourceDir).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // repair a crashed prior swap FIRST: a missing target dir must
        // restore the retired copy (or promote a completed stage), not
        // silently refold from empty — that would drop every key the
        // replayed batch doesn't mention
        val hasState = graft.operators.StagedSwap.recover(targetDir)
        val state =
          if (hasState) spark.read.parquet(targetDir)
          else batch.limit(0)
        graft.operators.StagedSwap.write(
          Writes.cdcCompact(state, batch, keys), targetDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The live (non-tombstone) rows of a streamed CDC target. */
  def readTable(spark: SparkSession, targetDir: String): DataFrame =
    Writes.cdcLiveView(spark.read.parquet(targetDir))
}
