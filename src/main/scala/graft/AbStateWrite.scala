package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextClean, TextFns}
import graft.jobs.IncrementalIngestJob
import graft.operators.Dedup

/** Scratch A/B for the r13 streaming-state layout: the OLD layout
  * rewrote the FULL accumulated state every micro-batch; the NEW
  * layout writes only the batch's delta. This main times exactly that
  * write (from LOADED parquet state, no kernel recompute — the shape
  * a batch-N snapshot write has) as the state grows, vs the
  * batch-sized delta write. SPARK_GRAFT_STATE_MULTS picks the state
  * inflations (default "8,32,128" ≈ 128k…2.05M state docs).
  */
object AbStateWrite {
  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SPARK_GRAFT_STATE_MULTS", "8,32,128")
      .split(",").toSeq.map(_.trim.toInt)
    import spark.implicits._
    val rawDocs = Tables.documents(spark, sfDir)
    val cfg = IncrementalIngestJob.Config()
    val batch = rawDocs.filter(col("doc_id") % 5 === 0)
      .withColumn("text",
        TextClean.scrub(TextClean.canonicalizeClasses(col("text"))))
      .cache()
    val nBatch = batch.count()

    def inflate(m: Int) = rawDocs.filter(col("doc_id") % 5 =!= 0)
      .crossJoin(spark.range(m).select(col("id").as("_copy")))
      .withColumn("doc_id", col("doc_id") + col("_copy") * 1000000L)
      .withColumn("text",
        TextClean.scrub(TextClean.canonicalizeClasses(col("text"))))
      .select(col("doc_id"), col("text"))

    mults.foreach { m =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_absw_$m").toString
      val docs = inflate(m)
      IncrementalIngestJob.saveState(IncrementalIngestJob.State(
        docs.select(TextFns.fingerprint(col("text")).as("fingerprint")),
        Dedup.minhashSignatures(docs, k = cfg.minhashK,
          n = cfg.shingleN),
        simhashPrints = Some(docs.select(col("doc_id"),
          TextFns.simhash64(col("text")).as("simhash")))), dir)
      val state = IncrementalIngestJob.loadState(spark, dir)
      val nState = state.fingerprints.count()
      def best3(f: () => Unit): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f(); (System.nanoTime() - t0) / 1e9
        }.min
      // OLD per-batch write: the full accumulated state (state ∪ batch
      // contribution), exactly what saveState(next) wrote each batch
      val delta = IncrementalIngestJob.stateContribution(state, batch,
        cfg)
      val full = IncrementalIngestJob.State(
        state.fingerprints.unionByName(delta.fingerprints),
        state.sigIndex.unionByName(delta.sigIndex),
        simhashPrints = Some(state.simhashPrints.get
          .unionByName(delta.simhashPrints.get)))
      val tFull = best3(() =>
        IncrementalIngestJob.saveState(full, s"$dir/ab_full"))
      val tDelta = best3(() =>
        IncrementalIngestJob.saveState(delta, s"$dir/ab_delta"))
      println(f"[absw] state=$nState%9d docs (mult=$m%3d)  batch=$nBatch  " +
        f"full-write $tFull%7.2f s   delta-write $tDelta%7.2f s")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
    spark.stop()
  }
}
