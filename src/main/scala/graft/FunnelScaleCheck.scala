package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextClean, TextFns}
import graft.jobs.IncrementalIngestJob
import graft.operators.{Dedup, SemDedup}

/** Dev main: END-TO-END wall time for the COMPOSED IncrementalIngestJob
  * ladder with ALL stages live (quality → decontaminate → exact →
  * MinHash → SimHash → semantic), probe-vs-rebuild — the composition's
  * own scale row, where [[ScaleCheck]] carries only the per-stage
  * contrast rows (incremental_lsh_dedup, incremental_simhash_dedup,
  * incremental_semdedup vs their rebuild twins).
  *
  * Layout mirrors the q356/q361/q362 gate split at scale: the persisted
  * state is the INFLATED corpus side (doc_id % 5 ≠ 0, text prepped the
  * way a prior rebuild would have), the arriving batch is the raw-SF
  * % 5 = 0 slice. The probe leg runs the ladder against that state
  * (every stage batch-sized work against scanned-once side tables); the
  * rebuild leg runs the SAME ladder with EMPTY state over state∪batch —
  * what a pipeline without incremental maintenance must do per arrival.
  *
  *   SPARK_GRAFT_SCALE=32 sbt 'runMain graft.FunnelScaleCheck'
  */
object FunnelScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def inflate(df: DataFrame, keyCol: String, m: Int): DataFrame =
      df.crossJoin(spark.range(m).select(col("id").as("_copy")))
        .withColumn(keyCol, col(keyCol) + col("_copy") * 1000000L)
        .select(df.columns.map(col).toIndexedSeq: _*)

    def time[T](name: String, rows: Long)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-28s ${rows}%12d rows  $dt%7.2f s  " +
        f"${rows / dt / 1e6}%6.2f M rows/s")
    }

    val rawDocs = Tables.documents(spark, sfDir)
    val rawEmb = Tables.embeddings(spark, sfDir)
    val batch = rawDocs.filter(col("doc_id") % 5 === 0).cache()
    val nBatch = batch.count()
    val evalSet = rawDocs.filter(col("doc_id") < 50)
    val batchEmb = rawEmb.filter(col("vec_id") % 5 === 0)
    val cfg = IncrementalIngestJob.Config(semDedupTau = 0.4)

    // the persisted state: inflated corpus side, text prepped as a
    // prior rebuild would have left it. PERSIST the side tables to
    // parquet (saveState) and probe the LOADED state — the production
    // cost model (the streaming wrapper persists per-batch snapshots;
    // a probe scans narrow parquet side tables, it never recomputes
    // the corpus's prep/hash chain). The save itself is its own timed
    // row: the one-time corpus-sized cost the probe amortizes.
    val stateDocs = inflate(rawDocs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", mult)
      .withColumn("text",
        TextClean.scrub(TextClean.canonicalizeClasses(col("text"))))
    val nState = stateDocs.count()
    val stateEmb = inflate(rawEmb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", mult)
    val cs = SemDedup.seedCentroids(stateEmb, 64)
    val keptEmb = SemDedup.assign(stateEmb, cs)
      .select(col("vec_id"), col("vec").as("embedding"), col("cluster"))
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_funnel_state").toString
    time("funnel_state_build_save", nState) {
      IncrementalIngestJob.saveState(IncrementalIngestJob.State(
        stateDocs.select(TextFns.fingerprint(col("text"))
          .as("fingerprint")),
        Dedup.minhashSignatures(stateDocs, k = cfg.minhashK,
          n = cfg.shingleN),
        Some(cs), Some(keptEmb),
        Some(stateDocs.select(col("doc_id"),
          TextFns.simhash64(col("text")).as("simhash")))), stateDir)
    }
    val state = IncrementalIngestJob.loadState(spark, stateDir)

    time("funnel_probe_all_stages", nState) {
      val (surv, _, ledger) = IncrementalIngestJob.run(state, batch,
        evalSet, cfg, Some(batchEmb))
      surv.write.format("noop").mode("overwrite").save()
      surv.unpersist()
      println(s"[scale]   probe ledger: ${ledger.mkString(" -> ")}")
    }

    // the equivalent rebuild: EMPTY state, the whole state∪batch corpus
    // as one arrival — run()'s within-batch paths (fingerprint window,
    // LSH groups, hamming groups, batch domination) do corpus-sized
    // work instead of batch-sized. Same config, same stages live.
    val emptyState = IncrementalIngestJob.State(
      Seq.empty[String].toDF("fingerprint"),
      Dedup.minhashSignatures(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        k = cfg.minhashK, n = cfg.shingleN),
      Some(cs),
      Some(keptEmb.limit(0)),
      Some(Seq.empty[(Long, Long)].toDF("doc_id", "simhash")))
    val allDocs = inflate(rawDocs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", mult)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(batch.select(col("doc_id"), col("text"), col("lang"),
        col("source")))
    val allEmb = stateEmb.unionByName(batchEmb)
    time("funnel_rebuild_all_stages", nState + nBatch) {
      val (surv, _, ledger) = IncrementalIngestJob.run(emptyState,
        allDocs, evalSet, cfg, Some(allEmb))
      surv.write.format("noop").mode("overwrite").save()
      surv.unpersist()
      println(s"[scale]   rebuild ledger: ${ledger.mkString(" -> ")}")
    }

    batch.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(stateDir))
    spark.stop()
  }
}
