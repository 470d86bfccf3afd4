package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextClean, TextFns}
import graft.jobs.IncrementalIngestJob
import graft.operators.{Dedup, SemDedup}

/** Dev main: attributes the funnel probe's FIXED per-batch cost
  * (SCALECHECK_funnel_r12: a flat ~25-30 s across 8k-2.05M state docs)
  * to its stages, via the [[IncrementalIngestJob.stageTimer]] seam.
  * Same layout as [[FunnelScaleCheck]]'s probe leg, default mult 2
  * (the smallest curve point — at that size the cost is ~all fixed).
  *
  *   SPARK_GRAFT_SCALE=2 sbt 'runMain graft.FunnelProfile'
  */
object FunnelProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "2").toInt
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

    val rawDocs = Tables.documents(spark, sfDir)
    val rawEmb = Tables.embeddings(spark, sfDir)
    val batch = rawDocs.filter(col("doc_id") % 5 === 0).cache()
    batch.count()
    val evalSet = rawDocs.filter(col("doc_id") < 50)
    val batchEmb = rawEmb.filter(col("vec_id") % 5 === 0)
    val cfg = IncrementalIngestJob.Config(semDedupTau = 0.4)

    val stateDocs = inflate(rawDocs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", mult)
      .withColumn("text",
        TextClean.scrub(TextClean.canonicalizeClasses(col("text"))))
    val stateEmb = inflate(rawEmb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", mult)
    val cs = SemDedup.seedCentroids(stateEmb, 64)
    val keptEmb = SemDedup.assign(stateEmb, cs)
      .select(col("vec_id"), col("vec").as("embedding"), col("cluster"))
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_funnel_profile").toString
    IncrementalIngestJob.saveState(IncrementalIngestJob.State(
      stateDocs.select(TextFns.fingerprint(col("text"))
        .as("fingerprint")),
      Dedup.minhashSignatures(stateDocs, k = cfg.minhashK,
        n = cfg.shingleN),
      Some(cs), Some(keptEmb),
      Some(stateDocs.select(col("doc_id"),
        TextFns.simhash64(col("text")).as("simhash")))), stateDir)
    val state = IncrementalIngestJob.loadState(spark, stateDir)

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    (1 to runs).foreach { r =>
      println(s"[profile] ---- probe run $r (mult=$mult) ----")
      // count = the stage's cache-materialization action; gap = the
      // EAGER work between stage events (localCheckpoints, bloom
      // builds, the label-propagation loops) — the hidden share
      var last = System.nanoTime()
      IncrementalIngestJob.stageTimer = Some { (name, sec) =>
        val now = System.nanoTime()
        val gap = (now - last) / 1e9 - sec
        last = now
        println(f"[profile] stage $name%-18s count $sec%7.2f s   " +
          f"eager-gap $gap%7.2f s")
      }
      val t0 = System.nanoTime()
      val (surv, _, _) = IncrementalIngestJob.run(state, batch,
        evalSet, cfg, Some(batchEmb))
      surv.write.format("noop").mode("overwrite").save()
      surv.unpersist()
      println(f"[profile] TOTAL probe ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      IncrementalIngestJob.stageTimer = None
    }

    batch.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(stateDir))
    spark.stop()
  }
}
