package graft

import org.apache.spark.sql.SparkSession

/** Dev main: the small-query CROSSOVER demonstration (round-7 verdict
  * item 5). The ten headline queries whose sf0.1/32× ratios sit above
  * the 2× per-query bar are all sub-second queries dominated by
  * Spark's fixed per-job cost against a sub-0.3 s DuckDB time; the
  * plan-audit verdict each round has been "no scale-killer — the ratio
  * falls with data size". This main makes that claim EMPIRICAL: time
  * exactly those queries (same warm best-of-N discipline as
  * [[Bench]]) on a larger key-shifted inflation (default 128×) with
  * the DuckDB oracle replayed on the same files, and print one JSON
  * line of per-query ratios. Committed as CROSSOVER_r{N}.json next to
  * the driver's BENCH artifacts.
  *
  *   SPARK_GRAFT_SCALE=128 sbt 'runMain graft.Crossover'
  */
object Crossover {

  /** The >2× set from BENCH_r07 (ratio, descending). */
  val slow: Seq[String] = Seq(
    "q31_dedup_exact", "q35_knn", "q06_join3", "q02_group_agg",
    "q01_global_agg", "q44_class_metrics", "q41_accuracy_by_user",
    "q03_supplier_stats", "q28_token_stats", "q07_anti_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "128").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_sf$mult")
    // override the query set (comma-separated) for ad-hoc scale
    // timings of any SparkEntry query, e.g. q118_covariance
    val names = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(slow)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // measured shape from the 32× leg: shuffle partitions = cores
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val want = InflateFixtures.fingerprint(sfDir, mult, cpus)
    val marker = new java.io.File(dir, InflateFixtures.FingerprintFile)
    val complete = Tables.names.forall(n =>
      new java.io.File(s"$dir/$n.parquet/_SUCCESS").exists()) &&
      marker.exists() &&
      java.nio.file.Files.readString(marker.toPath) == want
    if (!complete) {
      System.err.println(s"[crossover] materializing $dir at ${mult}x")
      InflateFixtures.materialize(spark, sfDir, dir, mult, cpus)
    }
    // warm-up: JIT/codegen + file metadata, as in Bench
    Tables.names.foreach { n =>
      try Tables.table(spark, dir, n).limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val (perRun, errors) = Bench.timeQueriesRuns(spark, dir, runs, names)
    val results0 = perRun.map { case (k, ts) => k -> ts.min }
    // optional bucketed-layout sibling for q06 (the round-9 storage
    // A/B promoted to the crossover protocol): timed from the SAME
    // fingerprinted external tables the bench128 leg uses
    val results =
      if (sys.env.getOrElse("SPARK_GRAFT_Q06_BUCKETED", "0") != "1")
        results0
      else results0 ++ Bench.q06Bucketed(spark, cpus, dir, want, runs)
        .map(t => "q06_bucketed" -> t)
    val duck = Bench.duckdbTimesFor(dir, runs, names)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val duckPart = duck.map { case (_, perQ) =>
      val dq = perQ.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val ratios = results.flatMap { case (k, v) =>
        perQ.get(k).filter(_ > 0).map(d => "\"" + k + "\":" +
          f"${v / d}%.2f")
      }.mkString("{", ",", "}")
      s""","duckdb_queries":$dq,"ratios":$ratios"""
    }.getOrElse("")
    val errPart =
      if (errors.isEmpty) ""
      else errors.map(JsonUtil.quote).mkString(""","errors":[""", ",", "]")
    // per-run samples, same rationale as Bench's runs_detail: a min
    // cannot reject a contended window; the raw samples can
    val runsJson = perRun.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString(""","runs_detail":{""", ",", "}")
    println(s"""{"metric":"crossover","mult":$mult,"runs":$runs,"spark_sec":${results.map(_._2).sum},"queries":$qs$runsJson$duckPart$errPart,"sf":"$sfDir"}""")
    spark.stop()
  }
}
