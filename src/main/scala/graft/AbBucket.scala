package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B (round-9 verdict item 4): q06_join3's remaining gap at
  * 128× is probe-side throughput of the broadcast hash join (strategy
  * A/B in RelationalQueries comments: broadcast 1.84 s beats SMJ
  * 2.12 s and pre-agg 2.76 s). The next lever is DATA LAYOUT: write
  * orders and customer bucketed+sorted by custkey (Bucketing.scala)
  * so the join plans as a zero-exchange sort-merge over pre-sorted
  * runs — probe becomes a merge. Times (warm best-of-3):
  *   A: current broadcast plan over flat parquet
  *   B: co-bucketed SMJ (merge hint forces the path)
  *   C: co-bucketed + broadcast still allowed (what a user would get)
  * Measured at 128×: A 1.97-2.21 s, B 1.69 s, C 1.49 s — recorded in
  * BASELINE.md round 9 and at the call sites.
  */
object AbBucket {
  def main(args: Array[String]): Unit = {
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val spark = AbBench.session(
      "spark.sql.warehouse.dir" -> "/tmp/graft_bucket_wh")
    val dir = AbBench.scaleDir()

    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("n_name"))

    // one-time bucketed write, FINGERPRINTED on (source dir, buckets)
    // — existence alone silently reused a stale-scale table after a
    // SPARK_GRAFT_SCALE change, timing legs B/C on different data
    // than leg A (the InflateFixtures lesson), and a crash between
    // the two writes left a half-cache the existence check passed.
    // A fresh JVM's in-memory catalog never knows a previous run's
    // tables, so a marker hit RE-REGISTERS the persisted locations as
    // external bucketed tables (CREATE TABLE ... CLUSTERED BY ...
    // LOCATION) instead of rewriting — the cache now actually hits
    // across runs (it never could before: tableExists was false in
    // every fresh JVM, making the fingerprint dead code).
    val wh = "/tmp/graft_bucket_wh"
    val marker = new java.io.File(s"$wh/_AB_FINGERPRINT")
    val want = s"src=$dir;buckets=$buckets"
    val ordersDf = Tables.orders(spark, dir)
    val customerDf = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val specs = Seq("orders_b" -> ordersDf, "customer_b" -> customerDf)
    val cached = marker.exists() &&
      java.nio.file.Files.readString(marker.toPath) == want &&
      specs.forall { case (t, _) => new java.io.File(s"$wh/$t")
        .isDirectory }
    if (cached) {
      println("[ab] reusing persisted bucketed tables (fingerprint hit)")
      specs.foreach { case (t, df) =>
        if (!spark.catalog.tableExists(t))
          spark.sql(s"CREATE TABLE $t (${df.schema.toDDL}) " +
            "USING parquet CLUSTERED BY (o_custkey) " +
            s"SORTED BY (o_custkey) INTO $buckets BUCKETS " +
            s"LOCATION '$wh/$t'")
      }
    } else {
      println("[ab] writing bucketed tables (one-time)")
      if (marker.exists()) marker.delete()
      // stale names AND stale locations both block saveAsTable — drop
      // and delete before rewriting
      specs.foreach { case (t, _) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$wh/$t"))
      }
      specs.foreach { case (t, df) =>
        operators.Bucketing.writeBucketed(df, t, "o_custkey", buckets)
      }
      java.nio.file.Files.writeString(marker.toPath, want)
    }
    Tables.orders(spark, dir).limit(1).write.format("noop")
      .mode("overwrite").save()

    def qA(): DataFrame = agg(
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey")))
    def qB(): DataFrame = agg(
      // merge hint forces the SMJ path over the co-bucketed (already
      // sorted) scans regardless of the broadcast threshold
      spark.table("orders_b").hint("merge")
        .join(spark.table("customer_b").hint("merge"), Seq("o_custkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey")))
    def qC(): DataFrame = agg(
      operators.Bucketing.cobucketedJoin(spark,
          "orders_b", "customer_b", "o_custkey")
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey")))

    AbBench.time("q06A_broadcast_flat", qA _)
    val pB = qB().queryExecution.executedPlan.toString
    println(s"[ab] planB SMJ=${pB.contains("SortMergeJoin")} " +
      s"exchanges=${"Exchange hashpartitioning".r.findAllIn(pB).size}")
    AbBench.time("q06B_bucketed_smj", qB _)
    AbBench.time("q06C_bucketed_bhj", qC _)
    AbBench.time("q06A_broadcast_flat2", qA _)
    spark.stop()
  }
}
