package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B (round-9 verdict item 4): q06_join3's remaining gap at
  * 128× is probe-side throughput of the broadcast hash join (strategy
  * A/B in RelationalQueries comments: broadcast 1.84 s beats SMJ
  * 2.12 s and pre-agg 2.76 s). The next lever is DATA LAYOUT: write
  * orders and customer bucketed+sorted by custkey (Bucketing.scala)
  * so the join plans as a zero-exchange sort-merge over pre-sorted
  * runs — probe becomes a merge. Times (warm best-of-3):
  *   A: current broadcast plan over flat parquet
  *   B: co-bucketed SMJ (broadcast disabled to force the merge path)
  *   C: co-bucketed + broadcast still allowed (what a user would get)
  */
object AbBucket {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "128")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_sf$mult")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bucket_wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, f: () => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label%-24s best=${ts.min}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("n_name"))

    // one-time bucketed write (cached across runs via table existence)
    if (!spark.catalog.tableExists("orders_b")) {
      println("[ab] writing bucketed tables (one-time)")
      operators.Bucketing.writeBucketed(
        Tables.orders(spark, dir), "orders_b", "o_custkey", buckets)
      operators.Bucketing.writeBucketed(
        Tables.customer(spark, dir)
          .withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", "o_custkey", buckets)
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

    time("q06A_broadcast_flat", qA _)
    val pB = qB().queryExecution.executedPlan.toString
    println(s"[ab] planB SMJ=${pB.contains("SortMergeJoin")} " +
      s"exchanges=${"Exchange hashpartitioning".r.findAllIn(pB).size}")
    time("q06B_bucketed_smj", qB _)
    time("q06C_bucketed_bhj", qC _)
    time("q06A_broadcast_flat2", qA _)
    spark.stop()
  }
}
