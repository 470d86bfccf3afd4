package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: where does q02's per-row constant go at 512×?
  * Decomposes the 6-group aggregate into scan floor, numeric-only
  * aggregation, and string-keyed hashing variants. */
object AbQ02 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf512")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li: DataFrame = Tables.lineitem(spark, dir)
    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q02] $label%-32s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    li.limit(1).write.format("noop").mode("overwrite").save()
    time("count_star", () => li.agg(count(lit(1))))
    time("global_sums_only", () =>
      li.agg(count(lit(1)), sum(col("l_quantity")), avg(col("l_discount"))))
    time("group_by_two_strings", () =>
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    time("group_by_concat_key", () =>
      li.groupBy(concat(col("l_returnflag"), col("l_linestatus")).as("k"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    // int surrogate keys (first byte), string recovered via max() —
    // measures the string-hash share of the agg cost
    time("group_by_ascii_ints", () =>
      li.groupBy(ascii(col("l_returnflag")).as("_rf"),
          ascii(col("l_linestatus")).as("_ls"))
        .agg(max(col("l_returnflag")).as("l_returnflag"),
          max(col("l_linestatus")).as("l_linestatus"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .drop("_rf", "_ls"))
    // group directly on the doubles-as-key? no — measure a single
    // string key for reference
    time("group_by_one_string", () =>
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    spark.stop()
  }
}
