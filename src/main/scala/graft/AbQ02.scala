package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: where does q02's per-row constant go at 512×?
  * Decomposes the 6-group aggregate into scan floor, numeric-only
  * aggregation, and string-keyed hashing variants. Measured (512×,
  * CROSSOVER_r09.json): scan 0.35 s, ungrouped sums 0.52 s, 6-group
  * string-keyed 1.87 s, concat key worse (2.34 s), max(string)
  * recovery catastrophic (13.1 s — a string aggregation buffer kicks
  * the plan out of HashAggregate into ObjectHash/Sort aggregation).
  *
  * QUESTION CLOSED (round 10, CROSSOVER_r10.json): the last untried
  * lever — ONE packed int key `ascii(flag)*256+ascii(status)` decoded
  * via chr() post-agg, so no string touches the aggregation buffer —
  * measures 1.861 s vs 1.896 s string-keyed at 512×: a WASH, below
  * the 1.3× adoption bar. Key hashing was never the cost; the ~1.9 s
  * over 307M rows is the per-row aggregation-buffer constant of the
  * minimal two-phase plan. No further q02 levers exist.
  */
object AbQ02 {
  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_sf512")
    def li: DataFrame = Tables.lineitem(spark, dir)
    li.limit(1).write.format("noop").mode("overwrite").save()
    AbBench.time("count_star", () => li.agg(count(lit(1))))
    AbBench.time("global_sums_only", () =>
      li.agg(count(lit(1)), sum(col("l_quantity")),
        avg(col("l_discount"))))
    AbBench.time("group_by_two_strings", () =>
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    AbBench.time("group_by_concat_key", () =>
      li.groupBy(concat(col("l_returnflag"), col("l_linestatus")).as("k"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    // int surrogate keys (first byte), string recovered via max() —
    // measures the string-hash share; NOT adoptable (string buffer)
    AbBench.time("group_by_ascii_ints", () =>
      li.groupBy(ascii(col("l_returnflag")).as("_rf"),
          ascii(col("l_linestatus")).as("_ls"))
        .agg(max(col("l_returnflag")).as("l_returnflag"),
          max(col("l_linestatus")).as("l_linestatus"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .drop("_rf", "_ls"))
    AbBench.time("group_by_one_string", () =>
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc")))
    // the round-9 verdict's last untried lever: ONE packed int key
    // ascii(flag)*256 + ascii(status), decoded via chr() in a
    // POST-AGG projection — a pure projection of the key, so no
    // string ever enters the aggregation buffer (unlike the
    // max(string) recovery above) and the hash is a single int
    AbBench.time("group_by_packed_int_key", () =>
      li.groupBy((ascii(col("l_returnflag")) * 256 +
          ascii(col("l_linestatus"))).as("_k"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .select(char(call_function("div", col("_k"), lit(256)))
            .as("l_returnflag"),
          char(col("_k") % 256).as("l_linestatus"),
          col("n"), col("sum_qty"), col("avg_disc")))
    spark.stop()
  }
}
