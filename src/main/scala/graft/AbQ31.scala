package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe (round-12 verdict item 2): where does q31's per-row
  * constant go at 512×? CROSSOVER_r11 read 6.01× (Spark 0.85 s vs
  * DuckDB 0.14 s over 2.56 M docs) where r10 recorded 2.6-3.5× — the
  * Spark side was UNCHANGED, so the question is which q31 component
  * carries the 0.85 s and whether DuckDB's 0.14 s replay is real.
  * Decomposes md5(text) → groupBy(hash) → sort into: scan floor
  * (count-star), md5 projection only, numeric-keyed group (agg buffer
  * without the string-key hash), md5-keyed group without the output
  * sort, and the full query. The DuckDB mirror of each leg runs via
  * tools/duck_bench.py-style ad-hoc SQL (driver-side), recorded in
  * BASELINE.md next to the refreshed crossover row.
  */
object AbQ31 {
  def main(args: Array[String]): Unit = {
    val spark = AbBench.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_sf512")
    def docs: DataFrame = Tables.documents(spark, dir)
    docs.limit(1).write.format("noop").mode("overwrite").save()
    AbBench.time("count_star", () => docs.agg(count(lit(1))))
    // q31's own hash kernel (FastMd5, the codegen'd expression
    // Dedup.exact groups on), as a pure projection — the md5 share
    AbBench.time("fastmd5_project_only", () =>
      docs.select(graft.plans.FastMd5.column(col("text"))
        .as("content_hash")))
    // built-in md5 kernel for contrast (hex-string codegen path)
    AbBench.time("builtin_md5_project", () =>
      docs.select(md5(col("text")).as("content_hash")))
    // agg-buffer constant without the 32-char string key: group on a
    // numeric surrogate of the same cardinality shape
    AbBench.time("group_by_doc_id_mod", () =>
      docs.groupBy((col("doc_id") % 1000000L).as("k"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_dups")))
    AbBench.time("group_by_fastmd5_no_sort", () =>
      docs.groupBy(graft.plans.FastMd5.column(col("text"))
          .as("content_hash"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_dups")))
    AbBench.time("q31_full_with_sort", () =>
      graft.operators.Dedup.exact(docs).orderBy(col("content_hash")))
    spark.stop()
  }
}
