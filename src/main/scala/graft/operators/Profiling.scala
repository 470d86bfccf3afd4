package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic column profiler — the `DESCRIBE`-grade data-quality rollup a
  * warehouse dashboard renders per table: row count, null count and
  * exact distinct cardinality per column, in ONE aggregation pass.
  *
  * Scale shape: Spark plans the multi-column `countDistinct` set as a
  * single Expand + two-phase aggregate — the input is scanned once and
  * duplicated ×|cols| map-side (each duplicate keyed by one column),
  * so cost is linear in rows×cols with no per-column rescan. The
  * single result row is unpivoted map-side into (col_name, …) rows.
  * For very wide tables at extreme volume the exact distincts would
  * swap to `approx_count_distinct` (HLL, fixed state) — the exact form
  * is the oracle-matching reference semantics.
  */
object Profiling {

  /** One row per profiled column: `col_name | n_rows | n_null |
    * n_distinct`. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs: Seq[Column] =
      count(lit(1)).as("_n") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"_nn_$c"),
          countDistinct(col(c)).as(s"_nd_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"))): _*)).as("e"))
      .select(col("e.col_name"), col("e.n_rows"), col("e.n_null"),
        col("e.n_distinct"))
  }
}
