package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: probe rows `(keys, ts)` against interval rows
  * `(keys, start, end)` with `start ≤ ts ≤ end`.
  *
  * The naive formulation has two scale walls. With no equi key, Spark
  * plans `ts BETWEEN start AND end` as a BroadcastNestedLoopJoin /
  * cartesian product — O(|probe|·|intervals|). With a key, the hash
  * join still tests EVERY interval of a key against every probe row of
  * that key — a hot key degenerates to a per-key cartesian. This
  * operator adds the time bin (`ts DIV binWidth`) to the join key:
  * intervals explode over the bins they overlap, the equi join on
  * `(keys, bin)` meets only temporally-plausible candidates, and the
  * exact range predicate filters those. Work is linear in rows +
  * overlap fan-out regardless of key skew; the keyless plan contains
  * no nested loop (both pinned by RangeJoinSpec).
  *
  * Pick `binWidth` near the typical interval length: one bin per
  * interval on average, so the explode fan-out stays ~2× and a probe
  * row meets only intervals it could actually match.
  */
object RangeJoin {

  /** All columns of `probe` and `intervals` survive; `tsCol`,
    * `startCol`, `endCol` are LONG columns in the same unit (e.g. epoch
    * micros). */
  def joinRange(probe: DataFrame, intervals: DataFrame,
                keys: Seq[String], tsCol: String, startCol: String,
                endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = probe.withColumn("_bin",
      floor(col(tsCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(iv, keys :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
