package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Token-budget corpus selection: keep the highest-quality documents
  * whose cumulative token count fits a training budget — the greedy
  * prefix of the (quality DESC, doc_id ASC) ordering.
  *
  * The naive formulation is `SUM(tokens) OVER (ORDER BY quality DESC,
  * doc_id)` — a single-partition window, i.e. the whole corpus through
  * one task. [[distributedPrefixSum]] instead computes the classic
  * two-phase parallel scan:
  *
  *   1. range-repartition by the ordering (each partition owns a
  *      contiguous key range; Spark's range partitioner samples
  *      deterministically),
  *   2. per-partition running sums via a window PARTITIONED by
  *      `spark_partition_id()` — all partitions in parallel,
  *   3. per-partition totals (one tiny row per partition) get their own
  *      prefix sum and broadcast back as offsets.
  *
  * The only single-partition window runs over `numPartitions` rows.
  * Result is identical to the naive global window for any total
  * ordering (ties must be broken — include a unique id in the order).
  */
object BudgetSelect {

  /** Adds `cumCol` = running sum of `valueCol` over the TOTAL order
    * given by `order` (which must be tie-free), without a global
    * single-partition window. */
  def distributedPrefixSum(df: DataFrame, order: Seq[Column],
                           valueCol: Column, cumCol: String,
                           numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__local_cum",
      sum(valueCol).over(
        Window.partitionBy(col("__pid"))
          .orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-partition totals: numPartitions rows — the one tiny
    // single-partition window in the job
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(valueCol).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, col("__offset") + col("__local_cum"))
      .drop("__pid", "__local_cum", "__offset")
  }

  /** Greedy budget selection over `documents`: score with
    * [[TextFns.qualityScore]] (4dp-exact), order by (quality DESC,
    * doc_id), keep while the inclusive cumulative token count fits.
    *
    * Output: `(doc_id, quality, n_tokens, cum_tokens)` for kept docs.
    */
  def selectByTokenBudget(docs: DataFrame, tokenBudget: Long): DataFrame = {
    val scored = docs.select(
      col("doc_id"),
      TextFns.qualityScore(col("text")).as("quality"),
      TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    distributedPrefixSum(scored,
      Seq(col("quality").desc, col("doc_id").asc),
      col("n_tokens"), "cum_tokens")
      .where(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"))
  }
}
