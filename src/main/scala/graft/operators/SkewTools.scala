package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key across `salt` reducers with a
  * deterministic per-row salt, aggregates partially, then merges the
  * partials — two small shuffles instead of one skewed one. AQE's skew
  * handling covers joins; aggregation skew still needs this. */
object SkewTools {

  /** Repartition on join keys with the session's shuffle parallelism
    * as an EXPLICIT count. For a high-fan-out self-join (candidate
    * pair generation: quadratic output from small input), AQE's
    * size-first coalescing reads the tiny PRE-join byte count and
    * collapses the join to a handful of tasks that then each carry
    * millions of pairs (measured on the SemDeDup join: 510 s
    * single-task vs seconds wide — BASELINE.md round 6). A
    * user-specified partition count is exempt from coalescing, and the
    * join reuses this exchange, so the only cost is pinning the
    * parallelism the join would have wanted anyway. */
  def fanoutRepartition(df: org.apache.spark.sql.DataFrame,
                        keys: Column*): org.apache.spark.sql.DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)

  /** Salted two-phase sum/count/min/max aggregation.
    * Result is identical to `df.groupBy(keys).agg(sum/count/min/max)` —
    * these aggregates are associative, so partial-then-merge is exact. */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    // deterministic row-level salt: cheap hash of the value column —
    // spreads a hot key's rows without requiring a random source
    val partial = df
      .withColumn("_salt",
        pmod(xxhash64(col(valueCol)), lit(salt)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_sum"), count(lit(1)).as("_n"),
        min(col(valueCol)).as("_min"), max(col(valueCol)).as("_max"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("_sum")).as(s"sum_$valueCol"),
        sum(col("_n")).as("n"),
        min(col("_min")).as(s"min_$valueCol"),
        max(col("_max")).as(s"max_$valueCol"))
  }

  /** Salted broadcast-side replication for a skewed join: explode the
    * small side `salt` times and salt the big side's key, so a hot join
    * key fans across `salt` tasks. Exact same join result. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonicallyIncreasingRowMarker(big)), lit(salt)))
    val replicatedSmall = small.crossJoin(
      small.sparkSession.range(salt).select(col("id").cast("int")
        .as("_salt")))
    saltedBig.join(broadcast(replicatedSmall), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** A deterministic per-row discriminator column for salting: prefers
    * an existing unique id; callers with one should salt on it
    * directly. Falls back to the full-row hash. */
  private def monotonicallyIncreasingRowMarker(df: DataFrame): Column =
    xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))

  /** Join-key skew profile — the diagnostic that decides whether
    * [[saltedJoin]]/AQE skew handling is needed BEFORE the join
    * ships: per-key frequencies folded to one summary row per labeled
    * key (n_keys, rows, hottest key and its count, the exact-disc p99
    * frequency, and the exact skew factor max/mean =
    * max·n_keys/rows). Two hash aggregates per key column. */
  def keySkewProfile(labeled: Seq[(String, DataFrame, String)])
      : DataFrame = {
    val parts = labeled.map { case (label, df, keyCol) =>
      val counts = df.groupBy(col(keyCol).cast("long").as("k"))
        .agg(count(lit(1)).cast("long").as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").asc, col("k").asc)
      val ranked = counts.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      ranked.agg(count(lit(1)).cast("long").as("n_keys"),
          sum(col("c")).cast("long").as("n_rows"),
          max(struct(col("c").as("c"), col("k").as("k"))).as("hot"),
          max(when(col("rn") === call_function("div",
            col("n") * 99 + 99, lit(100L)), col("c"))).as("p99_freq"))
        .select(lit(label).as("key_label"), col("n_keys"),
          col("n_rows"), col("hot.k").as("hottest_key"),
          col("hot.c").as("hottest_count"),
          col("p99_freq").cast("long").as("p99_freq"),
          graft.functions.ExactRound.ratio(
            col("hot.c") * col("n_keys"), col("n_rows"), 4)
            .as("skew_factor"))
    }
    parts.reduce(_.union(_))
  }
}
