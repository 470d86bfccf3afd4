package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY §7 scale notes; the cluster-scale
  * answer to repeated large joins and aggregations on a stable key).
  *
  * Writing both sides of a hot join bucketed (and sorted) by the join
  * key makes every later equi-join and groupBy on that key SHUFFLE-FREE:
  * the scan's output partitioning already satisfies the operator's
  * distribution requirement, so Catalyst plans a sort-merge join with no
  * Exchange on either side. At 100 TB this converts the dominant
  * repeated cost (full-table shuffle per join) into a one-time cost at
  * write. BucketingSpec pins the no-Exchange plan shape.
  *
  * Bucket-count guidance: size buckets so one bucket ≈ one task's
  * comfortable working set (128–512 MB); both sides need the same
  * bucket count (or a divisor) for co-location.
  *
  * Measured (round-9 A/B, graft.AbBucket, q06's orders⋈customer at
  * the 128× inflation, warm best-of-3): co-bucketed SMJ 1.69 s and
  * bucketed scan + broadcast 1.49 s vs 1.97–2.21 s for the same join
  * over flat parquet — ~25% from layout alone on a single join, on
  * top of removing the per-join shuffle that dominates when the key
  * is hot across a workload.
  */
object Bucketing {

  /** Persist `df` as a managed parquet table bucketed and sorted by
    * `key` — the one-time co-location investment. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join of two co-bucketed tables on their bucket key; with both
    * sides bucketed identically this plans with zero Exchange. */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
