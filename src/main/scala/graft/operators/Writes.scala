package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unique-key write semantics re-expressed as set operations.
  *
  * Postgres enforced these with constraints; Spark has none, so idempotency
  * becomes explicit relational algebra (SURVEY §2.1 S3/S4, §7.4). At
  * warehouse scale these become a MERGE against a transactional table
  * format; the set-op formulation here is the engine-agnostic core.
  */
object Writes {

  /** `INSERT ... ON CONFLICT DO NOTHING` keyed by `keys`
    * (reference: airflow/dags/stock_grok_pipeline.py:84-97): keep all
    * existing rows; append only incoming rows whose key is absent.
    * Also dedups within the incoming batch (deterministically: min struct
    * of remaining columns per key, so re-runs are stable). */
  def insertIgnore(existing: DataFrame, incoming: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val valueCols = incoming.columns.filterNot(keys.contains)
    val dedupedIncoming = incoming
      .groupBy(keyCols: _*)
      .agg(min(struct(valueCols.map(col).toIndexedSeq: _*)).as("_v"))
      .select(keyCols ++ valueCols.map(c => col(s"_v.$c").as(c)): _*)
      .select(existing.columns.map(col).toIndexedSeq: _*)
    existing.unionByName(
      dedupedIncoming.join(existing.select(keyCols: _*).distinct(),
        keys, "left_anti"))
  }

  /** `INSERT ... ON CONFLICT DO UPDATE` (upsert) keyed by `keys`
    * (reference: ml/data_loader.py:140-160): incoming wins on key clash;
    * existing rows with no clash survive. One set-oriented plan replaces
    * the reference's row-at-a-time loop. */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val valueCols = incoming.columns.filterNot(keys.contains)
    val dedupedIncoming = incoming
      .groupBy(keyCols: _*)
      .agg(min(struct(valueCols.map(col).toIndexedSeq: _*)).as("_v"))
      .select(keyCols ++ valueCols.map(c => col(s"_v.$c").as(c)): _*)
      .select(existing.columns.map(col).toIndexedSeq: _*)
    existing
      .join(dedupedIncoming.select(keyCols: _*).distinct(), keys, "left_anti")
      .unionByName(dedupedIncoming)
  }

  /** Delta detection: rows in `all` not yet enriched — the NOT EXISTS
    * anti-join that gates the reference's API calls
    * (reference: airflow/dags/stock_grok_pipeline.py:191-194). */
  def unenriched(all: DataFrame, enriched: DataFrame,
                 keys: Seq[String]): DataFrame =
    all.join(enriched.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Insert-ignore for the warehouse-scale shape: `existing` is huge
    * (the 100 TB table), `incoming` is a bounded batch. The plain
    * formulation anti-joins against ALL existing keys — a full shuffle
    * (or at best a giant scan into a shuffle) of the big side on every
    * batch. Here a Bloom filter built over the batch's keys (driver-side,
    * MBs) probes the EXISTING scan map-side; only the probe's hits — true
    * conflicts plus `fpp` false positives — flow into a broadcast
    * anti-join that resolves them exactly. No false negatives means every
    * real conflict reaches the broadcast side, so the result equals
    * `insertIgnore` exactly; the existing table's bytes never shuffle.
    *
    * Size the trade: broadcast side ≈ |incoming ∩ existing| +
    * fpp·|existing|. The default fpp=1e-6 keeps a trillion-row existing
    * table's false positives around 10⁶ rows (megabytes of keys). */
  def insertIgnoreBloom(existing: DataFrame, incoming: DataFrame,
                        keys: Seq[String], fpp: Double = 1e-6): DataFrame = {
    val keyCols = keys.map(col)
    val keyHash = xxhash64(keyCols: _*)
    val valueCols = incoming.columns.filterNot(keys.contains)
    val dedupedIncoming = incoming
      .groupBy(keyCols: _*)
      .agg(min(struct(valueCols.map(col).toIndexedSeq: _*)).as("_v"))
      .select(keyCols ++ valueCols.map(c => col(s"_v.$c").as(c)): _*)
      .select(existing.columns.map(col).toIndexedSeq: _*)
    val expected = math.max(incoming.count(), 1L)
    val bf = incoming.stat.bloomFilter(keyHash, expected, fpp)
    val conflicts = existing
      .filter(graft.plans.BloomFns.mightContain(keyHash, bf))
      .select(keyCols: _*)
    existing.unionByName(
      dedupedIncoming.join(broadcast(conflicts), keys, "left_anti"))
  }
}
