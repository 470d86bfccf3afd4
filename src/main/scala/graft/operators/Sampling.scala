package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment.
  *
  * `df.sample()` draws from a seeded RNG whose result depends on
  * partitioning — re-runs, repartitions, or cluster-size changes move
  * rows in and out of the sample. Keying the decision on a HASH of a
  * stable id makes samples reproducible anywhere, and threshold-based
  * membership makes them NESTED: sampleByHash(0.1) ⊂ sampleByHash(0.5)
  * on the same key, so a pilot corpus grows into the full one without
  * resampling (the property SamplingSpec pins). md5 keeps the bucket
  * engine-portable (oracle-exact in DuckDB).
  */
object Sampling {

  /** Uniform bucket in [0, 2³²) from the md5 of the key's string form. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep rows whose bucket falls below `fraction` of the bucket space
    * — a stable, nested `fraction`-sample. */
  def sampleByHash(df: DataFrame, keyCol: String,
                   fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hashBucket(col(keyCol)) <
      math.round(fraction * 4294967296.0))
  }

  /** train/val/test label from the bucket's percent residue — the
    * reproducible split a training pipeline needs (chronological splits
    * live in graft.ml.ChronoSplit; this is the i.i.d. variant). */
  def assignSplit(key: Column, trainPct: Int = 80,
                  valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100, "train+val must be <= 100")
    val pct = hashBucket(key) % 100
    when(pct < trainPct, "train")
      .when(pct < trainPct + valPct, "val")
      .otherwise("test")
  }
}
