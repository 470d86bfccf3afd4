package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Cross-subcorpus contamination diagnostics: n-gram *type* overlap
  * between every pair of corpus partitions (source, language, crawl
  * snapshot, …).
  *
  * Where [[Decontaminate]] answers "does my training corpus contain my
  * eval set" (directed, benchmark-vs-corpus), this answers "how much do
  * my subcorpora duplicate EACH OTHER" — the mixing-weight sanity check
  * a corpus report needs before sources are weighted as if independent
  * (two near-identical crawls double-count their shared text under
  * [[Sampling.mixBySource]]).
  *
  * Scale shape: the heavy reduction happens FIRST — `(group, gram)`
  * distinct-typing is one shuffle keyed by (group, gram), after which
  * volume is gram *types* per group, not corpus tokens. The pair count
  * is a self-join keyed by gram; a gram joins at most
  * `groups-it-appears-in choose 2` rows (bounded by the number of
  * groups squared, NOT by document frequency — a gram in a million
  * docs of the same two sources is still one row per source). Group
  * sizes join back via broadcast (one row per group).
  */
object CorpusOverlap {

  /** Pairwise shared-gram counts + Jaccard over gram types.
    *
    * Output: `(source_a, source_b, grams_a, grams_b, shared_grams,
    * jaccard)` for every unordered group pair, `source_a < source_b`.
    * `jaccard` is rounded to 6dp in exact integer arithmetic (same
    * half-up scheme as the q34 pair oracle) so cross-engine comparison
    * is exact.
    */
  def sourceNgramOverlap(docs: DataFrame, n: Int = 2,
                         textCol: String = "text",
                         groupCol: String = "source"): DataFrame = {
    // gram TYPES per group: the one corpus-volume shuffle
    val grams = docs
      .select(col(groupCol).as("g"),
        explode(TextFns.shingles(col(textCol), n)).as("gram"))
      .distinct()

    val sizes = grams.groupBy(col("g")).agg(count(lit(1)).as("sz"))

    val pairs = grams.alias("a")
      .join(grams.alias("b"), Seq("gram"))
      .where(col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))

    val denom = col("grams_a") + col("grams_b") - col("shared_grams")
    pairs
      .join(F.broadcast(sizes.select(col("g").as("source_a"),
        col("sz").as("grams_a"))), Seq("source_a"))
      .join(F.broadcast(sizes.select(col("g").as("source_b"),
        col("sz").as("grams_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("grams_a"), col("grams_b"), col("shared_grams"),
        // half-up 6dp in integer space: (2*10^6*inter + denom) / (2*denom)
        (call_function("div",
          lit(2000000L) * col("shared_grams") + denom,
          lit(2L) * denom).cast("double") / 1000000.0).as("jaccard"))
  }
}
