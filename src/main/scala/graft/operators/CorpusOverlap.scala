package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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

  /** Pairwise Jensen-Shannon divergence between the groups' unigram
    * DISTRIBUTIONS — where [[sourceNgramOverlap]] compares vocabulary
    * *sets*, this compares token *frequencies*: two sources can share
    * every word yet weight them so differently that mixing them shifts
    * the blend (JSD in bits, 0 = identical distribution, 1 = disjoint
    * support).
    *
    * Only tokens present in BOTH groups need the join: a token absent
    * from one side contributes exactly its own probability to the
    * other side's KL term (log₂(2p/(p+0)) = 1), so
    * JSD = ½[(1−P∩) + Σ∩ p·log₂(2p/(p+q))] + ½[(1−Q∩) + …] — the
    * one-sided mass arrives via the complements, never as rows. The
    * join is keyed by token with at most groups² rows per token
    * (frequency folded first), totals broadcast back.
    *
    * Determinism is the q87 decimal scheme end to end: per-token terms
    * ln-computed on identical doubles, 6dp-rounded into DECIMAL(28,6),
    * summed exactly, lifted to micro-bit longs, clamped at 0 (the
    * rounded sum of a true-zero JSD can dip ~1e-6 negative) and
    * half-up halved in integer space — both engines emit the identical
    * 6dp value (q122 hash oracle). */
  def sourceJsDivergence(docs: DataFrame, textCol: String = "text",
                         groupCol: String = "source"): DataFrame = {
    val ln2 = lit(math.log(2.0))
    val counts = docs
      .select(col(groupCol).as("g"),
        explode(TextFns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val probs = counts.join(F.broadcast(totals), Seq("g"))
      .select(col("g"), col("token"),
        (col("cnt").cast("double") / col("n").cast("double")).as("p"))
    def dec6(c: Column): Column = round(c, 6).cast("decimal(28,6)")
    val p = col("a.p"); val q = col("b.p")
    val joined = probs.alias("a").join(probs.alias("b"), Seq("token"))
      .where(col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(count(lit(1)).as("shared_tokens"),
        sum(dec6(p * (log(lit(2.0) * p / (p + q)) / ln2))).as("_sa"),
        sum(dec6(q * (log(lit(2.0) * q / (p + q)) / ln2))).as("_sb"),
        sum(dec6(p)).as("_pb"), sum(dec6(q)).as("_qb"))
    def micro(c: Column): Column = (c * 1000000).cast("long")
    // 2·JSD in micro-bits: one-sided mass via the complements
    val twice = (lit(1000000L) - micro(col("_pb"))) + micro(col("_sa")) +
      (lit(1000000L) - micro(col("_qb"))) + micro(col("_sb"))
    val scored = joined.select(col("source_a"), col("source_b"),
      col("shared_tokens"),
      (call_function("div", greatest(twice, lit(0L)) + 1, lit(2L))
        .cast("double") / 1000000.0).as("jsd"))
    // disjoint-support pairs produce no join row but are the MOST
    // divergent case (JSD = 1) — surface every group pair explicitly
    val gs = totals.select(col("g"))
    val allPairs = gs.select(col("g").as("source_a"))
      .crossJoin(F.broadcast(gs.select(col("g").as("source_b"))))
      .where(col("source_a") < col("source_b"))
    allPairs.join(F.broadcast(scored), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("shared_tokens"), lit(0L)).as("shared_tokens"),
        coalesce(col("jsd"), lit(1.0)).as("jsd"))
  }
}
