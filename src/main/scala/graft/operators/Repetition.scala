package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Within-document repetition signals (Gopher-style quality filters:
  * repeated tokens / n-grams mark boilerplate, spam, and generation
  * loops).
  *
  * Every signal is a per-row expression — array_distinct sizes plus
  * the native [[graft.plans.TokenTopCount]] kernel for the top-token
  * share — so the whole profile is a map-side projection with NO
  * Exchange at any corpus size (plan-pinned in RepetitionSpec). The
  * composed alternatives both lose: explode + two hash aggregations
  * shuffles every token in the corpus, and an O(distinct × total)
  * HOF filter-count loop is quadratic in document length (measured —
  * see MEMORY perf landmines). */
object Repetition {

  /** Per-doc repetition profile:
    * (id, n_tokens, n_distinct, dup_token_frac, top_token_frac,
    * dup_bigram_frac) — fractions in [0,1], 0 for token-less docs. */
  def profile(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    // two-step select: tokenization materializes once, the three size
    // consumers read the bound column (CollapseProject keeps non-cheap
    // expressions out of multi-consumer inlining)
    val toks = docs.select(col(idCol),
      TextFns.tokens(col(textCol)).as("w"),
      TextFns.shingles(col(textCol), 2).as("bi"))
    toks.select(col(idCol),
        coalesce(size(col("w")), lit(0)).cast("long").as("n_tokens"),
        coalesce(size(array_distinct(col("w"))), lit(0)).cast("long")
          .as("n_distinct"),
        coalesce(size(col("bi")), lit(0)).cast("long")
          .as("n_bigram_distinct"),
        coalesce(graft.plans.TopCountExpressions.tokenTopCount(col("w")),
          lit(0L)).as("top_cnt"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        // count-ratio fractions round in exact integer arithmetic
        // (ExactRound scaladoc): 1 - a/b ≡ (b-a)/b keeps it a ratio of
        // nonnegative longs
        when(col("n_tokens") > 0, graft.functions.ExactRound.ratio(
          col("n_tokens") - col("n_distinct"), col("n_tokens"), 6))
          .otherwise(0.0).as("dup_token_frac"),
        when(col("n_tokens") > 0, graft.functions.ExactRound.ratio(
          col("top_cnt"), col("n_tokens"), 6))
          .otherwise(0.0).as("top_token_frac"),
        when(col("n_tokens") > 1, graft.functions.ExactRound.ratio(
          col("n_tokens") - 1 - col("n_bigram_distinct"),
          col("n_tokens") - 1, 6)).otherwise(0.0)
          .as("dup_bigram_frac"))
  }
}
