package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level heuristic quality rules from the published
  * Gopher/MassiveText filtering recipe (Rae et al. 2021, "Scaling
  * Language Models", appendix A1.1) — the standard pre-training corpus
  * gate that [[graft.functions.TextFns.qualityScore]]'s banded score
  * does not express rule-by-rule.
  *
  * Every rule emits its own flag so downstream analysis can attribute
  * removals; `keep` is their conjunction. All ratio thresholds are
  * evaluated in INTEGER arithmetic (`10 * symbols <= n_words` instead
  * of `symbols / n_words <= 0.1`): no floating-point division on the
  * keep path, so flags are exactly reproducible across engines and the
  * DuckDB oracle (q104) hash-matches bit-for-bit.
  *
  * Scale shape: one whole-stage-codegen projection over the scan — no
  * shuffle, no UDF; the word/line arrays are built once per row and
  * shared by all rules.
  */
object QualityFilters {

  /** Per-group length-outlier flag: a document is `within_bounds` when
    * its `valueCol` lies inside the group's [lower, upper] exact
    * interpolated percentiles — the winsorization gate that drops
    * truncated fragments and concatenation accidents before training.
    * Two passes: one tiny per-group percentile aggregate (k rows,
    * broadcast back), one map-side compare — no per-row shuffle.
    * Exact relational algebra (q116 hash oracle; Spark `percentile`
    * and DuckDB `quantile_cont` share the linear-interpolation
    * definition, the q63/q67b-established bridge). */
  def lengthOutlierFlags(docs: DataFrame, groupCol: String = "lang",
                         valueCol: String = "n_chars",
                         lower: Double = 0.01,
                         upper: Double = 0.99): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      "need 0 <= lower < upper <= 1")
    val bounds = docs.groupBy(col(groupCol)).agg(
      expr(s"percentile($valueCol, $lower)").as("_lo"),
      expr(s"percentile($valueCol, $upper)").as("_hi"))
    docs.join(broadcast(bounds), Seq(groupCol))
      .withColumn("within_bounds",
        col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi"))
      .withColumn("lo", round(col("_lo"), 4))
      .withColumn("hi", round(col("_hi"), 4))
      .drop("_lo", "_hi")
  }

  /** Per-group ROBUST outlier flag via median absolute deviation —
    * the heavy-tail-safe twin of [[lengthOutlierFlags]]'s percentile
    * gate: median and MAD are unmoved by the outliers they hunt
    * (percentile bounds shift when the contamination fraction nears
    * the tail mass; median/MAD tolerate up to 50%). A value is an
    * inlier when |x − median| ≤ nMads · MAD.
    *
    * Two tiny per-group aggregates (k rows each, broadcast back) +
    * map-side compares — corpus rows never shuffle. Exact relational
    * algebra: Spark `percentile` and DuckDB `quantile_cont` share the
    * linear-interpolation definition, and over BIGINT inputs every
    * intermediate (x.0/x.5 medians, 0.25-step MADs) is an exact
    * binary fraction, so the q120 hash oracle is safe without the
    * integer-rounding bridge. Flags are BIGINT 0/1 for oracle-hash
    * portability. */
  def madOutlierFlags(docs: DataFrame, groupCol: String = "source",
                      valueCol: String = "n_chars",
                      nMads: Double = 3.0): DataFrame = {
    require(nMads > 0, "need nMads > 0")
    val med = docs.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withDev = docs.join(broadcast(med), Seq(groupCol))
      .withColumn("_adev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(expr("percentile(_adev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_inlier",
        (col("_adev") <= lit(nMads) * col("mad")).cast("long"))
      .withColumn("med", round(col("med"), 4))
      .withColumn("mad", round(col("mad"), 4))
      .drop("_adev")
  }

  /** Gopher's document stopword list (A1.1: "contains at least two of
    * the following English words"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule flags + keep decision.
    *
    * Rules (document removed when a flag is 0):
    *  1. `flag_word_count`    — word count in [minWords, maxWords]
    *  2. `flag_mean_word_len` — mean word length in [3, 10] chars
    *  3. `flag_symbol_ratio`  — (# of `#` + `...`) / words <= 0.1
    *  4. `flag_bullet_lines`  — < 90% of lines start with a bullet
    *  5. `flag_ellipsis_lines`— < 30% of lines end with `...`
    *  6. `flag_alpha_words`   — >= 80% of words contain a letter
    *  7. `flag_stopwords`     — >= 2 distinct Gopher stopwords present
    *
    * Flags are BIGINT 0/1 (not boolean) for oracle-hash portability.
    */
  def gopherFlags(docs: DataFrame,
                  minWords: Int = 50,
                  maxWords: Int = 100000,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val flags = ruleFlags(col(textCol), minWords, maxWords)
    val out = docs.select(
      col(idCol) +:
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_words") +:
        stopwordHits(col(textCol)).as("n_stopword_hits") +:
        flags.map { case (name, c) => c.as(name) }: _*)
    out.withColumn("keep",
      flags.map { case (name, _) => col(name) }.reduce((a, b) =>
        when(a === 1L && b === 1L, 1L).otherwise(0L)))
  }

  /** The filter itself: documents passing every Gopher rule — a pure
    * predicate over the scan (no join, no shuffle; the word/line array
    * exprs are evaluated once per row inside codegen). */
  def gopherFilter(docs: DataFrame,
                   minWords: Int = 50,
                   maxWords: Int = 100000,
                   textCol: String = "text"): DataFrame =
    docs.where(
      ruleFlags(col(textCol), minWords, maxWords)
        .map(_._2 === 1L).reduce(_ && _))

  /** Count of DISTINCT Gopher stopwords present (0..8) — exposed as a
    * diagnostic column because the keep flag thresholds it at 2. */
  def stopwordHits(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    GopherStopwords
      .map(s => when(array_contains(w, s), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** The seven named rule expressions over a text column. */
  private def ruleFlags(text: Column, minWords: Int,
                        maxWords: Int): Seq[(String, Column)] = {
    val w = split(trim(text), "\\s+")
    val lines = split(text, "\n")
    val nWords = size(w).cast("long")
    val nLines = size(lines).cast("long")
    val sumWordLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    // non-overlapping '...' occurrences, greedy left-to-right — the
    // same contraction replace() performs in both engines
    val nHash = (length(text) -
      length(replace(text, lit("#"), lit("")))).cast("long")
    val nEllipsis = ((length(text) -
      length(replace(text, lit("..."), lit("")))) / 3).cast("long")
    val bulletLines = size(filter(lines,
      x => ltrim(x).rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines,
      x => rtrim(x).endsWith("..."))).cast("long")
    val alphaWords = size(filter(w,
      x => x.rlike("[A-Za-z]"))).cast("long")
    val stopHits = stopwordHits(text)

    def flag(c: Column): Column = when(c, 1L).otherwise(0L)

    Seq(
      "flag_word_count" -> flag(nWords.between(minWords, maxWords)),
      // 3 <= sum/n <= 10  ⇔  3n <= sum AND sum <= 10n
      "flag_mean_word_len" ->
        flag(sumWordLen >= nWords * 3 && sumWordLen <= nWords * 10),
      // (hash + ellipsis)/words <= 0.1  ⇔  10*(hash+ellipsis) <= words
      "flag_symbol_ratio" -> flag((nHash + nEllipsis) * 10 <= nWords),
      // bullets/lines < 0.9  ⇔  10*bullets < 9*lines
      "flag_bullet_lines" -> flag(bulletLines * 10 < nLines * 9),
      // ellipsis-ends/lines < 0.3  ⇔  10*ends < 3*lines
      "flag_ellipsis_lines" -> flag(ellipsisLines * 10 < nLines * 3),
      // alpha/words >= 0.8  ⇔  5*alpha >= 4*words
      "flag_alpha_words" -> flag(alphaWords * 5 >= nWords * 4),
      "flag_stopwords" -> flag(stopHits >= 2))
  }

  /** PII incidence report per source: how many docs carry at least
    * one email / URL / phone-shaped match (the TextClean scrub
    * patterns), with exact shares — the privacy audit run BEFORE
    * deciding whether scrubbing suffices or docs must drop. One
    * map-side flag pass + one bounded per-source aggregate. */
  def piiIncidence(docs: DataFrame, textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    import graft.functions.TextClean
    def flag(c: Column): Column = (c > 0).cast("long")
    docs.select(col(sourceCol),
        flag(TextClean.emailCount(col(textCol))).as("he"),
        flag(TextClean.urlCount(col(textCol))).as("hu"),
        flag(TextClean.phoneCount(col(textCol))).as("hp"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("he")).cast("long").as("n_email_docs"),
        sum(col("hu")).cast("long").as("n_url_docs"),
        sum(col("hp")).cast("long").as("n_phone_docs"))
      .select(col(sourceCol), col("n_docs"), col("n_email_docs"),
        col("n_url_docs"), col("n_phone_docs"),
        graft.functions.ExactRound.ratio(
          col("n_email_docs") + col("n_url_docs") + col("n_phone_docs"),
          greatest(col("n_docs") * 3, lit(1L)), 4).as("pii_density"))
  }

  /** Per-doc line-SHAPE profile — the distribution the gopher flags
    * threshold on, exposed as counts + exact ratios so a curator can
    * pick thresholds from data instead of folklore: of the non-empty
    * lines, how many are bullets, ALL-CAPS (letters but no lowercase),
    * numeric-only, or short (< 3 whitespace words). Pure map-side
    * array HOFs over the line split — zero shuffle, codegen-friendly,
    * linear in bytes. */
  def lineShapeStats(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val ls = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    def n(pred: Column => Column): Column =
      size(filter(ls, pred)).cast("long")
    val nLines = size(ls).cast("long")
    val counts = docs.select(col(idCol),
      nLines.as("n_lines"),
      n(l => ltrim(l).rlike("^[-*•]")).as("n_bullet"),
      n(l => l.rlike("[A-Z]") && !l.rlike("[a-z]")).as("n_caps"),
      n(l => trim(l).rlike("^[0-9 .,%$-]+$")).as("n_numeric"),
      n(l => size(split(trim(l), "\\s+")) < 3).as("n_short"))
    counts.select(col(idCol), col("n_lines"), col("n_bullet"),
      col("n_caps"), col("n_numeric"), col("n_short"),
      graft.functions.ExactRound.ratio(col("n_bullet"),
        greatest(col("n_lines"), lit(1L)), 4).as("bullet_ratio"),
      graft.functions.ExactRound.ratio(col("n_short"),
        greatest(col("n_lines"), lit(1L)), 4).as("short_ratio"))
  }
}
