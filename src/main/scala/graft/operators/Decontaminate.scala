package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Benchmark decontamination: flag corpus documents whose n-gram
  * shingles overlap an evaluation set (the standard "remove test-set
  * leakage before pretraining" pass).
  *
  * Scale shape: the benchmark index is tiny next to the corpus (eval
  * sets are MBs against 100 TB), so its distinct-shingle set is
  * BROADCAST — the corpus streams through a map-side hash probe with no
  * shuffle of corpus bytes; the only exchange is the per-doc hit count
  * rollup, which is one row per (doc, hit) — bounded by hits, not by
  * corpus size. Never join the corpus's exploded shingles shuffle-side
  * against an eval set: that shuffles the whole corpus by shingle.
  */
object Decontaminate {

  /** Per-corpus-doc contamination stats against `benchmark`:
    * (id, n_shingles, n_hit, contamination ∈ [0,1], contaminated 0/1).
    * Shingle sets are distinct per doc, so the post-probe count IS the
    * distinct-overlap count. Shingle-less docs are clean by definition. */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         n: Int = 2, threshold: Double = 0.5,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    // ONE shingle pass over the corpus: bind the array, carry its size
    // through explode_outer (the null row keeps shingle-less docs), and
    // LEFT-probe the broadcast index — a second plan branch would
    // re-shingle the whole corpus (measured 2× at scale)
    val exploded = corpus
      .select(col(idCol), TextFns.shingles(col(textCol), n).as("sh"))
      .select(col(idCol),
        coalesce(size(col("sh")), lit(0)).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("shingle"))
    val benchIndex = benchmark
      .select(explode(TextFns.shingles(col(textCol), n)).as("shingle"))
      .distinct()
      .withColumn("_hit", lit(1))
    val frac = col("n_hit").cast("double") /
      greatest(col("n_shingles"), lit(1L))
    exploded
      .join(broadcast(benchIndex), Seq("shingle"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("_hit")).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        round(frac, 6).as("contamination"),
        when(frac >= threshold, 1L).otherwise(0L).as("contaminated"))
  }

  /** The decontaminated corpus: drop docs at/above the threshold. */
  def clean(corpus: DataFrame, benchmark: DataFrame, n: Int = 2,
            threshold: Double = 0.5, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    corpus.join(
      contaminationStats(corpus, benchmark, n, threshold, textCol, idCol)
        .filter(col("contaminated") === 1L).select(col(idCol)),
      Seq(idCol), "left_anti")
}
