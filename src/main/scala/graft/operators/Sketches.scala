package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the 100 TB path for distinct counts and
  * quantiles.
  *
  * Exact `count(distinct x)` shuffles every distinct value to a
  * reducer; exact `percentile` collects every value per group. Both
  * have state proportional to the data. Sketches replace that with
  * FIXED-SIZE mergeable state (HLL registers, KLL/GK summaries), so the
  * aggregation is a map-side partial + one small shuffle regardless of
  * cardinality — the only shape that survives a 100 TB distinct-URL or
  * length-distribution profile.
  *
  * Error contracts (pinned by SketchesSpec against the exact answers):
  * - `approxDistinct`: HyperLogLog++ relative standard deviation `rsd`
  *   (default 2.5%; Spark caps rsd ≥ 0.4% ≈ 32KB of registers).
  * - `approxQuantiles`: `percentile_approx(accuracy)` rank error
  *   ≤ 1/accuracy of the row count.
  *
  * The SQL-surface twin for EXACT distinct/percentile profiling already
  * exists (q03/q63); these are the drop-in approximate replacements, so
  * they're exposed through `queries()` rows-only (a cross-engine hash
  * oracle would pin two engines' sketch internals, not semantics).
  */
object Sketches {

  /** Per-group HLL++ distinct-count profile of `valueCol`. */
  def distinctProfile(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, rsd: Double = 0.025): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd)
        .as(s"approx_distinct_$valueCol"))

  /** Per-group approximate quantiles of `valueCol` at the given
    * probabilities; rank error ≤ n/accuracy. */
  def quantileProfile(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, probs: Seq[Double],
                      accuracy: Int = 10000): DataFrame = {
    val pArr = array(probs.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy))
        .as(s"approx_q_$valueCol"))
  }

  /** One-pass corpus profile: distinct sketches + quantile summaries for
    * several columns in a single aggregation (one shuffle total).
    *
    * Quantiles come out as SCALAR `chars_q50` / `chars_q90` columns (not
    * one array column): downstream tabular consumers — including the
    * driver's pandas row check — sort/hash on columns, and an
    * array-typed cell breaks that contract. Both percentiles still share
    * one underlying summary per group (same agg, one shuffle).
    */
  def corpusProfile(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("source"), 0.01).as("nd_sources"),
        approx_count_distinct(col("doc_id"), 0.01).as("nd_docs"),
        percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9)),
          lit(10000)).as("chars_q"))
      .withColumn("chars_q50", element_at(col("chars_q"), 1))
      .withColumn("chars_q90", element_at(col("chars_q"), 2))
      .drop("chars_q")

  /** Approximate heavy hitters (frequent values) of `valueCol` via a
    * Count-Min Sketch (Cormode & Muthukrishnan 2005) — the third sketch
    * family next to HLL (distincts) and KLL (quantiles): FREQUENCIES.
    *
    * Why not exact `groupBy(value).count().orderBy(desc)`: at 100 TB
    * the shuffle carries one row per DISTINCT value (billions for
    * tokens/URLs). The sketch path carries fixed-size state instead:
    *  1. one `count_min_sketch` aggregate — per-partition sketches of
    *     `depth×width` counters, map-side combined, merged to a single
    *     bounded binary on the driver (eps→width=⌈2/eps⌉, so ~160 KB
    *     at eps=1e-4 regardless of cardinality);
    *  2. candidates from per-partition LOCAL exact top-`candidatesPerPartition`
    *     (a hash map bounded by the partition, no shuffle of the tail —
    *     any value with global share > 1/cpp must be a local top-cpp
    *     somewhere, so true heavy hitters cannot be missed);
    *  3. the tiny candidate set is probed against the broadcast sketch
    *     for GLOBAL estimates and top-`k` by estimate is returned.
    *
    * CMS guarantees estimate ≥ true count, and ≤ true + eps·N with
    * probability `confidence` — pinned by SketchesSpec against the
    * exact counts. Exposed rows-only (q108): the estimates depend on
    * Spark's CMS hash seeds, which a cross-engine oracle can't replay;
    * the exact twin for the same question is q77 (vocab top-k). */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int = 20,
                   eps: Double = 0.0001, confidence: Double = 0.99,
                   candidatesPerPartition: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)

    val sketchBytes = vals
      .agg(count_min_sketch(col("v"), lit(eps), lit(confidence),
        lit(42)).as("s"))
      .head().getAs[Array[Byte]]("s")
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val bc = spark.sparkContext.broadcast(sketch)

    val candidates = vals.as[String].mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach(v => counts.update(v, counts.getOrElse(v, 0L) + 1L))
      counts.toSeq.sortBy { case (v, n) => (-n, v) }
        .take(candidatesPerPartition).map(_._1).iterator
    }.distinct()

    candidates.map { v =>
      (v, bc.value.estimateCount(v))
    }.toDF(valueCol, "est_n")
      .orderBy(col("est_n").desc, col(valueCol))
      .limit(k)
  }

  /** EXACT twin of [[corpusProfile]] — same columns, exact
    * `count(distinct)` + interpolated `percentile` (the Spark/DuckDB
    * shared linear-interpolation definition, q63). State grows with
    * cardinality, so this is the verification/small-SF path that
    * anchors the sketch profile's semantics cross-engine; the sketch
    * variant is the 100 TB path. 4dp rounding on the percentiles makes
    * the doubles hash-exact against the oracle. */
  def corpusProfileExact(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("nd_sources"),
        countDistinct(col("doc_id")).as("nd_docs"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("chars_q50"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("chars_q90"))
}
