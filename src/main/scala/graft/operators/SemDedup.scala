package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication and diversification for
  * training-corpus curation, after SemDeDup (Abbas et al. 2023,
  * arXiv:2303.09540) and D4 (Tirumala et al. 2023, arXiv:2308.12284):
  * cluster the embedding space with k-means, then prune WITHIN each
  * cluster — near-duplicates first (cosine ≥ τ against a clustermate),
  * then optionally the most prototypical survivors (closest to their
  * centroid), keeping the diverse tail.
  *
  * Scale shape (the whole point of the cluster-first design):
  *  - Centroids are tiny (k×d doubles, bounded by construction) — they
  *    ride along as a broadcast literal, so ASSIGNMENT is a pure
  *    map-side argmax: one codegen'd pass over the corpus, no shuffle,
  *    no join.
  *  - Lloyd refinement shuffles only (cluster, dim) partial sums —
  *    map-side combined, k×d rows per partition — per iteration.
  *  - The near-dup search is a self-join ON THE CLUSTER KEY: pair
  *    generation shuffles by cluster and is quadratic only in cluster
  *    size (n/k expected), never in n. That is SemDeDup's own cost
  *    model; raise k (the paper runs k=11k for 100M points) to keep
  *    clusters bounded, and the per-cluster work stays flat as the
  *    corpus grows. A pathologically hot cluster is a data smell the
  *    cluster-size histogram in the output makes visible; the LSH
  *    variant ([[Dedup.embeddingNearDupGroups]] strategy="lsh") is the
  *    escape hatch if one appears.
  *
  * Determinism: centroid seeding is the k smallest ids (no RNG), all
  * similarity comparisons go through the 4dp-rounded fused cosine
  * kernel ([[Similarity.cosine]], bit-equal to DuckDB's
  * `list_cosine_similarity` + round), ties break on ids. With
  * `lloydIters = 0` the whole operator is exact relational algebra over
  * the input table and is oracle-checked end-to-end (q107/q109);
  * refined centroids keep every downstream rule identical and are
  * pinned by invariance specs instead.
  */
object SemDedup {

  private def idCol = "vec_id"

  /** Deterministic seed centroids: the embeddings of the k smallest
    * ids, labeled by their id. (SemDeDup itself is insensitive to init
    * quality — the clusters only bound the candidate search — so a
    * reproducible seed beats a random one for an auditable pipeline.) */
  def seedCentroids(embeddings: DataFrame, k: Int,
                    vecCol: String = "embedding"): Array[(Long, Array[Double])] =
    embeddings
      .select(col(idCol).cast("long"), Similarity.asDouble(col(vecCol)))
      .orderBy(col(idCol)).limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Centroid array as a single literal column of
    * `array<struct<cluster:bigint, c:array<double>>>` — the broadcast
    * side of the map-side assignment. k×d literals in the plan; fine
    * for the k ≤ a few thousand this operator targets per the paper. */
  private def centroidLit(cs: Array[(Long, Array[Double])]): Column =
    array(cs.map { case (id, v) =>
      struct(lit(id).as("cluster"),
        array(v.map(lit(_)).toIndexedSeq: _*).as("c"))
    }.toIndexedSeq: _*)

  /** Map-side argmax assignment: for each vector, the centroid with the
    * highest 4dp cosine, ties to the smallest cluster id. One
    * `transform` + `array_max` over the centroid literal — no shuffle.
    * Output: (vec_id, vec, cluster, centroid_sim). */
  def assign(embeddings: DataFrame, centroids: Array[(Long, Array[Double])],
             vecCol: String = "embedding"): DataFrame = {
    val sims = transform(centroidLit(centroids), ctr =>
      struct(Similarity.cosine(col("vec"), ctr.getField("c")).as("sim"),
        // struct max is lexicographic: sim first, then -cluster so the
        // SMALLEST cluster id wins similarity ties
        (-ctr.getField("cluster")).as("negc")))
    embeddings
      .select(col(idCol).cast("long").as(idCol),
        Similarity.asDouble(col(vecCol)).as("vec"))
      .withColumn("best", array_max(sims))
      .select(col(idCol), col("vec"),
        (-col("best.negc")).as("cluster"),
        col("best.sim").as("centroid_sim"))
  }

  /** `iters` rounds of Lloyd refinement on the seed centroids.
    * Each round: map-side assignment (above), then the element-wise
    * mean per cluster as a (cluster, dim) partial-sum aggregation —
    * posexplode flattens to scalar rows so hash aggregation map-side
    * combines them; the shuffle carries k×d rows per partition, same
    * byte volume as the vectors themselves, and the result collapses
    * to k rows. Means are rounded to 6dp so the refined centroids are
    * insensitive to reduce order (avg of doubles is not associative). */
  def lloyd(embeddings: DataFrame, k: Int, iters: Int,
            vecCol: String = "embedding"): Array[(Long, Array[Double])] = {
    var cs = seedCentroids(embeddings, k, vecCol)
    for (_ <- 0 until iters) {
      val assigned = assign(embeddings, cs, vecCol)
      val refined = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(round(avg(col("x")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
          .as("dm"))
        .select(col("cluster"),
          transform(col("dm"), e => e.getField("m")).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // a cluster that lost all members keeps its previous centroid
      val refinedIds = refined.map(_._1).toSet
      cs = (refined ++ cs.filterNot(c => refinedIds.contains(c._1)))
        .sortBy(_._1)
    }
    cs
  }

  /** SemDeDup proper: assign, then drop any example that has a
    * same-cluster neighbor with cosine ≥ `tau` that is STRICTLY less
    * prototypical (lower centroid similarity; ties to the smaller id).
    * Equivalently: of each mutually-duplicate neighborhood, the example
    * farthest from its centroid survives — the paper's "keep examples
    * with low similarity to the centroid" rule made deterministic as a
    * pairwise domination test (no iterative clustering of the dup
    * graph needed, one self-join + one aggregation).
    *
    * Output: (vec_id, cluster, centroid_sim, kept) for EVERY input row
    * — callers filter `kept` to materialize the pruned corpus; keeping
    * the dropped rows visible makes the prune auditable.
    */
  def semanticDedup(embeddings: DataFrame, k: Int, tau: Double,
                    lloydIters: Int = 0,
                    vecCol: String = "embedding"): DataFrame = {
    val cs =
      if (lloydIters == 0) seedCentroids(embeddings, k, vecCol)
      else lloyd(embeddings, k, lloydIters, vecCol)
    val asg = assign(embeddings, cs, vecCol)

    val left = asg.select(col("cluster"), col(idCol), col("vec"),
      col("centroid_sim"))
    val right = asg.select(col("cluster").as("other_cluster"),
      col(idCol).as("other_id"), col("vec").as("other_vec"),
      col("centroid_sim").as("other_sim"))

    // shuffles both sides by cluster once; pair volume is Σ n_c², never n²
    val dominated = left.join(right,
        col("cluster") === col("other_cluster") &&
          col(idCol) =!= col("other_id") &&
          (col("other_sim") < col("centroid_sim") ||
            (col("other_sim") === col("centroid_sim") &&
              col("other_id") < col(idCol))))
      .filter(Similarity.cosine(col("vec"), col("other_vec")) >= tau)
      .select(col(idCol)).distinct()
      .withColumn("dropped", lit(true))

    asg.join(dominated, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("centroid_sim"),
        coalesce(col("dropped"), lit(false)).unary_!.as("kept"))
  }

  /** D4-style diversification on top of the dedup: within each cluster,
    * keep the `keepFraction` of SURVIVORS farthest from their centroid
    * (lowest centroid similarity — the diverse tail; prototypical
    * near-centroid examples go first, per D4's finding that they are
    * the least valuable to train on). `ceil` so every non-empty
    * cluster keeps at least one example.
    *
    * One window per cluster over the deduped survivors — the window
    * key is the cluster, so this shuffles once and never concentrates
    * more than a cluster on one task. */
  def diversify(deduped: DataFrame, keepFraction: Double): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
    val byDiversity = Window.partitionBy(col("cluster"))
      .orderBy(col("centroid_sim").asc, col(idCol).asc)
    deduped.filter(col("kept"))
      .withColumn("rk", row_number().over(byDiversity))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rk") <= ceil(col("n") * lit(keepFraction)))
      .select(col(idCol), col("cluster"), col("centroid_sim"))
  }
}
