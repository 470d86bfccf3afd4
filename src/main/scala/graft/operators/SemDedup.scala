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
  *    corpus grows. By default the join is additionally BLOCKED
  *    (`maxBlock`): a hot cluster is split into bounded blocks joined
  *    pairwise, so one degenerate cluster parallelizes across the
  *    fleet instead of pinning a straggler task — total pair work is
  *    unchanged (it is inherent to the semantics), but no single task
  *    carries more than ~2·maxBlock rows. If even the total pair
  *    volume is unaffordable, the LSH candidate generator
  *    ([[Dedup.embeddingNearDupGroups]] strategy="lsh") is the
  *    recall-trading escape hatch.
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

  /** The session's configured shuffle parallelism — used as an
    * EXPLICIT repartition count where AQE's input-size coalescing
    * would under-parallelize a high-fan-out pair join. */
  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

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

  /** Map-side argmax assignment: for each vector, the centroid with the
    * highest 4dp cosine, ties to the smallest cluster id. The centroid
    * matrix rides along as a reference object inside ONE fused native
    * kernel ([[graft.plans.ArgMaxCosine]]) — no shuffle, no join, one
    * generated loop per row (the HOF `transform`+`array_max`
    * formulation re-read the vector k times and grew with k even as
    * the downstream join shrank; ScaleCheck measured the kernel
    * replacing it). Output: (vec_id, vec, cluster, centroid_sim). */
  def assign(embeddings: DataFrame, centroids: Array[(Long, Array[Double])],
             vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol).cast("long").as(idCol),
        Similarity.asDouble(col(vecCol)).as("vec"))
      .withColumn("best",
        graft.plans.VectorExpressions.argMaxCosine(col("vec"), centroids))
      .select(col(idCol), col("vec"),
        col("best.cluster").as("cluster"),
        col("best.sim").as("centroid_sim"))

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
                    vecCol: String = "embedding",
                    maxBlock: Int = 2048): DataFrame = {
    val cs =
      if (lloydIters == 0) seedCentroids(embeddings, k, vecCol)
      else lloyd(embeddings, k, lloydIters, vecCol)
    val asg = assign(embeddings, cs, vecCol)
    val dominated = dominatedSet(asg, tau, maxBlock)
    asg.join(dominated, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("centroid_sim"),
        coalesce(col("dropped"), lit(false)).unary_!.as("kept"))
  }

  /** Ids with a same-cluster dominating near-dup (see
    * [[semanticDedup]]). With `maxBlock = 0` the candidate join keys
    * on the cluster alone: one shuffle per side, pair volume Σ n_c² —
    * fine while k keeps clusters bounded. `maxBlock > 0` is the
    * HOT-CLUSTER armor: rows are hashed into ⌈n_c/maxBlock⌉ blocks per
    * cluster and the join keys on (cluster, blockLo, blockHi) over all
    * unordered block pairs, so NO TASK ever holds more than ~2·maxBlock
    * rows or ~4·maxBlock² candidate pairs — a million-row degenerate
    * cluster becomes many bounded tasks instead of one 10¹²-pair
    * straggler. Replication cost is B copies of each row (the
    * standard blocked all-pairs trade); results are identical
    * (spec-pinned), since every intra-cluster pair lands in exactly
    * one block pair. */
  private def dominatedSet(asg: DataFrame, tau: Double,
                           maxBlock: Int): DataFrame = {
    val domination =
      (col("other_sim") < col("centroid_sim") ||
        (col("other_sim") === col("centroid_sim") &&
          col("other_id") < col(idCol)))

    val pairs = if (maxBlock <= 0) {
      // repartition by the join key BEFORE the self-join: the exchange
      // was needed anyway, and placing it above the assignment
      // MATERIALIZES the argmax kernel once per row. Without the
      // boundary, whole-stage codegen defers stream-side projections
      // referenced only by the join condition into the per-match check
      // — re-running the k×d kernel once per candidate PAIR (measured:
      // a k=64 run that completes in seconds map-side spun >10 min of
      // CPU inside the join loop). The partition count is EXPLICIT:
      // AQE's size-based coalescing sees the small pre-join input, not
      // the quadratic pair fan-out, and would collapse the join to one
      // task (measured 510 s single-task vs seconds wide).
      val mat = asg.repartition(shufflePartitions(asg), col("cluster"))
      val left = mat.select(col("cluster"), col(idCol), col("vec"),
        col("centroid_sim"))
      val right = mat.select(col("cluster").as("other_cluster"),
        col(idCol).as("other_id"), col("vec").as("other_vec"),
        col("centroid_sim").as("other_sim"))
      left.join(right,
        col("cluster") === col("other_cluster") &&
          col(idCol) =!= col("other_id") && domination)
    } else {
      // per-cluster block count from one tiny size aggregate
      // (k rows, broadcast back)
      val sizes = asg.groupBy(col("cluster"))
        .agg(ceil(count(lit(1)) / lit(maxBlock.toDouble))
          .cast("int").as("nb"))
      val blocked = asg.join(broadcast(sizes), Seq("cluster"))
        .withColumn("blk",
          pmod(xxhash64(col(idCol)), col("nb")).cast("int"))
      // replicate each row to every unordered block pair it is part
      // of: (min(blk,j), max(blk,j)) for j in [0, nb)
      val expanded = blocked.select(col("cluster"), col(idCol),
          col("vec"), col("centroid_sim"), col("blk"),
          explode(transform(sequence(lit(0), col("nb") - 1), j =>
            struct(least(col("blk"), j).as("lo"),
              greatest(col("blk"), j).as("hi")))).as("bp"))
        .select(col("cluster"), col(idCol), col("vec"),
          col("centroid_sim"), col("blk"),
          col("bp.lo").as("lo"), col("bp.hi").as("hi"))
      // same materialization discipline as the plain path: exchange by
      // the block-pair join key sits above the kernel + explode, with
      // the explicit partition count for the same fan-out reason
      val expandedMat = expanded.repartition(shufflePartitions(expanded),
        col("cluster"), col("lo"), col("hi"))
      val right = expandedMat.select(col("cluster").as("other_cluster"),
        col(idCol).as("other_id"), col("vec").as("other_vec"),
        col("centroid_sim").as("other_sim"),
        col("blk").as("other_blk"),
        col("lo").as("other_lo"), col("hi").as("other_hi"))
      // meeting-point discipline: a cross-block pair shares exactly
      // ONE key — the unordered pair of its two blocks; a same-block
      // pair would meet at EVERY key containing its block (nb× the
      // cosine work), so it is pinned to its diagonal key (b, b)
      expandedMat.join(right,
          col("cluster") === col("other_cluster") &&
            col("lo") === col("other_lo") &&
            col("hi") === col("other_hi") &&
            (col("blk") =!= col("other_blk") ||
              (col("lo") === col("blk") && col("hi") === col("blk"))) &&
            col(idCol) =!= col("other_id") && domination)
    }

    pairs
      .filter(Similarity.cosineAtLeast(col("vec"), col("other_vec"), tau))
      .select(col(idCol)).distinct()
      .withColumn("dropped", lit(true))
  }

  /** Incremental SemDeDup — the maintenance form of [[semanticDedup]]
    * (ingest a batch against frozen centroids + an immutable kept
    * corpus), completing the incremental triad with
    * `Dedup.incrementalByFingerprint` / `Dedup.incrementalLshDedup`
    * and `IvfIndex.add`.
    *
    * A batch example is dropped when (a) it has a same-cluster KEPT
    * corpus example with cosine ≥ `tau` — the corpus side always wins,
    * prototypicality notwithstanding, because history is immutable —
    * or (b) it is dominated WITHIN the batch by the standard
    * [[semanticDedup]] rule. Both verdicts are computed on the full
    * batch independently (no transitive re-evaluation through
    * state-dropped rows), so the prune is deterministic and auditable.
    *
    * `keptState` carries (`vec_id`, `vecCol`, cluster) for previously
    * KEPT examples — the side table a pipeline persists alongside the
    * centroids. Scale shape: the state is scanned once and probed by
    * the BROADCAST assigned batch on the cluster key (zero state
    * shuffle); only the within-batch self-join shuffles, with the
    * [[dominatedSet]] `maxBlock` hot-cluster armor.
    *
    * Output: (vec_id, cluster, centroid_sim, drop_reason, kept) for
    * every batch row; `drop_reason` ∈ ('state', 'batch', null), with
    * 'state' taking precedence when both apply. */
  def incrementalSemDedup(centroids: Array[(Long, Array[Double])],
                          keptState: DataFrame, batch: DataFrame,
                          tau: Double,
                          vecCol: String = "embedding",
                          maxBlock: Int = 2048): DataFrame = {
    Seq(idCol, vecCol, "cluster").foreach { c =>
      require(keptState.columns.contains(c),
        s"keptState missing column $c — persist (vec_id, $vecCol, " +
          "cluster) for kept examples")
    }
    val asgB = assign(batch, centroids, vecCol).localCheckpoint()
    val st = keptState.select(
      Similarity.asDouble(col(vecCol)).as("state_vec"), col("cluster"))
    val probe = asgB.select(col(idCol), col("vec"), col("cluster"))
    val droppedByState = st.join(broadcast(probe), Seq("cluster"))
      .filter(Similarity.cosineAtLeast(col("vec"), col("state_vec"), tau))
      .select(col(idCol)).distinct()
      .withColumn("_ds", lit(true))
    val droppedInBatch = dominatedSet(asgB, tau, maxBlock)
    asgB.join(droppedByState, Seq(idCol), "left")
      .join(droppedInBatch, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("centroid_sim"),
        when(coalesce(col("_ds"), lit(false)), "state")
          .when(coalesce(col("dropped"), lit(false)), "batch")
          .as("drop_reason"),
        (coalesce(col("_ds"), lit(false)) ||
          coalesce(col("dropped"), lit(false))).unary_!.as("kept"))
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
