package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index: the k-means coarse
  * quantizer and the cell-assigned corpus, split out of the one-shot
  * [[Similarity.ivfTopK]] so the expensive parts — the fit and the
  * full-corpus assignment — are BUILT ONCE and reused across query
  * batches (the ops shape of a real vector store: index nightly, query
  * all day).
  *
  * On disk the cells are parquet PARTITIONED BY cell, so a probe that
  * visits `nProbe` of `nCentroids` cells prunes the scan to those
  * directories — the index read is proportional to the probed
  * fraction, not the corpus ([[search]] with `pruneCells = true`
  * collects the probed cell set — bounded by queries×nProbe — into a
  * literal IN filter that hits the partition column). Centroids are a
  * k-row table, always broadcast.
  *
  * Search semantics are IDENTICAL to [[Similarity.ivfTopK]] (which now
  * delegates here): rank cells per query by 4dp centroid cosine with
  * cell-id tiebreak, score the probed cells' members, two-phase top-k.
  * With `nProbe = nCentroids` the result provably equals brute force —
  * the hash-oracle anchor (q57b) — and the persisted round trip is
  * spec-pinned bit-equal to the in-memory path.
  */
object IvfIndex {

  /** Fit the coarse quantizer and assign every corpus vector to its
    * cell. Returns (centroids: cell|centroid, cells:
    * neighbor_id|cvec|cell). One KMeans fit + one map-side
    * model.transform — the only corpus-volume passes in the build. */
  def build(corpus: DataFrame, nCentroids: Int = 16,
            vecCol: String = "embedding", idCol: String = "vec_id",
            seed: Long = 42L): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("cvec"))
    val featurized = base.withColumn("features",
      array_to_vector(col("cvec")))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(featurized)
    val cells = model.transform(featurized)
      .select(col("neighbor_id"), col("cvec"), col("cell"))
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.toSeq)
    }
    val centroidDf = corpus.sparkSession
      .createDataFrame(centroids.toIndexedSeq).toDF("cell", "centroid")
    (centroidDf, cells)
  }

  /** Incrementally add `delta` vectors to an existing index WITHOUT
    * re-clustering — the standard IVF maintenance op (centroids stay
    * fixed between periodic re-trains; cells grow). Each new vector
    * is assigned to its nearest centroid by squared EUCLIDEAN
    * distance with ties to the LOWEST cell id — the same argmin rule
    * as the build's KMeans assignment (first-wins over the ascending
    * cluster array), so an added vector lands where the build would
    * have put it. Returns the grown cells frame (the centroids are
    * unchanged by construction).
    *
    * Scale: one broadcast of the k-row centroid table against the
    * delta (map-side partial `min(struct(dist, cell))` hash
    * aggregate — no window, no k× shuffle), one delta-sized join to
    * recover the vector, one union. The probe-all degenerate over
    * the grown index provably equals brute force over the union
    * corpus — the q345 hash-oracle anchor. */
  def add(centroids: DataFrame, cells: DataFrame, delta: DataFrame,
          vecCol: String = "embedding",
          idCol: String = "vec_id"): DataFrame = {
    val d = delta.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("cvec"))
    val dist2 = aggregate(
      zip_with(col("cvec"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, v) => a + v)
    val assign = d.join(broadcast(centroids))
      .select(col("neighbor_id"),
        struct(dist2.as("d"), col("cell").as("cell")).as("_dc"))
      .groupBy(col("neighbor_id"))
      .agg(min(col("_dc")).as("_m"))
      .select(col("neighbor_id"), col("_m.cell").as("cell"))
    cells.unionByName(
      d.join(assign, Seq("neighbor_id"))
        .select(col("neighbor_id"), col("cvec"), col("cell")))
  }

  /** Persist an index: centroids as one tiny parquet, cells
    * partitioned by cell id (the directory layout IS the inverted
    * file). */
  def save(centroids: DataFrame, cells: DataFrame, dir: String): Unit = {
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    cells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/cells")
  }

  /** Reopen a saved index. The cells scan stays lazy — filters on
    * `cell` placed before any shuffle prune whole directories. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/cells")
        .select(col("neighbor_id"), col("cvec"), col("cell")))

  /** Query an index (in-memory or loaded): rank cells per query by
    * centroid cosine, score members of the top-`nProbe` cells, exact
    * two-phase top-k on the candidates. With `pruneCells`, the probed
    * cell set (≤ queries×nProbe ids, bounded) is collected into a
    * literal IN filter so a partitioned on-disk index scans only the
    * probed directories. */
  def search(centroids: DataFrame, cells: DataFrame, queries: DataFrame,
             k: Int = 10, nProbe: Int = 4,
             vecCol: String = "embedding", idCol: String = "vec_id",
             pruneCells: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qvec")))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        Similarity.cosine(col("qvec"), col("centroid")))
      .withColumn("crank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell"))

    val candidateCells =
      if (!pruneCells) cells
      else {
        val probed = probes.select("cell").distinct()
          .collect().map(_.get(0))
        cells.filter(col("cell").isin(probed.toIndexedSeq: _*))
      }

    val scored = candidateCells.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qvec"), col("cvec")).as("sim"))
    Similarity.topKPerKey(scored, k)
  }
}
