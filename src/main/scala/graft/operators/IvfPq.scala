package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ProductQuantizer.Codebooks

/** IVF-PQ: the composed ANN index (Jégou et al. 2011 §V, the FAISS
  * `IndexIVFPQ` architecture) — the coarse k-means inverted file
  * ([[IvfIndex]]) prunes the search to `nProbe` cells, and inside each
  * cell vectors are stored as product-quantized codes of their RESIDUAL
  * against the cell centroid (residuals are centered near zero, so the
  * same codebook budget quantizes them far more accurately than raw
  * vectors). One codebook is shared across cells (the FAISS default).
  * Search re-ranks an ADC shortlist against the original vectors — the
  * `IndexRefineFlat` pattern — so the PQ approximation bounds RECALL,
  * not the reported distances.
  *
  * Reference scope: the reference engine ships no ANN (SURVEY §6 north
  * star) — this completes the ladder brute-force (q35) → IVF (q57) →
  * PQ/ADC (q117) → IVF-PQ (q146).
  *
  * Scale shape: the scan side of a search is the CODES table (m small
  * ints per row, ~32× under the raw floats) of the probed cells only;
  * the per-(query, probed-cell) residual distance tables are built
  * map-side over a bounded queries×nProbe frame and broadcast. The
  * re-rank touches original vectors for shortlist ids only — a
  * broadcast semi-join against the corpus, never a corpus shuffle.
  *
  * Exactness anchor (q146b, the q57b/q117b pattern): with
  * `nProbe = nCentroids` every candidate is scored, and with the
  * shortlist covering the whole corpus the re-rank IS brute-force L2 —
  * ||q−x|| is computed from the original vectors, so the PQ layer
  * cannot perturb it. Hash-oracled against DuckDB `list_distance`.
  */
object IvfPq {

  /** Fit coarse quantizer + assign cells ([[IvfIndex.build]]), compute
    * per-vector residuals against the assigned centroid, train ONE
    * shared residual codebook, and encode. Returns
    * (centroids `cell|centroid`, codes `neighbor_id|cell|codes`,
    * codebooks). Training cost beyond IVF: the PQ Lloyd loop over
    * (subspace, residual-subvector) rows — map-side explode, tiny
    * per-cell mean aggregates. */
  def build(corpus: DataFrame, dim: Int, nCentroids: Int = 16,
            m: Int = 8, k: Int = 16, iters: Int = 8, seed: Long = 42L,
            vecCol: String = "embedding", idCol: String = "vec_id")
      : (DataFrame, DataFrame, Codebooks) = {
    val (centroids, cells) =
      IvfIndex.build(corpus, nCentroids, vecCol, idCol, seed)
    val residuals = cells.join(broadcast(centroids), Seq("cell"))
      .select(col("neighbor_id"), col("cell"),
        zip_with(col("cvec"), col("centroid"), (x, c) => x - c)
          .as("rvec"))
    val cb = ProductQuantizer.train(residuals, dim, m, k, iters, seed,
      vecCol = "rvec")
    val codes = residuals.select(col("neighbor_id"), col("cell"),
      graft.plans.PqExpressions.pqEncode(col("rvec"), cb.books,
        cb.subDim).as("codes"))
    (centroids, codes, cb)
  }

  /** Incremental IVF-PQ maintenance: encode `delta` into an existing
    * index WITHOUT re-training — the compressed sibling of
    * [[IvfIndex.add]]. Coarse assignment reuses IvfIndex.add's exact
    * argmin rule verbatim (fed an empty prior-cells frame so only the
    * delta's assignments come back); residuals are taken against the
    * assigned centroid and coded with the FROZEN codebooks, exactly
    * as [[build]] codes its own corpus. Returns the grown codes frame
    * (existing codes untouched — append-only maintenance under the
    * [[save]] layout).
    *
    * Scale: one k-row centroid broadcast + one delta-sized join; the
    * index side contributes nothing until the union. Probe-all +
    * full-coverage refine over the grown index provably equals brute
    * force over the union corpus — the exact re-rank reads original
    * vectors, so codebook quality cannot perturb it (the q146b
    * argument, hash-anchored by q349 for THIS path: even a delta
    * whose residuals lie nowhere near the trained books must come
    * back exact). */
  def add(centroids: DataFrame, codes: DataFrame, cb: Codebooks,
          delta: DataFrame, vecCol: String = "embedding",
          idCol: String = "vec_id"): DataFrame = {
    val noPrior = delta.select(col(idCol).as("neighbor_id"),
        Similarity.asDouble(col(vecCol)).as("cvec"))
      .crossJoin(broadcast(centroids.select(col("cell"))))
      .limit(0) // schema-only: (neighbor_id, cvec, cell)
    val assigned = IvfIndex.add(centroids, noPrior, delta, vecCol, idCol)
    codes.unionByName(assigned.join(broadcast(centroids), Seq("cell"))
      .select(col("neighbor_id"), col("cell"),
        graft.plans.PqExpressions.pqEncode(
          zip_with(col("cvec"), col("centroid"), (x, c) => x - c),
          cb.books, cb.subDim).as("codes")))
  }

  /** Persist an index: centroids + codebooks as tiny parquets, codes
    * PARTITIONED BY cell — the directory layout IS the inverted file,
    * so a probed search reads only the probed cells' directories
    * ([[IvfIndex.save]] layout, with the codebook rows alongside). */
  def save(centroids: DataFrame, codes: DataFrame, cb: Codebooks,
           dir: String): Unit = {
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/codes")
    val spark = centroids.sparkSession
    import spark.implicits._
    cb.books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c) }
    }.toDF("s", "j", "sub").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Reopen a saved index. The codes scan stays lazy — `cell` filters
    * prune whole directories. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, DataFrame, Codebooks) = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("neighbor_id"), col("cell"), col("codes"))
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("s").cast("int"), col("j").cast("int"), col("sub"))
      .collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    }
    val subDim = books.head.head.size
    (centroids, codes, Codebooks(m * subDim, m, books))
  }

  /** Search: rank cells per query by exact centroid L2 (ascending,
    * cell-id tiebreak), residualize the query against each probed
    * centroid, ADC-score that cell's codes with the per-(query, cell)
    * lookup table, keep a `topK·refine` shortlist, then re-rank the
    * shortlist EXACTLY against the original vectors. Output
    * (query_id, rank, neighbor_id, dist) with dist = 4dp L2, ranked
    * ascending with id tiebreak — the [[ProductQuantizer.adcSearch]]
    * contract. */
  def search(centroids: DataFrame, codes: DataFrame, cb: Codebooks,
             queries: DataFrame, corpus: DataFrame, topK: Int = 10,
             nProbe: Int = 4, refine: Int = 4,
             vecCol: String = "embedding", idCol: String = "vec_id",
             pruneCells: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qvec"))

    // probed (query, cell) pairs with the query residual — bounded at
    // queries×nProbe rows, all map-side over broadcast centroids
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        ProductQuantizer.sqDist(col("qvec"), col("centroid")))
      .withColumn("crank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("cdist"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cell"),
        zip_with(col("qvec"), col("centroid"), (x, c) => x - c)
          .as("qr"))

    // per-(query, cell) ADC table: m×k exact residual-subvector →
    // centroid squared distances
    val dtab = array((0 until cb.m).map { s =>
      val qsub = slice(col("qr"), s * cb.subDim + 1, cb.subDim)
      transform(ProductQuantizer.bookLit(cb.books(s)),
        c => ProductQuantizer.sqDist(qsub, c))
    }: _*)
    val ptab = broadcast(probes.withColumn("dtab", dtab)
      .select(col("query_id"), col("cell"), col("dtab")))

    // with pruneCells (on-disk index): the probed cell ids — bounded
    // by queries×nProbe — become a literal IN filter on the partition
    // column, so only probed directories are read ([[IvfIndex.search]]
    // pattern)
    val candidateCodes =
      if (!pruneCells) codes
      else {
        val probed = ptab.select("cell").distinct()
          .collect().map(_.get(0))
        codes.filter(col("cell").isin(probed.toIndexedSeq: _*))
      }

    // ADC scoring: the codes scan joins the broadcast tables on cell —
    // no shuffle of the codes table; candidates are probed cells only
    val scored = candidateCodes.filter(col("codes").isNotNull)
      .join(ptab, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-graft.plans.PqExpressions.adcSqDist(col("codes"),
          col("dtab"))).as("sim"))
    val shortlist = Similarity.topKPerKey(scored, topK * refine)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank (IndexRefineFlat): shortlist ids are bounded
    // (queries×topK×refine) — broadcast against the corpus scan
    val orig = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("cvec"))
    val exact = broadcast(shortlist).join(orig, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(sqrt(ProductQuantizer.sqDist(col("qvec"), col("cvec"))),
          4).as("dist"))
    exact
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dist"))
  }

  /** Build + search in one shot (the q146 entry point). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, dim: Int,
                nCentroids: Int = 16, m: Int = 8, k: Int = 16,
                topK: Int = 10, nProbe: Int = 4, refine: Int = 4,
                iters: Int = 8, seed: Long = 42L,
                vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    val (centroids, codes, cb) = build(corpus, dim, nCentroids, m, k,
      iters, seed, vecCol, idCol)
    search(centroids, codes, cb, queries, corpus, topK, nProbe, refine,
      vecCol, idCol)
  }
}
