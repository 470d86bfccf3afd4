package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the compression layer
  * between int8 codes ([[Similarity.quantizeInt8]], 4×) and the IVF
  * coarse index ([[IvfIndex]]): each vector is split into `m`
  * contiguous subvectors and every subvector is replaced by the id of
  * its nearest centroid in a per-subspace codebook of `k` entries, so
  * a 64-dim float32 embedding stores as `m` small ints (m=8, k=16 →
  * 8 nibbles = 32× smaller than float32). Search never reconstructs:
  * ADC (asymmetric distance computation) builds one m×k lookup table
  * of exact query-subvector→centroid distances per query, and the
  * distance to any corpus vector is `m` table lookups summed.
  *
  * Reference scope: the reference engine ships no ANN at all — this is
  * part of the training-data north star surface (SURVEY §6), next to
  * brute-force kNN (q35), IVF (q57), JL projection (q97/q98) and int8
  * quantized search (q92).
  *
  * Scale shape: training touches only (subspace, subvector) rows —
  * the Lloyd loop is a broadcast-assign (map-side, codebooks are
  * m×k×(d/m) doubles in the plan) plus one tiny groupBy per
  * iteration; encode is a pure map with zero shuffle; ADC search
  * broadcasts queries (with their distance tables) against the codes
  * table and runs the two-phase [[Similarity.topKPerKey]] merge — no
  * reducer ever holds more than partitions×k candidates. The codes
  * table is the only corpus-volume operand and it is m small ints per
  * row, so the scan side of a 100 TB search is ~32× cheaper than the
  * raw embedding scan.
  *
  * Determinism: codebook init is the first `k` DISTINCT subvectors per
  * subspace in md5 order of their rendering (seeded), Lloyd
  * assignments break distance ties on the lowest centroid id, and
  * empty cells keep their previous centroid — every step is a pure
  * function of (corpus, m, k, seed, iters). When `k` covers every
  * distinct subvector the init IS the exact codebook (each subvector
  * is its own centroid at distance 0), Lloyd is a fixed point, ADC
  * degenerates to EXACT L2 search — the q117b hash-oracle anchor,
  * mirroring the q57b nProbe=all pattern.
  */
object ProductQuantizer {

  /** Trained codebooks: `books(s)(j)` is centroid `j` of subspace `s`,
    * each of length `dim / m`. */
  final case class Codebooks(dim: Int, m: Int,
                             books: Seq[Seq[Seq[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim: Int = dim / m
    def k: Int = books.map(_.size).max
  }

  private[operators] def bookLit(book: Seq[Seq[Double]]): Column =
    array(book.map(c => array(c.map(lit): _*)): _*)

  /** Squared L2 distance between two double-array columns —
    * left-to-right accumulation (the portability order every oracle
    * bridge in this repo assumes). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** (subspace, subvector) rows — the only training-side reshaping;
    * map-side (explode of an m-element array per row). Vectors shorter
    * than `dim` quarantine whole (matching [[encode]]'s null rule). */
  private def subvectors(corpus: DataFrame, dim: Int, m: Int,
                         vecCol: String): DataFrame = {
    val subDim = dim / m
    val v = Similarity.asDouble(col(vecCol))
    corpus
      .filter(size(v) >= dim)
      .select(explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          slice(v, s * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("e.s").as("s"), col("e.sv").as("sv"))
  }

  /** Train per-subspace codebooks with Lloyd's algorithm.
    *
    * Init: the first `k` distinct subvectors per subspace, ordered by
    * the md5 of `seed|subspace|rendered-subvector` — deterministic,
    * data-independent of partitioning, and uniform-ish across the
    * corpus. Each iteration broadcast-assigns every subvector to its
    * nearest centroid (strict `<`, so ties keep the lowest id) and
    * recomputes per-cell means with one small groupBy; cells that
    * lose all members keep their previous centroid. Centroid state is
    * m×k×subDim doubles on the driver — never corpus-sized. */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
            iters: Int = 8, seed: Long = 42L,
            vecCol: String = "embedding"): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sub = subvectors(corpus, dim, m, vecCol)
      .filter(size(col("sv")) === subDim)

    // deterministic seeded init: first k distinct subvectors per
    // subspace in md5 order (k×m rows collected — bounded)
    val initRows = sub.distinct()
      .withColumn("h", md5(concat_ws("|", lit(seed.toString), col("s"),
        concat_ws(",", transform(col("sv"), x => x.cast("string"))))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("s")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("s"), col("rn"), col("sv"))
      .collect()
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      initRows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    }

    // Lloyd assignment via the fused native kernel (one generated
    // m×k×subDim loop per row — the composed aggregate/zip_with argmin
    // evaluates interpreted and measured ~6× slower at 32×); the
    // per-cell means are a tiny groupBy on (subspace, code)
    val vbase = corpus.select(Similarity.asDouble(col(vecCol)).as("v"))
      .filter(size(col("v")) >= dim)
    var it = 0
    var moved = true
    while (it < iters && moved) {
      val cb = Codebooks(dim, m, books)
      val assigned = vbase
        .select(col("v"), posexplode(graft.plans.PqExpressions
          .pqEncode(col("v"), cb.books, subDim)).as(Seq("s", "code")))
        .select(col("s"), col("code"),
          slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("sv"))
      val meansRows = assigned.groupBy(col("s"), col("code"))
        .agg(count(lit(1)).as("n"),
          array((0 until subDim).map(i =>
            avg(col("sv")(i))): _*).as("mean"))
        .collect()
      val next = (0 until m).map { s =>
        val cell = meansRows.filter(r => r.getInt(0) == s)
          .map(r => r.getInt(1) -> r.getSeq[Double](3).toIndexedSeq)
          .toMap
        books(s).indices.map(j => cell.getOrElse(j, books(s)(j)))
      }
      moved = next != books
      books = next
      it += 1
    }
    Codebooks(dim, m, books)
  }

  /** Encode every vector as its m-code array — pure map, zero
    * shuffle; the codebooks ride in the plan inside the fused
    * [[graft.plans.PqEncode]] kernel (strict `<` argmin, lowest code
    * on ties — identical to the Lloyd assignment). Vectors shorter
    * than the trained dim yield null codes (quarantine). */
  def encode(corpus: DataFrame, cb: Codebooks,
             vecCol: String = "embedding",
             idCol: String = "vec_id"): DataFrame = {
    val v = Similarity.asDouble(col(vecCol))
    corpus.select(col(idCol), graft.plans.PqExpressions
      .pqEncode(v, cb.books, cb.subDim).as("codes"))
  }

  /** Per-vector PQ reconstruction error — the storage-side
    * quantization-quality readout next to the retrieval-side ones
    * (ANN recall@k, per-query RBO): decode each code array through
    * the codebook literals, then the 4dp L2 between original and
    * reconstruction. The number that prices (m, k) against corpus
    * bytes. Map-side decode (books ride as literals, m lookups +
    * one flatten per row) + one id join; rows whose vectors didn't
    * encode (the [[encode]] null rule) are skipped. The distance
    * recompute is per-row independent REPORTING, so the oracle may
    * recompute it (the PLANS.md cosine-site rule); the codes and
    * books themselves are staged by the q354 gate. */
  def reconstructionError(corpus: DataFrame, cb: Codebooks,
                          codes: DataFrame,
                          vecCol: String = "embedding",
                          idCol: String = "vec_id"): DataFrame = {
    val rec = flatten(array((0 until cb.m).map { s =>
      element_at(bookLit(cb.books(s)),
        element_at(col("codes"), s + 1) + 1)
    }: _*))
    corpus.select(col(idCol), Similarity.asDouble(col(vecCol)).as("_v"))
      .join(codes.select(col(idCol), col("codes"))
        .filter(col("codes").isNotNull), Seq(idCol))
      .select(col(idCol),
        round(sqrt(sqDist(col("_v"), rec)), 4).as("l2_distortion"))
  }

  /** ADC top-k: per query ONE m×k table of exact
    * subvector→centroid squared distances (map-side over the tiny
    * query frame, then broadcast), so scoring a corpus row is m
    * lookups + m adds over its code array — never touches floats of
    * the corpus. Output: (query_id, rank, neighbor_id, dist) with
    * dist = 4dp-rounded L2, ranked ascending with id tiebreak via the
    * two-phase [[Similarity.topKPerKey]] merge. */
  def adcSearch(codes: DataFrame, queries: DataFrame, cb: Codebooks,
                k: Int = 10, vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    val qv = Similarity.asDouble(col(vecCol))
    val dtab = array((0 until cb.m).map { s =>
      val qsub = slice(qv, s * cb.subDim + 1, cb.subDim)
      transform(bookLit(cb.books(s)), c => sqDist(qsub, c))
    }: _*)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      dtab.as("dtab")))
    // scoring = the fused table-lookup sum (same left-to-right order
    // as the composed aggregate it replaced — q117b stays bit-equal)
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .filter(col("codes").isNotNull)
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-round(sqrt(graft.plans.PqExpressions
          .adcSqDist(col("codes"), col("dtab"))), 4)).as("sim"))
    Similarity.topKPerKey(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(-col("sim"), 4).as("dist"))
  }

  /** Train + encode + search in one shot (the q117 entry point). With
    * `k` ≥ the distinct subvector count per subspace this is EXACTLY
    * brute-force L2 top-k (init covers every subvector at distance 0;
    * Lloyd is a fixed point; ADC sums exact per-subspace distances) —
    * the q117b oracle anchor. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, dim: Int,
             m: Int = 8, k: Int = 16, topK: Int = 10, iters: Int = 8,
             seed: Long = 42L, vecCol: String = "embedding",
             idCol: String = "vec_id"): DataFrame = {
    val cb = train(corpus, dim, m, k, iters, seed, vecCol)
    adcSearch(encode(corpus, cb, vecCol, idCol), queries, cb, topK,
      vecCol, idCol)
  }
}
