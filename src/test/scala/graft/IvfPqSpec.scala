package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, ProductQuantizer, Similarity}

/** IVF-PQ composed index (q146): lossless in the probe-all +
  * full-shortlist regime, usefully accurate in the ANN regime, and the
  * codes scan never shuffles. */
class IvfPqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val corpus = emb.filter(col("vec_id") < 200)
  private lazy val queries = emb.filter(col("vec_id") < 5)

  /** Exact L2 top-k via plain DataFrame algebra — the spec's own
    * independent brute force (same rounding/tiebreak contract). */
  private def bruteL2(c: DataFrame, q: DataFrame, k: Int) = {
    val qs = q.select(col("vec_id").as("query_id"),
      Similarity.asDouble(col("embedding")).as("qvec"))
    val cs = c.select(col("vec_id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("cvec"))
    qs.crossJoin(cs).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(sqrt(ProductQuantizer.sqDist(col("qvec"), col("cvec"))),
          4).as("dist"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dist")
  }

  private def rows(df: DataFrame) =
    df.orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("probe-all + full-cover shortlist equals brute-force L2 " +
    "(the q146b lossless anchor)") {
    val got = rows(IvfPq.ivfPqTopK(corpus, queries, dim = 64,
      nCentroids = 8, m = 8, k = 16, topK = 10, nProbe = 8,
      refine = 20))
    assert(got == rows(bruteL2(corpus, queries, 10)))
  }

  test("recall@10 rises with nProbe (the IVF knob), reaching >= 0.5 " +
    "at half the cells probed — on a SYNTHETIC-RANDOM corpus, where " +
    "neighbors scatter across cells (no cluster structure to exploit)") {
    def recallAt(nProbe: Int): Double = {
      val approx = rows(IvfPq.ivfPqTopK(emb, queries, dim = 64,
        nCentroids = 16, m = 8, k = 16, topK = 10, nProbe = nProbe,
        refine = 4))
      val exact = rows(bruteL2(emb, queries, 10))
      val hits = approx.map(r => (r._1, r._3)).toSet
        .intersect(exact.map(r => (r._1, r._3)).toSet).size
      hits.toDouble / exact.size
    }
    val r4 = recallAt(4); val r8 = recallAt(8)
    assert(r8 >= r4, s"recall fell with more probes: $r4 -> $r8")
    assert(r8 >= 0.5, s"recall@10 at nProbe=8 was $r8")
  }

  test("re-ranked distances are exact L2 regardless of PQ quality: " +
    "every reported (pair, dist) appears identically in brute force " +
    "over all pairs") {
    val approx = rows(IvfPq.ivfPqTopK(emb, queries, dim = 64,
      nCentroids = 16, m = 8, k = 16, topK = 10, nProbe = 4,
      refine = 4))
    val allDists = bruteL2(emb, queries, Int.MaxValue)
      .select("query_id", "neighbor_id", "dist")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    approx.foreach { case (q, _, n, d) =>
      assert(allDists((q, n)) == d, s"pair ($q,$n)")
    }
  }

  test("save/load round trip searches bit-equal, and pruneCells " +
    "scans only probed cell directories with the result unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq_idx").toString
    val (centroids, codes, cb) = IvfPq.build(corpus, dim = 64,
      nCentroids = 8, m = 8, k = 16)
    val inMem = rows(IvfPq.search(centroids, codes, cb, queries,
      corpus, topK = 10, nProbe = 3, refine = 4))
    IvfPq.save(centroids, codes, cb, dir)
    val (lc, lcodes, lcb) = IvfPq.load(spark, dir)
    assert(lcb == cb)
    assert(rows(IvfPq.search(lc, lcodes, lcb, queries, corpus,
      topK = 10, nProbe = 3, refine = 4)) == inMem)
    val pruned = IvfPq.search(lc, lcodes, lcb, queries, corpus,
      topK = 10, nProbe = 3, refine = 4, pruneCells = true)
    assert(rows(pruned) == inMem)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected cell partition pruning in plan:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("search plan: the codes scan joins broadcast tables — no " +
    "hash-partition Exchange on cell") {
    val (centroids, codes, cb) = IvfPq.build(corpus, dim = 64,
      nCentroids = 8, m = 8, k = 16)
    val plan = IvfPq.search(centroids, codes, cb, queries, corpus,
      topK = 10, nProbe = 4, refine = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(cell"),
      s"codes table should never shuffle on cell:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("add encodes a delta with the frozen books exactly as build " +
    "codes its own corpus, and the probe-all search over the grown " +
    "index equals brute force over the union (the q349 anchor)") {
    val (cent, codes, cb) = IvfPq.build(
      corpus.filter(col("vec_id") >= 10), dim = 64, nCentroids = 8,
      m = 8, k = 16)
    val grown = IvfPq.add(cent, codes, cb,
      corpus.filter(col("vec_id") < 10)).cache()
    assert(grown.count() == corpus.count())
    // delta codes match a direct frozen-book encode of the residual
    // against the SAME assigned cell
    val deltaCodes = grown.filter(col("neighbor_id") < 10)
    val recoded = deltaCodes.select(col("neighbor_id"), col("cell"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        Similarity.asDouble(col("embedding")).as("cvec")),
        Seq("neighbor_id"))
      .join(cent, Seq("cell"))
      .select(col("neighbor_id"),
        graft.plans.PqExpressions.pqEncode(
          zip_with(col("cvec"), col("centroid"), (x, c) => x - c),
          cb.books, cb.subDim).as("codes"))
    val a = deltaCodes.select("neighbor_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    val b = recoded.as[(Long, Seq[Int])].collect().toMap
    assert(a == b && a.size == 10)
    // end-to-end: grown index in the lossless regime == brute force
    val got = rows(IvfPq.search(cent, grown, cb, queries, corpus,
      topK = 10, nProbe = 8, refine = 20))
    assert(got == rows(bruteL2(corpus, queries, 10)))
  }
}
