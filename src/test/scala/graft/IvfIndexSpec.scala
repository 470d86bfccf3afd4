package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** Persisted IVF index: the on-disk round trip is bit-equal to the
  * in-memory path, partition pruning engages on the cell directory
  * layout, and probe-all equals brute force from a loaded index. */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("save/load round trip searches bit-equal to the in-memory index") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_idx").toString
    val (centroids, cells) = IvfIndex.build(emb, nCentroids = 8)
    val inMem = rows(IvfIndex.search(centroids, cells, queries,
      k = 10, nProbe = 3))
    IvfIndex.save(centroids, cells, dir)
    val (lc, lcells) = IvfIndex.load(spark, dir)
    assert(rows(IvfIndex.search(lc, lcells, queries,
      k = 10, nProbe = 3)) == inMem)
    // and equals the one-shot operator (which delegates to the same
    // build/search pair)
    assert(rows(Similarity.ivfTopK(emb, queries, k = 10,
      nCentroids = 8, nProbe = 3)) == inMem)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("pruneCells scans only probed cell partitions, result unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_idx2").toString
    val (centroids, cells) = IvfIndex.build(emb, nCentroids = 8)
    IvfIndex.save(centroids, cells, dir)
    val (lc, lcells) = IvfIndex.load(spark, dir)
    val full = IvfIndex.search(lc, lcells, queries, k = 10, nProbe = 2)
    val pruned = IvfIndex.search(lc, lcells, queries, k = 10,
      nProbe = 2, pruneCells = true)
    assert(rows(pruned) == rows(full))
    // the IN filter lands on the partition column of the cells scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected cell partition pruning in plan:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("probe-all from a loaded index equals brute force") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_idx3").toString
    val (centroids, cells) = IvfIndex.build(emb, nCentroids = 8)
    IvfIndex.save(centroids, cells, dir)
    val (lc, lcells) = IvfIndex.load(spark, dir)
    val ivf = rows(IvfIndex.search(lc, lcells, queries, k = 10,
      nProbe = 8, pruneCells = true))
    val bf = rows(Similarity.bruteForceTopK(emb, queries, k = 10))
    assert(ivf == bf)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("add assigns by nearest centroid with lowest-cell tiebreak; " +
    "probe-all over the grown index equals brute force over the " +
    "union corpus") {
    // direct assignment rule on hand-built centroids: [1,0] is
    // equidistant from [0,0] (cell 0) and [2,0] (cell 1) -> cell 0;
    // [3,0] is nearest cell 1
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(2.0, 0.0)))
      .toDF("cell", "centroid")
    val empty = Seq.empty[(Long, Seq[Double], Int)]
      .toDF("neighbor_id", "cvec", "cell")
    val delta = Seq((100L, Seq(1.0, 0.0)), (101L, Seq(3.0, 0.0)))
      .toDF("vec_id", "embedding")
    val grown = IvfIndex.add(cents, empty, delta)
      .orderBy("neighbor_id")
      .as[(Long, Seq[Double], Int)].collect().toSeq
    assert(grown.map(r => (r._1, r._3)) == Seq((100L, 0), (101L, 1)))
    // maintenance path == brute force under probe-all: build on a
    // base slice, add the rest, probe all cells
    val (cent, cells) = IvfIndex.build(
      emb.filter(col("vec_id") >= 10), nCentroids = 8)
    val full = IvfIndex.add(cent, cells, emb.filter(col("vec_id") < 10))
    assert(full.count() == emb.count())
    val ivf = rows(IvfIndex.search(cent, full, queries, k = 10,
      nProbe = 8))
    val bf = rows(Similarity.bruteForceTopK(emb, queries, k = 10))
    assert(ivf == bf)
  }
}
