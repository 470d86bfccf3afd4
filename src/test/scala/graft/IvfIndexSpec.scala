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
}
