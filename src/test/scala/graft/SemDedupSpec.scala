package graft

import org.apache.spark.sql.functions._
import graft.operators.{SemDedup, Similarity}

/** SemDeDup / D4 pruning semantics: assignment argmax, the
  * keep-least-prototypical rule, Lloyd refinement invariants, and the
  * diversification fraction. The exact end-to-end hashes are pinned by
  * the q107/q109 DuckDB oracles; these specs pin the properties the
  * oracle parameters can't reach (lloydIters > 0, τ extremes). */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("assign: every vector gets its argmax centroid, seeds map to themselves") {
    val cs = SemDedup.seedCentroids(emb, k = 8)
    assert(cs.map(_._1).toSeq == (0L until 8L))
    val asg = SemDedup.assign(emb, cs).cache()
    assert(asg.count() == emb.count())
    // a seed vector's best centroid is itself (cosine 1.0)
    val self = asg.filter(col("vec_id") < 8)
      .select("vec_id", "cluster", "centroid_sim")
      .as[(Long, Long, Double)].collect()
    assert(self.forall { case (id, cl, sim) => cl == id && sim == 1.0 })
    // argmax property against a brute-force recompute for a sample row
    val row = asg.filter(col("vec_id") === 42).head()
    val vec = emb.filter(col("vec_id") === 42)
      .select(Similarity.asDouble(col("embedding"))).head()
      .getSeq[Double](0)
    val best = cs.map { case (cid, c) =>
      val bf = emb.sparkSession.range(1).select(
        Similarity.cosine(
          typedLit(vec), typedLit(c.toSeq))).head().getDouble(0)
      (bf, cid)
    }.maxBy { case (s, cid) => (s, -cid) }
    assert(row.getAs[Long]("cluster") == best._2)
    assert(row.getAs[Double]("centroid_sim") == best._1)
  }

  test("semanticDedup: tau > 1 keeps everything, tau = -1 keeps one per cluster") {
    val all = SemDedup.semanticDedup(emb, k = 8, tau = 1.01).cache()
    assert(all.filter(!col("kept")).count() == 0)
    val one = SemDedup.semanticDedup(emb, k = 8, tau = -1.0)
      .filter(col("kept")).cache()
    // with every pair a "duplicate", exactly the least-prototypical
    // member of each non-empty cluster survives
    val perCluster = one.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    assert(perCluster.values.forall(_ == 1L))
    val mins = SemDedup.assign(emb, SemDedup.seedCentroids(emb, 8))
      .groupBy("cluster")
      .agg(min(struct(col("centroid_sim"), col("vec_id"))).as("m"))
      .select(col("cluster"), col("m.vec_id"))
      .as[(Long, Long)].collect().toMap
    val kept = one.select("cluster", "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(kept == mins)
  }

  test("semanticDedup: dropped examples always have a dominating near-dup") {
    val out = SemDedup.semanticDedup(emb, k = 8, tau = 0.4).cache()
    val asg = SemDedup.assign(emb, SemDedup.seedCentroids(emb, 8))
    val pairs = asg.select(col("cluster"), col("vec_id").as("a"),
        col("vec").as("va"), col("centroid_sim").as("sa"))
      .join(asg.select(col("cluster").as("cl2"), col("vec_id").as("b"),
        col("vec").as("vb"), col("centroid_sim").as("sb")),
        col("cluster") === col("cl2") && col("a") =!= col("b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.4)
      .filter(col("sb") < col("sa") ||
        (col("sb") === col("sa") && col("b") < col("a")))
      .select(col("a")).distinct().as[Long].collect().toSet
    val dropped = out.filter(!col("kept")).select("vec_id")
      .as[Long].collect().toSet
    assert(dropped == pairs)
  }

  test("lloyd: refinement preserves centroid count and improves cohesion") {
    val seed = SemDedup.seedCentroids(emb, k = 8)
    val refined = SemDedup.lloyd(emb, k = 8, iters = 3)
    assert(refined.map(_._1).toSeq == seed.map(_._1).toSeq)
    def cohesion(cs: Array[(Long, Array[Double])]): Double =
      SemDedup.assign(emb, cs).agg(sum("centroid_sim")).head().getDouble(0)
    // Lloyd on cosine-normalized synthetic clusters should not LOWER
    // total centroid similarity vs the arbitrary id-seeded init
    assert(cohesion(refined) >= cohesion(seed))
    // and the refined operator still partitions the corpus
    val out = SemDedup.semanticDedup(emb, k = 8, tau = 0.4, lloydIters = 3)
    assert(out.count() == emb.count())
  }

  test("blocked all-pairs (maxBlock) is result-identical to the plain " +
    "cluster join at several block sizes") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id")
        .as[(Long, Long, Double, Boolean)].collect().toSeq
    val plain = rows(SemDedup.semanticDedup(emb, k = 4, tau = 0.3))
    // maxBlock small enough to force many blocks per cluster, a
    // mid value, and one bigger than any cluster (degenerates to nb=1)
    for (mb <- Seq(3, 17, 100000)) {
      assert(rows(SemDedup.semanticDedup(emb, k = 4, tau = 0.3,
        maxBlock = mb)) == plain, s"maxBlock=$mb diverged")
    }
  }

  test("diversify: keeps ceil(n/2) least-prototypical survivors per cluster") {
    val dd = SemDedup.semanticDedup(emb, k = 8, tau = 0.4).cache()
    val kept = dd.filter(col("kept"))
    val div = SemDedup.diversify(dd, keepFraction = 0.5).cache()
    val before = kept.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    val after = div.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    assert(after.keySet == before.keySet)
    after.foreach { case (cl, n) =>
      assert(n == math.ceil(before(cl) * 0.5).toLong) }
    // survivors are the LOW-centroid-sim tail: max kept sim <= min
    // pruned sim within each cluster (modulo id tiebreak at equality)
    val maxKept = div.groupBy("cluster").agg(max("centroid_sim"))
      .as[(Long, Double)].collect().toMap
    val pruned = kept.join(div.select(col("vec_id")), Seq("vec_id"),
      "left_anti")
    val minPruned = pruned.groupBy("cluster").agg(min("centroid_sim"))
      .as[(Long, Double)].collect().toMap
    minPruned.foreach { case (cl, lo) => assert(maxKept(cl) <= lo) }
  }
}
