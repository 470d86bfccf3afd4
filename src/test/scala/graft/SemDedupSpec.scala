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

  test("incrementalSemDedup: a kept-state near-dup drops with reason " +
    "'state' even when MORE prototypical; a near-dup of a state-" +
    "DROPPED row does not; within-batch domination reads 'batch'") {
    // one centroid at e0 = (1,0,0,...) so geometry is by hand
    def v(xs: Double*): Seq[Double] =
      xs.padTo(4, 0.0)
    val state = Seq(
      (0L, v(1.0)),               // seed/centroid, kept
      (1L, v(1.0, 0.02)),         // near-dup of 0, MORE prototypical?
      (2L, v(0.2, 1.0))           // distinct direction, kept
    ).toDF("vec_id", "embedding")
    val cs = SemDedup.seedCentroids(state, k = 1)
    val sd = SemDedup.semanticDedup(state, k = 1, tau = 0.99)
    val keptIds = sd.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    // 0 and 1 are mutual dups: exactly one survives; 2 survives
    assert(keptIds.contains(2L) && keptIds.size == 2)
    val droppedStateId = (Set(0L, 1L) -- keptIds).head
    val keptState = sd.filter(col("kept"))
      .select(col("vec_id"), col("cluster"))
      .join(state, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val batch = Seq(
      (10L, v(1.0, 0.01)),        // cos≈1 with BOTH kept and dropped 0/1
      (11L, v(0.21, 1.0)),        // near-dup of kept state 2
      (12L, v(1.0, -3.0)),        // batch pair: near-dup of 13
      (13L, v(1.0, -3.01)),       // less prototypical than 12? see below
      (14L, v(-1.0, 0.5))         // unrelated: kept
    ).toDF("vec_id", "embedding")
    val out = SemDedup.incrementalSemDedup(cs, keptState, batch,
        tau = 0.99)
      .orderBy("vec_id")
      .select("vec_id", "drop_reason", "kept")
      .as[(Long, Option[String], Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // 10 and 11 duplicate KEPT state rows -> 'state', regardless of
    // which of 0/1 survived
    assert(byId(10L) == ((10L, Some("state"), false)))
    assert(byId(11L) == ((11L, Some("state"), false)))
    // 12/13 duplicate only each other: exactly one drops, as 'batch'
    val pair = Seq(byId(12L), byId(13L))
    assert(pair.count(_._3) == 1)
    assert(pair.filter(!_._3).forall(_._2 == Some("batch")))
    assert(byId(14L) == ((14L, None, true)))
    // the domination rule dropped the MORE prototypical of 0/1 from
    // the state (csim(0) = 1.0 > csim(1)), so 10's 'state' verdict
    // above proves the batch compared against the surviving row only
    assert(droppedStateId == 0L)
  }

  test("incrementalSemDedup refuses a keptState missing its columns") {
    val state = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val cs = SemDedup.seedCentroids(state, k = 1)
    val e = intercept[IllegalArgumentException] {
      SemDedup.incrementalSemDedup(cs,
        state.select("vec_id", "embedding"), state, tau = 0.5)
    }
    assert(e.getMessage.contains("cluster"))
  }
}
