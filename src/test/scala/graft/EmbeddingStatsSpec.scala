package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbeddingStats

class EmbeddingStatsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 2.0f), 0),
    (2L, Seq(3.0f, 4.0f, 0.0f), 0),
    (3L, Seq(0.0f, 1.0f, 0.0f), 1),
    (4L, Seq(0.0f, 3.0f, 0.0f), 1),
    (5L, Seq(-1.0f, 0.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("groupCentroids: element-wise means per label") {
    val got = EmbeddingStats.groupCentroids(vecs)
      .select("g", "i", "c").as[(Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((0, 0L)) == 2.0 && got((0, 1L)) == 2.0 &&
      got((0, 2L)) == 1.0)
    assert(got((1, 0L)) == 0.0 && got((1, 1L)) == 2.0)
    assert(got((2, 0L)) == -1.0)
    assert(got.size == 9)
  }

  test("centroidSimilarities: cosine between label centroids matches " +
    "a driver computation") {
    val got = EmbeddingStats.centroidSimilarities(vecs)
      .select("g_a", "g_b", "sim").as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // centroid(0)=(2,2,1), centroid(1)=(0,2,0): cos = 4/(3*2) = 0.6667
    assert(math.abs(got((0, 1)) - 0.6667) < 1e-9)
    // centroid(2)=(-1,0,0) vs centroid(0): cos = -2/3 = -0.6667
    assert(math.abs(got((0, 2)) - (-0.6667)) < 1e-9)
    assert(got.size == 3)
  }

  test("centroid aggregate is partial (map-side combine), not a " +
    "row-per-element shuffle") {
    val plan = EmbeddingStats.groupCentroids(vecs)
      .queryExecution.executedPlan.toString
    // two-phase hash aggregate around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("centroidDrift: identical halves read cosine 1 / shift 0; " +
    "orthogonal halves read cosine 0 / shift √2") {
    import spark.implicits._
    def df(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
    val same = EmbeddingStats.centroidDrift(df(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))))
      .as[(Long, Long, Double, Double)].head()
    assert(same == ((2L, 2L, 1.0, 0.0)))
    val orth = EmbeddingStats.centroidDrift(df(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(0f, 1f), 3L -> Seq(0f, 1f))))
      .as[(Long, Long, Double, Double)].head()
    // means (1,0) vs (0,1): cos 0, ‖Δ‖ = √2 at 6dp
    assert(orth == ((2L, 2L, 0.0, 1.414214)))
  }
}
