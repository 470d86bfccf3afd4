package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Hand-derived graphs for the co-occurrence analytics: triangle
  * census, transitivity, min-label components, PageRank sanity. */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def edges(es: (Long, Long)*) =
    es.toDF("pa", "pb")

  test("triangle census: K4 has 4 triangles, transitivity 1") {
    // K4: every pair adjacent; wedges = 4·C(3,2)=12; tri=4; 3·4/12=1
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val r = GraphOps.triangleStats(k4).collect().head
    assert(r.getAs[Long]("n_vertices") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Double]("transitivity") == 1.0)
  }

  test("a path graph has wedges but zero triangles") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val r = GraphOps.triangleStats(path).collect().head
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_wedges") == 2)
    assert(r.getAs[Double]("transitivity") == 0.0)
  }

  test("min-label components: two components of sizes 3 and 2") {
    val g = edges((1L, 2L), (2L, 3L), (10L, 11L))
    val r = GraphOps.minLabelComponents(g, rounds = 4)
      .orderBy("size").collect()
    assert(r.map(x => (x.getAs[Long]("size"),
      x.getAs[Long]("n_components"))).toSeq == Seq((2L, 1L), (3L, 1L)))
  }

  test("pageRank: scores sum to ~1 and the hub outranks leaves on a " +
    "star") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r = GraphOps.pageRank(star, iters = 10)
      .collect().map(x => x.getAs[Long]("v") ->
        x.getAs[Double]("pr_permille")).toMap
    val total = r.values.sum / 1000
    assert(math.abs(total - 1.0) < 1e-6, s"mass $total")
    assert(Seq(2L, 3L, 4L, 5L).forall(l => r(1L) > r(l)))
    // leaves are symmetric
    assert(r(2L) == r(3L) && r(3L) == r(4L) && r(4L) == r(5L))
  }
}
