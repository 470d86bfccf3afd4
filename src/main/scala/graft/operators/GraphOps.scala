package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics over co-occurrence graphs — the
  * market-basket graph here (parts bought together in one order), the
  * same shapes serve any co-occurrence edge list. Everything is exact
  * integer arithmetic on canonical (a < b) edges.
  *
  * Scale shape: edge construction is a fact self-join on the order key
  * (co-partitioned, fan-out quadratic only in ORDER SIZE — bounded by
  * basket width, never corpus size); the triangle join is edge⋈edge on
  * a shared endpoint then a semi-join back on the closing edge — the
  * standard distributed triangle enumeration, linear in wedges of the
  * THRESHOLDED (sparse) graph. */
object GraphOps {

  /** Canonical co-purchase edge list: part pairs sharing ≥ `minOrders`
    * distinct orders. */
  def coPurchaseEdges(lineitem: DataFrame,
                      minOrders: Int = 2): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pa"))
    val b = lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pb"))
    a.join(b, Seq("ok")).where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(countDistinct(col("ok")).cast("long").as("n_orders"))
      .where(col("n_orders") >= minOrders)
  }

  /** Fixed-iteration PageRank over an undirected canonical edge list:
    * `pr' = (1−d)/n + d·Σ_{u∼v} pr_u/deg_u`, `iters` synchronous
    * rounds from the uniform start. Each neighbor contribution rounds
    * to a 12dp decimal before the sum, so the aggregation is
    * order-free and the scores are engine-portable; the oracle
    * unrolls the same rounds. One (edge ⋈ rank) join + hash agg per
    * round — the standard message-passing shape. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    val und = edges.select(col("pa").as("src"), col("pb").as("dst"))
      .union(edges.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = und.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val n = deg.count()
    var pr = deg.select(col("src").as("v"),
      lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = und.join(pr, col("src") === col("v"))
        .join(deg, Seq("src"))
        .select(col("dst"),
          round(col("pr") / col("deg").cast("double"), 12)
            .cast("decimal(38,12)").as("c"))
      pr = contrib.groupBy(col("dst").as("v"))
        .agg((lit((1.0 - damping) / n) +
          lit(damping) * sum(col("c")).cast("double")).as("pr"))
    }
    pr.select(col("v"), round(col("pr") * 1000, 6).as("pr_permille"))
  }

  /** Synchronous min-label propagation over an undirected edge list:
    * `label' = min(label, min over neighbors' labels)`, a FIXED
    * `rounds` of rounds — the result ("min label reachable within k
    * hops") is well-defined and engine-identical even before
    * convergence, which keeps the oracle honest; k ≥ graph diameter
    * makes it exact connected components (the convergence-checked
    * pointer-jump variant in [[Dedup]] is the production path — this
    * is its oracle-replayable twin). Returns the component-size
    * histogram. */
  def minLabelComponents(edges: DataFrame, rounds: Int = 16)
      : DataFrame = {
    val und = edges.select(col("pa").as("src"), col("pb").as("dst"))
      .union(edges.select(col("pb").as("src"), col("pa").as("dst")))
    var lab = und.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
    for (_ <- 1 to rounds) {
      val nbr = und.join(lab, col("src") === col("v"))
        .select(col("dst").as("v2"), col("label"))
        .groupBy(col("v2")).agg(min(col("label")).as("nl"))
      lab = lab.join(nbr, col("v") === col("v2"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nl"), col("label")))
            .as("label"))
        // truncate the lineage — 16 stacked self-joins otherwise blow
        // up Catalyst analysis exponentially
        .localCheckpoint(eager = true)
    }
    lab.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).cast("long").as("n_components"))
  }

  /** Global triangle census of a canonical edge list `(pa, pb)`:
    * edge count, wedge count `Σ_v C(deg_v, 2)`, triangle count via
    * the two-hop join + closing-edge semi-join, and the transitivity
    * coefficient `3·triangles/wedges` through the exact bridge. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("pa"), col("pb")).cache()
    val deg = e.select(col("pa").as("v"))
      .union(e.select(col("pb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).cast("long").as("d"))
    val wedges = deg.agg(
      sum(call_function("div", col("d") * (col("d") - 1), lit(2L)))
        .cast("long").as("n_wedges"),
      count(lit(1)).cast("long").as("n_vertices"))
    val nE = e.agg(count(lit(1)).cast("long").as("n_edges"))
    // paths a<b<c through b, closed by edge (a, c)
    val e1 = e.select(col("pa").as("a"), col("pb").as("b"))
    val e2 = e.select(col("pa").as("b"), col("pb").as("c"))
    val paths = e1.join(e2, Seq("b"))
    val tri = paths.join(e.select(col("pa").as("a"),
        col("pb").as("c")), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_triangles"))
    nE.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        graft.functions.ExactRound.ratio(col("n_triangles") * 3,
          greatest(col("n_wedges"), lit(1L)), 4).as("transitivity"))
  }
}
