package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOverlap

/** Cross-source n-gram overlap: hand-computed Jaccard on a tiny corpus
  * plus the scale-shape pins (type-level distinct before the pair join,
  * broadcast size joins). */
class CorpusOverlapSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    // src1 bigram types: {a b, b c, c d} (doc 2 duplicates "a b")
    (1L, "a b c d", "src1"),
    (2L, "a b", "src1"),
    // src2 bigram types: {b c, c d, d e}
    (3L, "b c d e", "src2"),
    // src3 shares nothing
    (4L, "x y z", "src3")
  ).toDF("doc_id", "text", "source")

  test("pairwise shared-gram counts and exact 6dp Jaccard") {
    val out = CorpusOverlap.sourceNgramOverlap(docs, n = 2)
      .orderBy("source_a", "source_b").collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // src1 vs src2: shared {b c, c d} = 2 of union 4 → 0.5
    val r12 = byPair(("src1", "src2"))
    assert(r12.getLong(2) == 3 && r12.getLong(3) == 3) // grams_a, grams_b
    assert(r12.getLong(4) == 2)                        // shared
    assert(r12.getDouble(5) == 0.5)
    // disjoint pairs don't appear (inner pair join emits hits only)
    assert(!byPair.contains(("src1", "src3")) &&
      !byPair.contains(("src2", "src3")))
  }

  test("duplicate grams within a source count once (type-level)") {
    // "a b" appears in two src1 docs but grams_a is 3 types, not 4
    val sz = CorpusOverlap.sourceNgramOverlap(docs, n = 2)
      .where(col("source_a") === "src1").head()
    assert(sz.getLong(2) == 3)
  }

  test("plan: size joins broadcast; pair join keyed by gram") {
    val plan = CorpusOverlap
      .sourceNgramOverlap(Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the gram-keyed self-join must not be a cartesian product
    assert(!plan.contains("Cartesian"), plan)
  }

  test("sourceJsDivergence: hand-computed JSD, zero for identical " +
    "distributions, one for disjoint support") {
    // A=(2/3,1/3) vs B=(1/3,2/3) over {x,y}:
    // JSD = 2/3*log2(4/3) + 1/3*log2(2/3) = 0.081704 bits (symmetric)
    // C is a verbatim copy of A -> JSD 0; D shares no tokens -> JSD 1
    val docs = Seq(
      (1L, "x x y", "A"), (2L, "x y y", "B"),
      (3L, "x x y", "C"), (4L, "p q r", "D")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOverlap.sourceJsDivergence(docs)
      .select("source_a", "source_b", "jsd")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out(("A", "B")) - 0.081704) < 1e-5)
    assert(out(("A", "C")) == 0.0)
    assert(math.abs(out(("B", "C")) - 0.081704) < 1e-5)
    // disjoint support: no shared tokens, maximal divergence — the
    // pair must still be emitted (it is the most alarming case)
    assert(out(("A", "D")) == 1.0)
    assert(out.size == 6) // every unordered pair of the 4 sources
  }
}
