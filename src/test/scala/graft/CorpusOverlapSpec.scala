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
}
