package graft

import graft.operators.Repetition

class RepetitionSpec extends SparkSuite {
  import spark.implicits._

  test("planted repeated and all-unique docs score hand-computed " +
    "fractions") {
    val docs = Seq(
      (1L, "a a a a a"),          // 5 tokens, 1 distinct, 1 bigram
      (2L, "v w x y z"),          // all unique
      (3L, "p q p q p q"))        // period-2 loop
      .toDF("doc_id", "text")
    val m = Repetition.profile(docs)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 5L, 1L, 0.8, 1.0, 0.75)))
    assert(m(2L) == ((2L, 5L, 5L, 0.0, 0.2, 0.0)))
    // "p q p q p q": 6 toks, 2 distinct, bigrams {p q, q p} of 5
    assert(m(3L) == ((3L, 6L, 2L, round6(2.0 / 3), 0.5, 0.6)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("the profile is a pure map-side projection: zero Exchange") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = Repetition.profile(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }

  test("native TokenTopCount agrees with the explode/groupBy histogram " +
    "over the corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFns.tokens(col("text")).as("w"))
    val native = toks.select(col("doc_id"),
      graft.plans.TopCountExpressions.tokenTopCount(col("w")).as("c"))
    val composed = toks.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").as("c"))
    assert(native.except(composed).count() == 0)
    assert(composed.except(native).count() == 0)
  }
}
