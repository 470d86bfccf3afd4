package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")
  private lazy val corpus = docs.filter($"doc_id" >= 50)
  private lazy val bench = docs.filter($"doc_id" < 50)

  test("an exact copy of an eval doc scores contamination 1.0 and a " +
    "disjoint doc scores 0") {
    val evalDoc = Seq((1L, "alpha bravo charlie delta echo foxtrot golf"))
      .toDF("doc_id", "text")
    val corp = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot golf"), // copy
      (101L, "one two three four five six seven eight nine")) // disjoint
      .toDF("doc_id", "text")
    val stats = Decontaminate.contaminationStats(corp, evalDoc, n = 5)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats(100L)._4 == 1.0 && stats(100L)._5 == 1L)
    assert(stats(101L)._4 == 0.0 && stats(101L)._5 == 0L)
  }

  test("the benchmark index probe is a broadcast join — corpus bytes " +
    "are never shuffled by shingle") {
    val stats = Decontaminate.contaminationStats(corpus, bench, n = 5)
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast probe, plan:\n$plan")
  }

  test("clean() removes exactly the flagged docs and keeps the rest") {
    val stats = Decontaminate.contaminationStats(corpus, bench, n = 5,
      threshold = 0.5)
    val flagged = stats.filter($"contaminated" === 1L)
      .select("doc_id").as[Long].collect().toSet
    val kept = Decontaminate.clean(corpus, bench, n = 5, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val all = corpus.select("doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty) // fixture plants real near-copies
    assert(kept == all -- flagged)
  }
}
