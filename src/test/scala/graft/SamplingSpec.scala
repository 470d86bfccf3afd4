package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("hash samples are stable across runs and repartitionings") {
    val a = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByHash(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("hash samples are NESTED: a smaller fraction is a subset of a " +
    "larger one, and sizes track the fractions") {
    val small = Sampling.sampleByHash(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val large = Sampling.sampleByHash(docs, "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    val n = docs.count().toDouble
    assert(math.abs(small.size / n - 0.2) < 0.08)
    assert(math.abs(large.size / n - 0.6) < 0.08)
  }

  test("capPerGroup keeps at most k per group, deterministically, and " +
    "smaller caps nest inside larger ones") {
    val base = docs.select("doc_id", "source")
    val cap10 = Sampling.capPerGroup(base, "source", "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    val cap10b = Sampling.capPerGroup(base.repartition(5), "source",
        "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    val cap50 = Sampling.capPerGroup(base, "source", "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(cap10 == cap10b)
    assert(cap10.subsetOf(cap50))
    val perGroup = Sampling.capPerGroup(base, "source", "doc_id", 10)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 <= 10))
  }

  test("assignSplit partitions every row into exactly one of " +
    "train/val/test with roughly the requested proportions") {
    val split = docs.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id")).as("split"))
    val counts = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count())
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.08)
  }
}
