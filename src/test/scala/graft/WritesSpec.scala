package graft

import graft.operators.Writes

/** The idempotency properties the reference encodes as Postgres unique
  * constraints (SURVEY §2.1 S3/S4, §7.4 "the idempotency property test is
  * the guard"). */
class WritesSpec extends SparkSuite {
  import spark.implicits._

  private def existing = Seq((1, "a", 10), (2, "a", 20)).toDF("k", "g", "v")
  private def incoming = Seq((2, "a", 99), (3, "a", 30), (3, "a", 30))
    .toDF("k", "g", "v")

  test("insertIgnore keeps existing rows on conflict and appends the rest") {
    val out = Writes.insertIgnore(existing, incoming, Seq("k", "g"))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.toSeq == Seq((1, "a", 10), (2, "a", 20), (3, "a", 30)))
  }

  test("insertIgnore is idempotent: re-applying the same batch is a no-op") {
    val once = Writes.insertIgnore(existing, incoming, Seq("k", "g"))
    val twice = Writes.insertIgnore(once, incoming, Seq("k", "g"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("upsert lets incoming win on conflict and keeps the rest") {
    val out = Writes.upsert(existing, incoming, Seq("k", "g"))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.toSeq == Seq((1, "a", 10), (2, "a", 99), (3, "a", 30)))
  }

  test("upsert is idempotent") {
    val once = Writes.upsert(existing, incoming, Seq("k", "g"))
    val twice = Writes.upsert(once, incoming, Seq("k", "g"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("unenriched is the NOT EXISTS delta (stock_grok_pipeline.py:191)") {
    val enriched = Seq((1, "a", 0)).toDF("k", "g", "x")
    val out = Writes.unenriched(existing, enriched, Seq("k", "g"))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.toSeq == Seq((2, "a", 20)))
  }

  test("insertIgnoreBloom equals insertIgnore exactly, incl. overlap, " +
    "in-batch dups, and re-application") {
    import org.apache.spark.sql.functions._
    val big = spark.range(0, 5000)
      .select(col("id").as("k"), (col("id") % 7).cast("string").as("g"),
        (col("id") * 10).cast("int").as("v"))
    val batch = spark.range(4500, 5500)
      .select(col("id").as("k"), (col("id") % 7).cast("string").as("g"),
        lit(-1).as("v"))
      .unionAll(spark.range(4600, 4700).select(col("id").as("k"),
        (col("id") % 7).cast("string").as("g"), lit(-2).as("v")))
    val plain = Writes.insertIgnore(big, batch, Seq("k", "g"))
      .orderBy("k", "g").collect().toSeq
    val bloom = Writes.insertIgnoreBloom(big, batch, Seq("k", "g"))
      .orderBy("k", "g").collect().toSeq
    assert(bloom == plain)
    val twice = Writes.insertIgnoreBloom(
      Writes.insertIgnoreBloom(big, batch, Seq("k", "g")),
      batch, Seq("k", "g")).orderBy("k", "g").collect().toSeq
    assert(twice == plain) // idempotent
  }

  test("insertIgnoreBloom never shuffles the existing table: its only " +
    "hash Exchange is the incoming-batch dedup") {
    import org.apache.spark.sql.functions._
    val big = spark.range(0, 1000).select(col("id").as("k"),
      lit("a").as("g"), col("id").cast("int").as("v"))
    val batch = spark.range(990, 1010).select(col("id").as("k"),
      lit("a").as("g"), lit(-1).as("v"))
    val p = Writes.insertIgnoreBloom(big, batch, Seq("k", "g"))
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"), s"probe missing:\n$p")
    assert(p.contains("BroadcastExchange"), s"conflicts not broadcast:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"expected at most the batch-dedup shuffle:\n$p")
  }
}
