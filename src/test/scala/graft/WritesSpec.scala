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
}
