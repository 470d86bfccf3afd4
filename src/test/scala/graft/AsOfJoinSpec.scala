package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("backward as-of join picks the latest right row at-or-before " +
    "each left time; unmatched rows get null") {
    val left = Seq((1, 10, "L1"), (1, 20, "L2"), (2, 15, "L3"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 5, "a"), (1, 18, "b"), (2, 99, "z"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t")
      .orderBy("k", "t")
      .select("k", "t", "tag", "v")
      .as[(Int, Int, String, Option[String])].collect()
    // mirrors the DuckDB ASOF LEFT JOIN oracle on the same rows
    assert(out.toSeq == Seq((1, 10, "L1", Some("a")),
      (1, 20, "L2", Some("b")), (2, 15, "L3", None)))
  }

  test("ties match: a right row at exactly the left time is taken") {
    val left = Seq((1, 10, "L")).toDF("k", "t", "tag")
    val right = Seq((1, 10, "same"), (1, 9, "earlier")).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t")
      .select("v").as[String].collect()
    assert(out.toSeq == Seq("same"))
  }
}
