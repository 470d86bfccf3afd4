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

  test("equal-time right rows resolve deterministically (greatest " +
    "payload for backward), and map-typed payloads still join (the " +
    "tiebreak silently drops unorderable fields)") {
    val left = Seq((1, 10, "L")).toDF("k", "t", "tag")
    // two right rows at the SAME (key, time): the pick must be stable
    val right = Seq((1, 10, "aa"), (1, 10, "zz")).toDF("k", "t", "v")
    (1 to 3).foreach { _ =>
      val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t")
        .select("v").as[String].collect()
      assert(out.toSeq == Seq("zz")) // backward takes greatest payload
    }
    // a map payload column is unorderable — it must not break analysis
    import org.apache.spark.sql.functions.{lit, map}
    val rightMap = right.withColumn("attrs", map(lit("a"), lit(1)))
    val outMap = AsOfJoin.joinAsOf(left, rightMap, Seq("k"), "t")
    assert(outMap.count() == 1 && outMap.columns.contains("attrs"))
  }

  test("ties match: a right row at exactly the left time is taken") {
    val left = Seq((1, 10, "L")).toDF("k", "t", "tag")
    val right = Seq((1, 10, "same"), (1, 9, "earlier")).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t")
      .select("v").as[String].collect()
    assert(out.toSeq == Seq("same"))
  }

  test("forward as-of picks the earliest right row at-or-after each " +
    "left time") {
    val left = Seq((1, 10, "L1"), (1, 20, "L2"), (2, 15, "L3"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 5, "a"), (1, 18, "b"), (1, 20, "c"), (2, 3, "z"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t",
        direction = "forward")
      .orderBy("k", "t").select("k", "t", "tag", "v")
      .as[(Int, Int, String, Option[String])].collect()
    // L1@10 → b@18 (earliest ≥10); L2@20 → c@20 (tie matches);
    // L3@15 → nothing after it in key 2
    assert(out.toSeq == Seq((1, 10, "L1", Some("b")),
      (1, 20, "L2", Some("c")), (2, 15, "L3", None)))
  }

  test("nearest as-of picks the closer side, ties to backward, and " +
    "falls back to whichever side exists") {
    val left = Seq((1, 10, "L1"), (1, 100, "L2"), (1, 200, "L3"))
      .toDF("k", "t", "tag")
    // L1@10: back a@8 (d=2) vs fwd b@13 (d=3) → a
    // L2@100: back b@13 (d=87) vs fwd c@105 (d=5) → c
    // L3@200: back c@105 only → c (no forward)
    val right = Seq((1, 8, "a"), (1, 13, "b"), (1, 105, "c"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t",
        direction = "nearest")
      .orderBy("t").select("v").as[String].collect()
    assert(out.toSeq == Seq("a", "c", "c"))
    // exact tie: back@90 and fwd@110 for left@100 → backward wins
    val tie = AsOfJoin.joinAsOf(
      Seq((1, 100, "L")).toDF("k", "t", "tag"),
      Seq((1, 90, "back"), (1, 110, "fwd")).toDF("k", "t", "v"),
      Seq("k"), "t", direction = "nearest")
      .select("v").as[String].collect()
    assert(tie.toSeq == Seq("back"))
  }

  test("tolerance nulls matches farther than the bound but keeps the " +
    "left row (merge_asof semantics), both directions") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1, 100, "L")).toDF("k", "t", "tag")
    val right = Seq((1, 90, "stale"), (1, 130, "far"))
      .toDF("k", "t", "v")
    val back = AsOfJoin.joinAsOf(left, right, Seq("k"), "t",
        tolerance = Some(lit(5)))
      .select("v").as[Option[String]].collect()
    assert(back.toSeq == Seq(None)) // 90 is 10 < t-5 → nulled
    val backOk = AsOfJoin.joinAsOf(left, right, Seq("k"), "t",
        tolerance = Some(lit(10)))
      .select("v").as[Option[String]].collect()
    assert(backOk.toSeq == Seq(Some("stale")))
    val fwd = AsOfJoin.joinAsOf(left, right, Seq("k"), "t",
        direction = "forward", tolerance = Some(lit(10)))
      .select("v").as[Option[String]].collect()
    assert(fwd.toSeq == Seq(None)) // 130 is 30 > t+10 → nulled
  }
}
