package graft

import org.apache.spark.sql.functions._
import graft.operators.Constraints._

/** One-pass declarative constraint suite (q216): violation counting
  * per rule on a hand-built dirty frame, and the single-scan plan. */
class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some("a"), 10.0, "click"),
    (Some(1L), Some("b"), -1.0, "click"),
    (None, Some("c"), 5.0, "weird"),
    (Some(2L), None, 999.0, "view")
  ).toDF("id", "s", "v", "t")

  test("violations count per rule: nulls, dup keys, range, set, " +
    "min-rows shortfall") {
    val df = Seq(
      (1L, Option("x"), Option(10.0), "click"),
      (1L, Option("y"), Option(-1.0), "weird"),
      (2L, None, Option(5.0), "view"),
      (3L, Option("z"), None, "click")
    ).toDF("id", "s", "v", "t")
    val out = check(df, Seq(
      NotNull("s"), Unique(Seq("id")), InRange("v", 0.0, 100.0),
      InSet("t", Seq("click", "view")), MinRows(10)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("not_null(s)") == ((1L, false)))
    assert(out("unique(id)") == ((1L, false))) // id=1 twice
    // -1 out of range + null v both violate
    assert(out("in_range(v,0.0,100.0)") == ((2L, false)))
    assert(out("in_set(t)") == ((1L, false)))
    assert(out("min_rows(10)") == ((6L, false))) // shortfall 10-4
    // a clean frame passes everything
    val clean = check(
      Seq((1L, "a", 1.0, "click"), (2L, "b", 2.0, "view"))
        .toDF("id", "s", "v", "t"),
      Seq(NotNull("s"), Unique(Seq("id")), InRange("v", 0.0, 100.0),
        InSet("t", Seq("click", "view")), MinRows(2)))
      .agg(min(col("passed"))).as[Boolean].head()
    assert(clean)
  }

  test("the whole suite runs as ONE aggregate pass over one scan") {
    val plan = check(dirty, Seq(NotNull("id"), InRange("v", 0, 1),
        MinRows(1)))
      .queryExecution.executedPlan.toString
    // no join, no repeated scan: a single two-phase aggregate
    assert(!plan.contains("Join"), plan)
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 1, plan)
  }
}
