package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def probe = Seq((1L, 5L), (1L, 25L), (1L, 10L), (2L, 10L),
    (2L, 55L), (3L, 7L)).toDF("k", "ts")
  private def intervals = Seq(
    (1L, 0L, 10L, "a"), (1L, 20L, 30L, "b"), (1L, 9L, 26L, "c"),
    (2L, 50L, 60L, "d"), (4L, 0L, 100L, "e")).toDF("k", "s", "e", "tag")

  test("binned range join returns exactly the naive BETWEEN join rows, " +
    "for bin widths smaller and larger than the intervals") {
    val naive = probe.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("ts").between(col("s"), col("e")))
      .select(col("p.k"), col("ts"), col("s"), col("e"), col("tag"))
    for (bin <- Seq(3L, 8L, 64L)) {
      val binned = RangeJoin.joinRange(probe, intervals, Seq("k"),
          "ts", "s", "e", binWidth = bin)
        .select(col("k"), col("ts"), col("s"), col("e"), col("tag"))
      assert(binned.except(naive).count() == 0, s"extra rows at bin=$bin")
      assert(naive.except(binned).count() == 0, s"lost rows at bin=$bin")
      // explode can duplicate candidates across bins only if the filter
      // readmits them; exact row multiset must match
      assert(binned.count() == naive.count(), s"dup rows at bin=$bin")
    }
  }

  test("keyless range join plans as an equi join on the bin — no " +
    "nested loop / cartesian — where the naive form nested-loops") {
    val p = probe.drop("k")
    val iv = intervals.drop("k")
    val binned = RangeJoin.joinRange(p, iv, Seq(), "ts", "s", "e", 16L)
    val bPlan = binned.queryExecution.executedPlan.toString
    assert(!bPlan.contains("BroadcastNestedLoopJoin") &&
      !bPlan.contains("CartesianProduct"), bPlan)
    val naive = p.join(iv, col("ts").between(col("s"), col("e")))
    val nPlan = naive.queryExecution.executedPlan.toString
    assert(nPlan.contains("BroadcastNestedLoopJoin") ||
      nPlan.contains("CartesianProduct"))
    assert(binned.count() == naive.count())
  }
}
