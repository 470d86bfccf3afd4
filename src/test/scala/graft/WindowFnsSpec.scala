package graft

import org.apache.spark.sql.functions._
import graft.functions.WindowFns

class WindowFnsSpec extends SparkSuite {
  import spark.implicits._

  private def series = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
    ("b", 1, 5.0), ("b", 2, 15.0)
  ).toDF("k", "t", "v")

  private val w = WindowFns.series(col("k"), col("t"))

  test("rollingMean min_periods=window nulls the warm-up rows " +
    "(pandas default, reference feature_engineering.py:35)") {
    val out = series
      .withColumn("m", WindowFns.rollingMean(col("v"), 3, 3, w))
      .orderBy("k", "t").select("k", "m").as[(String, Option[Double])]
      .collect()
    assert(out.toSeq == Seq(
      ("a", None), ("a", None), ("a", Some(20.0)), ("a", Some(30.0)),
      ("b", None), ("b", None)))
  }

  test("rollingMean min_periods=1 computes from the first row") {
    val out = series
      .withColumn("m", WindowFns.rollingMean(col("v"), 3, 1, w))
      .orderBy("k", "t").select("m").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 15.0, 20.0, 30.0, 5.0, 10.0))
  }

  test("rollingStd of a 1-row window is null (pandas ddof=1 NaN parity)") {
    val out = series
      .withColumn("s", WindowFns.rollingStd(col("v"), 3, 1, w))
      .orderBy("k", "t").select("s").as[Option[Double]].collect()
    assert(out.head.isEmpty)      // first row of key a
    assert(out(4).isEmpty)        // first row of key b
    assert(out(1).exists(d => math.abs(d - 7.0710678) < 1e-6))
  }

  test("pctChange matches pandas pct_change(n)*100 and is null-safe") {
    val out = series
      .withColumn("p", WindowFns.pctChange(col("v"), 1, w))
      .orderBy("k", "t").select("p").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(100.0), Some(50.0),
      Some((40.0 - 30.0) / 30.0 * 100), None, Some(200.0)))
  }

  test("diff is value minus previous, null at series start") {
    val out = series.withColumn("d", WindowFns.diff(col("v"), w))
      .orderBy("k", "t").select("d").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(10.0), Some(10.0), Some(10.0),
      None, Some(10.0)))
  }

  test("latestPerKey returns groupby().tail(1) rows via one aggregation") {
    val out = WindowFns.latestPerKey(series, Seq("k"), col("t"))
      .orderBy("k").as[(String, Int, Double)].collect()
    assert(out.toSeq == Seq(("a", 4, 40.0), ("b", 2, 15.0)))
  }
}
