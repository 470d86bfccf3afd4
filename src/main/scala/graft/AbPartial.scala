package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsViews, EventSeries}

/** Scratch A/B (round-9 verdict item 3): q41/q44's upstream bar
  * aggregation has a combine factor of ~1 (the 128× inflation grows
  * keys ×128 at ~5 events/(user,day)), so the map-side partial
  * aggregate emits ~input-cardinality WIDER rows and the following
  * Window partitionBy(user_id) pays a SECOND exchange. Variant B
  * pre-partitions the raw events by user_id: one raw-row shuffle,
  * aggregate and window both run in that stage with no further
  * exchange and no wasted partial hash map. Times both compositions
  * (warm best-of-3) at the given inflation.
  */
object AbPartial {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "128")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_sf$mult")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def baseA(): DataFrame = AnalyticsViews.predictionBase(
      EventSeries.dailyBars(Tables.events(spark, dir)))
    def baseB(): DataFrame = AnalyticsViews.predictionBase(
      EventSeries.dailyBars(
        Tables.events(spark, dir).repartition(col("user_id"))))

    def time(label: String, f: () => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"[ab] $label%-28s best=$best%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
      best
    }
    // warm-up
    Tables.events(spark, dir).limit(1).write.format("noop")
      .mode("overwrite").save()
    time("q41A_current", () =>
      AnalyticsViews.accuracyByKey(baseA()).orderBy(col("user_id")))
    time("q41B_prepart", () =>
      AnalyticsViews.accuracyByKey(baseB()).orderBy(col("user_id")))
    time("q44A_current", () =>
      AnalyticsViews.classMetrics(baseA()).orderBy(col("class")))
    time("q44B_prepart", () =>
      AnalyticsViews.classMetrics(baseB()).orderBy(col("class")))
    // second pass to cancel order effects
    time("q41A_current2", () =>
      AnalyticsViews.accuracyByKey(baseA()).orderBy(col("user_id")))
    time("q41B_prepart2", () =>
      AnalyticsViews.accuracyByKey(baseB()).orderBy(col("user_id")))
    // plan shapes: count the exchanges in each
    Seq("A" -> baseA _, "B" -> baseB _).foreach { case (l, b) =>
      val p = AnalyticsViews.accuracyByKey(b())
        .queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).size
      println(s"[ab] plan$l exchanges=$ex")
    }
    spark.stop()
  }
}
