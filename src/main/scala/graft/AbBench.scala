package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the scratch A/B mains (AbPartial, AbBucket,
  * AbQ02): one SparkSession shape (local[cpus], parts = cpus, UTC,
  * no UI) and ONE timing discipline (warm best-of-3 via noop-format
  * writes) so a fix to either applies everywhere at once. */
object AbBench {
  def session(extra: (String, String)*): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b) { case (acc, (k, v)) =>
      acc.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def scaleDir(): String = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "128")
    sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_sf$mult")
  }

  /** Warm best-of-3 wall time of a fresh plan per run (noop write —
    * a count() would let Catalyst prune the computed columns). */
  def time(label: String, f: () => DataFrame): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ab] $label%-28s best=${ts.min}%.3f  " +
      s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    ts.min
  }
}
