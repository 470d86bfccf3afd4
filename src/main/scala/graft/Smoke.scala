package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's entry-point contract: runs
  * SparkEntry.entry (flagship fact query at sf0.001) exactly as the
  * driver's smoke check does, prints the row count and plan. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(8, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
