package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver parquet fixtures (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read from it; no
  * data is synthesized. At cluster scale these would be catalog tables
  * (partitioned by date, bucketed by key) — the read path is isolated here
  * so only this file changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Name-dispatched reader that routes through the per-table accessors,
    * so tables needing read-time normalization (events' nanosecond
    * timestamps) are handled uniformly. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => read(spark, dir, other)
    }

  /** SQL-first entry point: register every fixture table as a temp view
    * (normalizations included), so `spark.sql("SELECT ... FROM
    * lineitem")` works directly — pair with GraftExtensions for the
    * native kernels in SQL. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads via
    * the nanosAsLong legacy conf (as epoch-nanos LONG). Normalize to a
    * microsecond TimestampType here — integer DIV, no double round-trip —
    * so every consumer sees a plain timestamp column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
