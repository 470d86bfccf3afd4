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

  /** `events.ts` has shipped in three parquet flavors across fixture
    * generations: TIMESTAMP(NANOS)-annotated INT64 (readable only as an
    * epoch-nanos LONG via the legacy nanosAsLong conf),
    * TIMESTAMP(MICROS) with isAdjustedToUTC=0 (arrives as
    * TIMESTAMP_NTZ), and adjusted-UTC TIMESTAMP(MICROS). Normalize all
    * three to the session TimestampType at this one boundary so every
    * consumer sees a plain timestamp column. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(readEventsFlavored(s, s"$d/events.parquet"))

  /** Batch read of an events parquet path (file or directory) that may
    * carry any of the three `ts` flavors. The legacy nanosAsLong session
    * conf is set ONLY when the footer actually declares TIMESTAMP(NANOS)
    * — Spark 4 refuses the scan otherwise — never preemptively, so the
    * conf cannot leak into reads of micros-flavored data. */
  def readEventsFlavored(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(path)
    catch {
      case e: Exception if causeChain(e).exists(t =>
          t.getMessage != null && t.getMessage.contains("NANOS")) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }

  private def causeChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq

  /** Branch on the ARRIVED type of a timestamp column and cast to the
    * session TimestampType: LongType means epoch nanos (integer DIV, no
    * double round-trip), TIMESTAMP_NTZ means the wall-clock micros are
    * the intended instants (sessions run UTC, so the cast is
    * micros-identity), TimestampType passes through. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Guide §2.5 "one huge unsplittable file → repartition immediately
    * after the read": a single-row-group parquet file yields a ONE-task
    * scan no matter how many cores the session has, serializing any
    * expensive per-row kernel above it (the sf0.1 fixtures are exactly
    * this shape — q33's MinHash kernel measured 0.92 s single-task vs
    * 0.62 s repartitioned, graft.AbR12). Round-robin repartition to
    * session parallelism ONLY when the scan's split count cannot feed
    * half the cores; any real-scale input (and the inflated bench legs,
    * ≥cpus files) splits fine and passes through untouched, so this
    * never adds a shuffle where the layout already parallelizes.
    * Deterministic: Spark's sort-before-repartition (on by default)
    * makes the round-robin assignment stable under task retries. */
  def parallelized(s: SparkSession, df: DataFrame): DataFrame = {
    val scanParts = df.rdd.getNumPartitions // plan-only, no job
    val target = s.sparkContext.defaultParallelism
    if (scanParts * 2 <= target) df.repartition(target) else df
  }
}
