package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Price-feed ingestion (SURVEY §2.1 S1/S2): the reference fetches OHLCV
  * for N tickers from yfinance as a WIDE multi-index frame (one row per
  * date, one column group per ticker) and normalizes to long rows at
  * insert (airflow/dags/stock_grok_pipeline.py:67-121,
  * backfill.py:57-93). The engine ingests equivalent fixtures through
  * this trait, so a live fetcher slots in without touching the pipeline.
  *
  * The wide→long unpivot is a single generate (`stack`) over the column
  * groups — no shuffle, fully pipelined with the scan, and column
  * pruning still reaches the source (only referenced ticker groups are
  * read).
  */
trait PriceSource {
  /** Normalized long frame: (ticker, date, open, high, low, close,
    * volume) — the raw.stock_prices shape (init.sql:4-15). */
  def fetch(spark: SparkSession): DataFrame
}

object PriceSource {

  val longSchema: StructType = StructType.fromDDL(
    "ticker STRING, date DATE, open DOUBLE, high DOUBLE, low DOUBLE, " +
      "close DOUBLE, volume BIGINT")

  private val fields = Seq("open", "high", "low", "close", "volume")

  /** Wide yfinance-shaped frame (date + `<ticker>_<field>` column
    * groups) → normalized long rows via stack(). */
  def unpivotWide(wide: DataFrame, tickers: Seq[String]): DataFrame = {
    require(tickers.nonEmpty, "tickers must be non-empty")
    val groups = tickers.map { t =>
      (s"'$t'" +: fields.map(f => s"`${t}_$f`")).mkString(", ")
    }.mkString(", ")
    wide.selectExpr("date",
        s"stack(${tickers.size}, $groups) AS " +
          s"(ticker, ${fields.mkString(", ")})")
      .select(col("ticker"), col("date"), col("open"), col("high"),
        col("low"), col("close"), col("volume").cast("long").as("volume"))
      // bulk feeds deliver NaN/null rows for non-trading days per ticker;
      // the reference skips them at insert (stock_grok_pipeline.py:92-96)
      .filter(col("close").isNotNull && !isnan(col("close")))
  }

  private def wideSchema(tickers: Seq[String]): StructType =
    StructType.fromDDL(("date DATE" +: tickers.flatMap(
      t => fields.map(f =>
        if (f == "volume") s"${t}_$f BIGINT" else s"${t}_$f DOUBLE"))
      .toSeq).mkString(", "))

  /** CSV fixture feed: a wide CSV (header `date,<t>_open,...`) read with
    * an explicit schema — the batch-download stand-in. */
  final case class WideCsv(path: String, tickers: Seq[String])
    extends PriceSource {
    override def fetch(spark: SparkSession): DataFrame =
      unpivotWide(
        spark.read.schema(wideSchema(tickers))
          .option("header", "true").csv(path),
        tickers)
  }

  /** LIVE HTTP bulk feed: GET one wide CSV (the yfinance bulk-download
    * shape, stock_grok_pipeline.py:67-74) and parse it through the
    * exact [[WideCsv]] schema/unpivot path, so live and fixture feeds
    * are indistinguishable downstream. The GET is one driver-side
    * request per run — a bulk daily quote file, not a corpus-scale
    * transfer. Non-2xx raises (the retry/fallback ladder above this
    * seam decides what to do); proven over real loopback HTTP in
    * HttpSeamsSpec (this build has no egress). */
  final case class HttpWideCsv(url: String, tickers: Seq[String],
                               timeoutSeconds: Long = 30L)
    extends PriceSource {
    override def fetch(spark: SparkSession): DataFrame = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .build()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"feed GET $url -> HTTP ${resp.statusCode()}")
      import spark.implicits._
      val lines = resp.body().split("\r?\n", -1).toIndexedSeq
        .filter(_.nonEmpty)
      unpivotWide(
        spark.read.schema(wideSchema(tickers)).option("header", "true")
          .csv(spark.createDataset(lines)),
        tickers)
    }
  }

  /** Parquet fixture feed with the long schema already — pass-through
    * with schema enforcement. */
  final case class LongParquet(path: String) extends PriceSource {
    override def fetch(spark: SparkSession): DataFrame =
      spark.read.parquet(path).select(
        longSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Empty frame in the long schema — the "feed returned nothing" value
    * both the bulk and per-ticker paths degrade to. */
  def emptyLong(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], longSchema)

  /** Resilient feed (SURVEY S2; reference
    * airflow/dags/stock_grok_pipeline.py:128-156): try the bulk source,
    * then re-fetch every EXPECTED ticker the bulk result missed through a
    * per-ticker fallback, retrying each up to `maxRetries` times
    * (reference's `max_retries`, stock_grok_pipeline.py:26-27). A ticker
    * that still fails after all retries is dropped — the feed delivers
    * what it can rather than failing the whole ingestion (the
    * reference's per-ticker try/except continues the loop).
    *
    * The retry loop is a DRIVER-SIDE control loop over the (small,
    * bounded) ticker list — the fetched frames themselves stay
    * distributed and are combined with one `unionByName`, so the data
    * path is unchanged. The missing-ticker probe collects only the
    * distinct ticker column of the bulk result (≤ N tickers ≪ rows).
    *
    * `onGiveUp` observes permanently failed tickers, `onBulkFailure` a
    * failed bulk feed (alerting hooks); defaults log to stderr — a
    * completely-down bulk source that silently degraded to N per-ticker
    * fetches would otherwise be indistinguishable from a healthy one. */
  final case class Resilient(
      bulk: PriceSource,
      perTicker: (SparkSession, String) => DataFrame,
      expectedTickers: Seq[String],
      maxRetries: Int = 3,
      onGiveUp: (String, Throwable) => Unit = (t, e) =>
        System.err.println(s"[price-source] giving up on '$t': $e"),
      onBulkFailure: Throwable => Unit = e =>
        System.err.println(s"[price-source] bulk feed failed, " +
          s"degrading to per-ticker recovery: $e"))
    extends PriceSource {

    private def safely(hook: String)(body: => Unit): Unit =
      try body catch {
        case scala.util.control.NonFatal(he) =>
          System.err.println(s"[price-source] $hook hook threw: $he")
      }

    private def conform(df: DataFrame): DataFrame =
      df.select(longSchema.fieldNames.map(col).toIndexedSeq: _*)

    /** Materialize a feed INSIDE the guarded scope (localCheckpoint is
      * eager): Spark frames are lazy, so without this a flaky feed would
      * pass the fetch "successfully" and then throw — outside every
      * retry — at the caller's first action, or re-fetch (and possibly
      * re-answer differently) on each downstream use. After this, the
      * frame is pinned: retries are real, and the data returned is the
      * data that was probed. */
    private def materialize(df: DataFrame): DataFrame =
      df.localCheckpoint(true)

    override def fetch(spark: SparkSession): DataFrame = {
      // the bulk probe (distinct tickers) is the frame's first action —
      // keep it inside the try so a feed that fails AT SCAN TIME (not
      // just at plan construction) still degrades to per-ticker recovery
      val (bulkDf, present) =
        try {
          val b = materialize(conform(bulk.fetch(spark)))
          (b, b.select(col("ticker")).distinct()
            .collect().map(_.getString(0)).toSet)
        } catch {
          case scala.util.control.NonFatal(e) =>
            // hooks are observability, not control flow: a throwing
            // alerting hook (correlated outage — feed AND alert endpoint
            // down) must not abort the per-ticker recovery this wrapper
            // exists to provide
            safely("onBulkFailure")(onBulkFailure(e))
            (emptyLong(spark), Set.empty[String])
        }
      val recovered = expectedTickers.filterNot(present).flatMap { t =>
        def attempt(left: Int): Option[DataFrame] =
          try {
            val one = materialize(conform(perTicker(spark, t))
              .filter(col("ticker") === t))
            // an empty per-ticker answer is a failed fetch, not a result
            if (one.isEmpty) throw new IllegalStateException(
              s"per-ticker feed returned no rows for '$t'")
            Some(one)
          } catch {
            case scala.util.control.NonFatal(e) =>
              if (left > 0) attempt(left - 1)
              else { safely("onGiveUp")(onGiveUp(t, e)); None }
          }
        attempt(maxRetries)
      }
      recovered.foldLeft(bulkDf)(_ unionByName _)
    }
  }
}
