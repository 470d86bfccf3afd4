package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.PriceSource

class PriceSourceSpec extends SparkSuite {
  import spark.implicits._

  private val tickers = Seq("AAA", "BBB")

  test("unpivotWide stacks ticker column groups into long rows and " +
    "drops non-trading (null/NaN) cells") {
    val wide = Seq(
      ("2024-01-02", 10.0, 11.0, 9.0, 10.5, 100L,
        20.0, 21.0, 19.0, 20.5, 200L),
      ("2024-01-03", 10.5, 12.0, 10.0, 11.5, 110L,
        Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0L))
      .toDF("d", "AAA_open", "AAA_high", "AAA_low", "AAA_close",
        "AAA_volume", "BBB_open", "BBB_high", "BBB_low", "BBB_close",
        "BBB_volume")
      .withColumn("date", to_date(col("d"))).drop("d")
    val long = PriceSource.unpivotWide(wide, tickers)
    assert(long.columns.toSeq ==
      Seq("ticker", "date", "open", "high", "low", "close", "volume"))
    assert(long.count() == 3) // BBB 01-03 NaN row dropped
    val aaa = long.filter(col("ticker") === "AAA" &&
      col("date") === "2024-01-02").head()
    assert(aaa.getDouble(2) == 10.0 && aaa.getDouble(5) == 10.5 &&
      aaa.getLong(6) == 100L)
    // the unpivot is generate-only: no exchange in the plan
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("WideCsv source round-trips a wide CSV fixture into the " +
    "normalized long schema") {
    val dir = Files.createTempDirectory("graft_prices").toString
    Files.writeString(java.nio.file.Paths.get(dir, "prices.csv"),
      """date,AAA_open,AAA_high,AAA_low,AAA_close,AAA_volume,BBB_open,BBB_high,BBB_low,BBB_close,BBB_volume
        |2024-01-02,10.0,11.0,9.0,10.5,100,20.0,21.0,19.0,20.5,200
        |2024-01-03,10.5,12.0,10.0,11.5,110,,,,,
        |""".stripMargin)
    val long = PriceSource.WideCsv(s"$dir/prices.csv", tickers)
      .fetch(spark)
    assert(long.schema.fieldNames.toSeq ==
      PriceSource.longSchema.fieldNames.toSeq)
    assert(long.count() == 3)
    assert(long.filter(col("ticker") === "BBB").count() == 1)
  }

  test("Resilient source recovers bulk-missing tickers per key with " +
    "retries, and drops only the permanently failing ticker") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    def oneTicker(s: SparkSession, t: String, d: String): DataFrame = {
      import s.implicits._
      Seq((t, d, 1.0, 2.0, 0.5, 1.5, 10L))
        .toDF("ticker", "d", "open", "high", "low", "close", "volume")
        .withColumn("date", to_date(col("d"))).drop("d")
        .select(PriceSource.longSchema.fieldNames.map(col).toSeq: _*)
    }
    // bulk feed only knows AAA; BBB and CCC must come from the fallback
    val bulkOnlyAAA = new PriceSource {
      def fetch(s: SparkSession) = oneTicker(s, "AAA", "2024-01-02")
    }
    // BBB fails twice then succeeds; CCC always throws
    val calls = scala.collection.mutable.Map[String, Int]()
    val gaveUp = scala.collection.mutable.ArrayBuffer[String]()
    val perTicker = (s: SparkSession, t: String) => {
      calls(t) = calls.getOrElse(t, 0) + 1
      t match {
        case "BBB" if calls(t) <= 2 =>
          throw new RuntimeException("transient feed error")
        case "BBB" => oneTicker(s, "BBB", "2024-01-02")
        case _ => throw new RuntimeException("feed down")
      }
    }
    val out = PriceSource.Resilient(bulkOnlyAAA, perTicker,
        expectedTickers = Seq("AAA", "BBB", "CCC"), maxRetries = 3,
        onGiveUp = (t, _) => gaveUp += t)
      .fetch(spark)
    assert(out.select("ticker").distinct().as[String].collect().sorted
      .toSeq == Seq("AAA", "BBB")) // CCC dropped, AAA not re-fetched
    assert(calls("BBB") == 3)      // 2 failures + 1 success
    assert(calls("CCC") == 4)      // initial + 3 retries, then give up
    assert(!calls.contains("AAA")) // bulk hit → no fallback call
    assert(gaveUp.toSeq == Seq("CCC"))
    assert(out.schema.fieldNames.toSeq ==
      PriceSource.longSchema.fieldNames.toSeq)
  }

  test("registerViews exposes every fixture table to spark.sql, " +
    "including the normalized events timestamps") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1, n)
    }
    // events' nanos column arrives as a usable TIMESTAMP through SQL
    val t = spark.sql("SELECT min(ts) AS t FROM events").schema("t")
    assert(t.dataType.typeName == "timestamp")
  }
}
