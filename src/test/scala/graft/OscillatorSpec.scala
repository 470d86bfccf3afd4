package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Indicators

/** Round-7 oscillator pack: Williams %R, CCI, MFI (q167-q169), each
  * pinned against an independent sliding-window reference fold computed
  * in plain Scala over the same fixture.
  */
class OscillatorSpec extends SparkSuite {
  import spark.implicits._

  private val w = Window.partitionBy(col("user_id")).orderBy(col("date"))

  // (high, low, close, volume) — one key, 8 days, deliberately
  // including a flat day and an equal-typical-price pair
  private val rows = Seq(
    (10.0, 8.0, 9.0, 100L), (11.0, 9.0, 10.5, 120L),
    (12.0, 10.0, 11.0, 80L), (11.5, 10.5, 10.8, 90L),
    (12.5, 11.0, 12.0, 150L), (12.0, 11.0, 11.5, 70L),
    (13.0, 11.5, 12.8, 200L), (13.0, 11.5, 12.8, 60L))

  private def df = rows.zipWithIndex.map { case ((h, l, c, v), i) =>
    (1L, f"2024-02-${i + 1}%02d", h, l, c, v)
  }.toDF("user_id", "date_s", "high", "low", "close", "volume")
    .select(col("user_id"), to_date(col("date_s")).as("date"),
      col("high"), col("low"), col("close"), col("volume"))

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cmf matches the flow reference: flat bar contributes zero flow " +
    "but full volume; warm-up null") {
    val p = 3
    val out = df.select(col("date"),
        Indicators.cmf(col("high"), col("low"), col("close"),
          col("volume"), w, p).as("c"))
      .orderBy("date").select("c").as[Option[Double]].collect()
    val exp = rows.indices.map { i =>
      if (i < p - 1) None
      else {
        val win = rows.slice(i - p + 1, i + 1)
        val mfv = win.map { case (h, l, c, v) =>
          if (h == l) 0.0 else ((c - l) - (h - c)) / (h - l) * v
        }.sum
        Some(r4(mfv / win.map(_._4).sum))
      }
    }
    assert(out.toSeq == exp)
  }

  test("ulcerIndex matches the RMS-drawdown-vs-window-max reference; " +
    "monotone rising closes read 0") {
    val p = 3
    val out = df.select(col("date"),
        Indicators.ulcerIndex(col("close"), w, p).as("u"))
      .orderBy("date").select("u").as[Option[Double]].collect()
    val exp = rows.indices.map { i =>
      if (i < p - 1) None
      else {
        val win = rows.slice(i - p + 1, i + 1).map(_._3)
        val peak = win.max
        Some(r4(math.sqrt(
          win.map(c => math.pow(100.0 * (c - peak) / peak, 2)).sum / p)))
      }
    }
    assert(out.toSeq == exp)
    // strictly rising closes: every dd vs the window max is only the
    // current row's 0 plus older drawdowns; a plateau-at-max window is 0
    val rising = (1 to 5).map(i => (2L, f"2024-04-0$i", 10.0 + i))
      .toDF("user_id", "date_s", "close")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("close"))
    val last = rising.select(Indicators.ulcerIndex(col("close"), w, 3)
        .as("u")).orderBy(desc("u")).as[Option[Double]].collect()
    assert(last.flatten.forall(_ > 0.0)) // rising window still has dd>0 rows
  }

  test("williamsR matches the sliding-window reference; warm-up null; " +
    "close at the window high reads 0 (not -0)") {
    val p = 3
    val out = df.select(col("date"),
        Indicators.williamsR(col("high"), col("low"), col("close"), w, p)
          .as("wr"))
      .orderBy("date").select("wr").as[Option[Double]].collect()
    val exp = rows.indices.map { i =>
      if (i < p - 1) None
      else {
        val win = rows.slice(i - p + 1, i + 1)
        val hi = win.map(_._1).max; val lo = win.map(_._2).min
        val c = rows(i)._3
        if (hi == lo) None else Some(r4((hi - c) / (hi - lo) * -100))
      }
    }
    assert(out.toSeq == exp)
    // day 7 (index 6) closes at 12.8 < window high 13.0; construct an
    // explicit at-high case and check the sign bit is clean
    val atHigh = Seq((1L, "2024-03-01", 5.0, 4.0, 4.5, 1L),
        (1L, "2024-03-02", 6.0, 5.0, 6.0, 1L),
        (1L, "2024-03-03", 6.0, 5.5, 6.0, 1L))
      .toDF("user_id", "date_s", "high", "low", "close", "volume")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("high"), col("low"), col("close"))
    val wr3 = atHigh.select(Indicators.williamsR(col("high"), col("low"),
        col("close"), w, 3).as("wr"))
      .orderBy("wr").as[Option[Double]].collect().last
    assert(wr3.contains(0.0) &&
      java.lang.Double.doubleToLongBits(wr3.get) == 0L)
  }

  test("cci matches the Lambert reference (MD against the window's own " +
    "SMA); warm-up null") {
    val p = 4
    val out = df.select(col("date"),
        Indicators.cci(col("high"), col("low"), col("close"), w, p)
          .as("cci"))
      .orderBy("date").select("cci").as[Option[Double]].collect()
    val tps = rows.map { case (h, l, c, _) => (h + l + c) / 3 }
    val exp = rows.indices.map { i =>
      if (i < p - 1) None
      else {
        val win = tps.slice(i - p + 1, i + 1)
        val sma = win.sum / p
        val md = win.map(x => math.abs(x - sma)).sum / p
        if (md == 0) None else Some(r4((tps(i) - sma) / (0.015 * md)))
      }
    }
    assert(out.toSeq == exp)
  }

  test("mfi matches the flow reference: warm-up counts PREVIOUS-tp " +
    "rows, flat tp feeds neither flow, zero negative flow -> 100") {
    val p = 3
    val out = df.select(col("date"),
        Indicators.mfi(col("high"), col("low"), col("close"),
          col("volume"), w, p).as("mfi"))
      .orderBy("date").select("mfi").as[Option[Double]].collect()
    val tps = rows.map { case (h, l, c, _) => (h + l + c) / 3 }
    val exp = rows.indices.map { i =>
      // rows with a previous tp inside the trailing p-row frame
      val lo = math.max(0, i - p + 1)
      val withPrev = (lo to i).count(_ >= 1)
      if (withPrev < p) None
      else {
        val (pos, neg) = (lo to i).foldLeft((0.0, 0.0)) {
          case ((sp, sn), j) =>
            if (j == 0) (sp, sn)
            else {
              val flow = tps(j) * rows(j)._4
              if (tps(j) > tps(j - 1)) (sp + flow, sn)
              else if (tps(j) < tps(j - 1)) (sp, sn + flow)
              else (sp, sn)
            }
        }
        Some(r4(if (neg == 0) 100.0 else 100.0 - 100.0 / (1 + pos / neg)))
      }
    }
    assert(out.toSeq == exp)
    // the last fixture day repeats (h,l,c) exactly -> flat tp: its flow
    // lands in NEITHER sum; assert via the reference split above that
    // day 8's window excludes day-8 flow (already encoded), plus the
    // all-up case: strictly rising closes with p=2 give 100
    val rising = (1 to 4).map(i => (9L, f"2024-04-0$i", 10.0 + i,
        9.0 + i, 9.5 + i, 10L))
      .toDF("user_id", "date_s", "high", "low", "close", "volume")
      .select(col("user_id"), to_date(col("date_s")).as("date"),
        col("high"), col("low"), col("close"), col("volume"))
    val last = rising.select(Indicators.mfi(col("high"), col("low"),
        col("close"), col("volume"), w, 2).as("m"))
      .where(col("m").isNotNull).as[Double].collect()
    assert(last.nonEmpty && last.forall(_ == 100.0))
  }
}
