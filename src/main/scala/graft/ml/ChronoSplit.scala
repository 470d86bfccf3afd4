package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chronological train/val/test split (reference:
  * ml/feature_engineering.py:210-261 — sort by date, slice at fractions).
  *
  * The reference slices a single global sort index; at scale that is a
  * one-reducer sort (SURVEY §7.5 item 3). Here the cutoffs are DATE
  * BOUNDARIES taken from the (tiny) distinct-date list, so the split is
  * two broadcast filters over the data — no global sort, no skew, and the
  * no-lookahead property is preserved exactly (a date is never in two
  * splits). */
object ChronoSplit {

  /** Returns (train, val, test). testFraction of distinct dates goes to
    * test; valFraction of the remainder to val. */
  def apply(df: DataFrame, dateCol: String = "date",
            testFraction: Double = 0.2,
            valFraction: Double = 0.1): (DataFrame, DataFrame, DataFrame) = {
    // The driver-side distinct list is bounded ONLY because the column is
    // a calendar date (decades of trading days ≈ 10^4 values). A
    // timestamp column would make it proportional to the data — reject it
    // loudly; callers with timestamps should truncate to a date first.
    import org.apache.spark.sql.types.{DateType, StringType}
    val dt = df.schema(dateCol).dataType
    require(dt == DateType || dt == StringType,
      s"ChronoSplit requires a DateType/ISO-string column; '$dateCol' is " +
        s"$dt — truncate timestamps to dates (to_date) before splitting")
    val dates = df.select(col(dateCol)).distinct()
      .orderBy(col(dateCol)).collect().map(_.get(0))
    require(dates.nonEmpty, "empty input")
    val n = dates.length
    val testStart = math.max(1, (n * (1 - testFraction)).toInt)
    val valStart = math.max(1, (testStart * (1 - valFraction)).toInt)
    val valCut = dates(math.min(valStart, n - 1))
    val testCut = dates(math.min(testStart, n - 1))
    val c = col(dateCol)
    (df.filter(c < lit(valCut)),
      df.filter(c >= lit(valCut) && c < lit(testCut)),
      df.filter(c >= lit(testCut)))
  }
}
