package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the payload of the latest
  * right row with `right.time <= left.time` within the same key — the
  * canonical "attach most recent state" operator Spark has no built-in
  * for (DuckDB: ASOF JOIN; pandas: merge_asof).
  *
  * Implementation is the union + running-last-value composition, NOT a
  * range join: tag both inputs, union them, and take
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
  * side ROWS UNBOUNDED PRECEDING)`. One shuffle by key, per-partition
  * sort, zero pair explosion — O(L+R) at any scale and skew-safe under
  * AQE, where an inequality join would degenerate to a broadcast
  * nested loop. Ties (equal times) match, right-before-left at the
  * same timestamp. */
object AsOfJoin {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String): DataFrame = {
    val payloadCols = right.columns
      .filterNot(c => keys.contains(c) || c == timeCol)
    val leftCols = left.columns
    require(payloadCols.nonEmpty, "right side has no payload columns")

    val keyCols = keys.map(col)
    val rTagged = right.select(
      (keyCols :+ col(timeCol)) ++
        Seq(struct(payloadCols.map(col).toIndexedSeq: _*).as("_payload"),
          lit(0).as("_side"),
          // null placeholders for left-only columns
          struct(leftCols.filterNot(c => keys.contains(c) ||
            c == timeCol).map(c => lit(null).cast(left.schema(c).dataType)
            .as(c)).toIndexedSeq: _*).as("_left")): _*)
    val lTagged = left.select(
      (keyCols :+ col(timeCol)) ++
        Seq(lit(null).cast(rTagged.schema("_payload").dataType)
            .as("_payload"),
          lit(1).as("_side"),
          struct(leftCols.filterNot(c => keys.contains(c) ||
            c == timeCol).map(col).toIndexedSeq: _*).as("_left")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true)
        .over(w))
      .filter(col("_side") === 1)

    matched.select(
      (keyCols :+ col(timeCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => col(s"_left.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
