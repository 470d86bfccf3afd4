package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the payload of the nearest right row
  * on the chosen side of its time within the same key — the canonical
  * "attach most recent state" operator Spark has no built-in for
  * (DuckDB: ASOF JOIN; pandas: merge_asof).
  *
  * Implementation is the union + running-value composition, NOT a
  * range join: tag both inputs, union them, and take
  * `last(payload, ignoreNulls)` (backward) or `first(...)` (forward)
  * over the keyed time window. One shuffle by key, per-partition sort,
  * zero pair explosion — O(L+R) at any scale and skew-safe under AQE,
  * where an inequality join would degenerate to a broadcast nested
  * loop. Ties (equal times) match on both directions (inclusive), like
  * merge_asof's defaults.
  *
  * `direction`: "backward" (latest right.time <= left.time),
  * "forward" (earliest right.time >= left.time), or "nearest"
  * (whichever of the two is closer; ties to backward).
  * `tolerance`: optional interval (e.g. `expr("INTERVAL 7 DAYS")`) —
  * a match farther than this from the left time is nulled out, the
  * left row survives (merge_asof's tolerance semantics).
  */
object AsOfJoin {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val payloadCols = right.columns
      .filterNot(c => keys.contains(c) || c == timeCol)
    val leftCols = left.columns
    require(payloadCols.nonEmpty, "right side has no payload columns")

    val keyCols = keys.map(col)
    // payload carries the matched right time for tolerance — under a
    // name guaranteed not to collide with a real payload column
    val rtName = Iterator.from(0).map(i => s"_rt$i")
      .find(n => !payloadCols.contains(n)).get
    val rTagged = right.select(
      (keyCols :+ col(timeCol)) ++
        Seq(struct((payloadCols.map(col) :+
            col(timeCol).as(rtName)).toIndexedSeq: _*).as("_payload"),
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

    // backward: right sorts BEFORE left at equal times and the frame
    // trails — last non-null is the latest right <= t. forward: left
    // sorts before right and the frame leads — first non-null is the
    // earliest right >= t. Both inclusive. nearest computes both picks
    // (same exchange, a second within-partition sort) and keeps the
    // closer match, ties to backward (merge_asof convention).
    // The final ordering key breaks (key, time) ties: when several right
    // rows share the same time, the intra-tie order would otherwise be
    // whatever the shuffle produced, making the picked payload
    // nondeterministic across runs. Only ORDERABLE payload fields join
    // the tiebreak (a map-typed payload column would fail analysis in an
    // ORDER BY); if no field is orderable the pre-existing arbitrary-tie
    // behavior remains rather than rejecting the join.
    val orderablePayload = payloadCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
    val tiebreak: Seq[Column] =
      if (orderablePayload.isEmpty) Seq.empty
      else Seq(struct((orderablePayload.map(c =>
        col("_payload").getField(c).as(c)) :+
        col("_payload").getField(rtName).as(rtName)).toIndexedSeq: _*).asc)
    val base = Window.partitionBy(keyCols: _*)
    val wBack = base.orderBy((Seq(col(timeCol).asc, col("_side").asc) ++
        tiebreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = base.orderBy((Seq(col(timeCol).asc, col("_side").desc) ++
        tiebreak): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // stage each pick window expression ONCE as a column and derive
    // the tolerance/nearest algebra from the staged columns: window
    // expressions extract per textual occurrence (the r12 q11/q15
    // lesson), so the inline form planned the last()/first() window
    // aggregate 2-3× per direction and ~12× for "nearest"
    val unioned = rTagged.unionByName(lTagged)
    val withBack = if (direction == "forward") unioned
      else unioned.withColumn("_back",
        last(col("_payload"), ignoreNulls = true).over(wBack))
    val staged = if (direction == "backward") withBack
      else withBack.withColumn("_fwd",
        first(col("_payload"), ignoreNulls = true).over(wFwd))
    def tolerated(pick: Column, dir: String): Column = {
      val in = tolerance.map { tol =>
        if (dir == "backward") pick.getField(rtName) >= col(timeCol) - tol
        else pick.getField(rtName) <= col(timeCol) + tol
      }.getOrElse(lit(true))
      when(pick.isNotNull && in, pick)
    }
    val asof = direction match {
      case "backward" => tolerated(col("_back"), "backward")
      case "forward"  => tolerated(col("_fwd"), "forward")
      case "nearest"  =>
        val b = tolerated(col("_back"), "backward")
        val f = tolerated(col("_fwd"), "forward")
        // fractional epoch-seconds distance: works for INT/DATE/
        // TIMESTAMP times and preserves sub-second gaps (a long cast
        // would floor 10.9s and 10.0s to equal distance)
        def secs(c: Column) = c.cast("timestamp").cast("double")
        when(b.isNull, f).when(f.isNull, b)
          .when(secs(col(timeCol)) - secs(b.getField(rtName)) <=
            secs(f.getField(rtName)) - secs(col(timeCol)), b)
          .otherwise(f)
    }
    val matched = staged
      .withColumn("_asof", asof)
      .filter(col("_side") === 1)

    matched.select(
      (keyCols :+ col(timeCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => col(s"_left.$c").as(c)) ++
        payloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
