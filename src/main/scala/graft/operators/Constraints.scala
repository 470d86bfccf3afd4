package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/Great-Expectations
  * shape) checked in ONE aggregate pass: every constraint compiles to
  * a violation-count aggregate expression, the whole suite folds into
  * a single agg row (map-side partials — one scan regardless of suite
  * size), and the row explodes back into a per-constraint report.
  * ALL-INTEGER outputs.
  *
  * This is the gate a pipeline runs before publishing a table: the
  * report is joinable, assertable, and cheap enough to run per batch.
  */
object Constraints {

  sealed trait Constraint { def name: String }

  /** Column must never be null. */
  case class NotNull(column: String) extends Constraint {
    val name = s"not_null($column)"
  }

  /** The column tuple must be a key (no duplicate combinations; rows
    * with a null component are not counted by the distinct — document
    * keys as non-null with [[NotNull]] alongside). */
  case class Unique(columns: Seq[String]) extends Constraint {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Numeric column must lie in [lo, hi]; nulls violate. */
  case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"in_range($column,$lo,$hi)"
  }

  /** Column value must be one of `values`; nulls violate. */
  case class InSet(column: String, values: Seq[String])
      extends Constraint {
    val name = s"in_set($column)"
  }

  /** Table must have at least `n` rows (violations = the shortfall). */
  case class MinRows(n: Long) extends Constraint {
    val name = s"min_rows($n)"
  }

  private def violations(c: Constraint): Column = (c match {
    case NotNull(c0) =>
      sum(when(col(c0).isNull, 1L).otherwise(0L))
    case Unique(cols0) =>
      count(lit(1)) - countDistinct(col(cols0.head),
        cols0.tail.map(col): _*)
    case InRange(c0, lo, hi) =>
      sum(when(col(c0).isNull || col(c0) < lo || col(c0) > hi, 1L)
        .otherwise(0L))
    case InSet(c0, vs) =>
      sum(when(col(c0).isNull || !col(c0).isin(vs: _*), 1L)
        .otherwise(0L))
    case MinRows(n) =>
      when(count(lit(1)) >= n, 0L).otherwise(lit(n) - count(lit(1)))
  }).cast("long")

  /** Run the suite: one aggregate pass, one bounded report row per
    * constraint `(constraint_name, violations, passed)`. */
  def check(df: DataFrame, suite: Seq[Constraint]): DataFrame = {
    require(suite.nonEmpty, "empty constraint suite")
    val aggs = suite.zipWithIndex.map { case (c, i) =>
      violations(c).as(s"_c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(suite.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("constraint_name"),
          coalesce(col(s"_c$i"), lit(0L)).as("violations"),
          (coalesce(col(s"_c$i"), lit(0L)) === 0).as("passed"))
      }: _*)).as("r"))
      .select(col("r.constraint_name").as("constraint_name"),
        col("r.violations").as("violations"), col("r.passed").as("passed"))
  }
}
