package graft

import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Pins the exact-integer ratio rounding against BigDecimal HALF_UP on
  * the TRUE rational — including the tie cases where rounding the
  * double quotient gives the WRONG answer (the q88 class: the nearest
  * double to x.xxxx5 can sit below the tie, so double-domain HALF_UP
  * rounds down where decimal HALF_UP must round up). */
class ExactRoundSpec extends SparkSuite {
  import spark.implicits._

  private def trueRound(a: Long, b: Long, dp: Int): Double =
    new java.math.BigDecimal(a).divide(new java.math.BigDecimal(b),
      dp, java.math.RoundingMode.HALF_UP).doubleValue()

  test("ratio() equals BigDecimal HALF_UP of the true rational for " +
    "every (a, b) in a dense sweep including 5th-decimal ties") {
    // b = 32 and b = 2^5·5^k make a/b terminate at exactly 5 decimals
    // for odd a — the tie class; also sweep awkward primes
    val cases = for {
      b <- Seq(1L, 2L, 3L, 7L, 10L, 16L, 32L, 160L, 800L, 2000L, 4000L,
        100000L)
      a <- 0L to 100L
    } yield (a, b)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        ExactRound.ratio(col("a"), col("b"), 4).as("r4"),
        ExactRound.ratio(col("a"), col("b"), 6).as("r6"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) == trueRound(a, b, 4), s"r4 $a/$b")
      assert(r.getDouble(3) == trueRound(a, b, 6), s"r6 $a/$b")
    }
  }

  test("the tie cases that double-domain round() gets WRONG are the " +
    "point: k/32 for odd k must round UP at 4dp") {
    // 1/32 = 0.03125 exactly; HALF_UP at 4dp = 0.0313. The nearest
    // double to 0.03125 IS 0.03125 (a dyadic rational!), so Spark's
    // BigDecimal-of-double agrees here — but 3/160 = 0.018750...
    // and friends are NOT dyadic: their nearest double sits below or
    // above the tie, and double-domain rounding follows the double,
    // not the true rational. The exact path must not care either way.
    val ties = Seq((1L, 32L, 0.0313), (3L, 32L, 0.0938),
      (5L, 32L, 0.1563), (3L, 160L, 0.0188), (7L, 160L, 0.0438),
      (1L, 2000L, 0.0005), (3L, 2000L, 0.0015))
    val got = ties.map(t => (t._1, t._2)).toDF("a", "b")
      .select(ExactRound.ratio(col("a"), col("b"), 4)).as[Double]
      .collect().toSeq
    assert(got == ties.map(_._3), s"got $got")
  }

  test("null operands propagate (the nullif(den,0) guard pattern)") {
    val out = Seq((1L, Some(4L)), (1L, None)).toDF("a", "b")
      .select(ExactRound.ratio(col("a"), col("b"), 4)).as[Option[Double]]
      .collect().toSeq
    assert(out == Seq(Some(0.25), None))
  }
}
