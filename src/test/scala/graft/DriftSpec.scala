package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

/** PSI drift table (q184): smoothing, bin placement, symmetry of the
  * per-bin terms, and the zero-drift fixed point. */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  private def frame(rows: Seq[(String, Double)]) =
    rows.toDF("d", "score")
      .select(to_date(col("d")).as("date"), col("score"))

  test("psi: mass moving from bin 0 to bin 9 gives mirrored end terms, " +
    "zero middle terms, and a positive total") {
    // days 1-2 = expected (mid = d1 + (3 div 2) = d2), days 3-4 = actual
    val df = frame(
      Seq.fill(4)(("2024-01-01", 0.0)) ++ Seq.fill(4)(("2024-01-04", 1.0)))
    val out = Drift.psi(df).orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out.map(_._1) == (0L to 9L))
    // smoothed counts: bin0 e=5/a=1, bin9 e=1/a=5, middles 1/1
    assert(out.head._2 == 5L && out.head._3 == 1L)
    assert(out.last._2 == 1L && out.last._3 == 5L)
    assert(out.slice(1, 9).forall(r => r._2 == 1L && r._3 == 1L))
    // 8dp proportions of the smoothed counts (n+bins = 14 each side)
    assert(out.head._4 == 0.35714286 && out.head._5 == 0.07142857)
    // middles carry no drift; end terms mirror exactly (same |Δp|, |ln|)
    assert(out.slice(1, 9).forall(_._6 == 0.0))
    assert(out.head._6 == out.last._6 && out.head._6 > 0.4)
    val psi = out.head._7
    assert(out.forall(_._7 == psi))
    assert(math.abs(psi - 2 * out.head._6) <= 2e-4)
  }

  test("ksTwoSample: identical halves read 0; disjoint halves read 1") {
    val same = frame((1 to 2).flatMap(day =>
      Seq(0.1, 0.5, 0.9).map(v => (f"2024-01-0$day", v))))
    val s = Drift.ksTwoSample(same)
      .as[(Long, Long, Double)].head()
    assert(s == ((3L, 3L, 0.0)))
    val split = frame(Seq.fill(3)(("2024-01-01", 0.0)) ++
      Seq.fill(4)(("2024-01-04", 1.0)))
    val d = Drift.ksTwoSample(split)
      .as[(Long, Long, Double)].head()
    assert(d == ((3L, 4L, 1.0)))
  }

  test("psi: identical halves read 0 everywhere; constant values land " +
    "in bin 0 without dividing by zero") {
    val same = frame((1 to 2).flatMap(day =>
      Seq(0.05, 0.15, 0.95).map(v => (f"2024-01-0$day", v))))
    val z = Drift.psi(same).agg(max(abs(col("psi_term"))),
      max(abs(col("psi")))).as[(Double, Double)].head()
    assert(z == ((0.0, 0.0)))
    val const = frame(Seq(("2024-01-01", 3.0), ("2024-01-02", 3.0)))
    val c = Drift.psi(const).orderBy("bin")
      .select("bin", "c_expected", "c_actual")
      .as[(Long, Long, Long)].collect().toSeq
    assert(c.head == ((0L, 2L, 2L)))
    assert(c.tail.forall(r => r._2 == 1L && r._3 == 1L))
  }
}
