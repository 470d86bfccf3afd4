package graft

import org.apache.spark.sql.functions._
import graft.operators.EventSeries

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(86400 + s))

  test("dailyFunnel: steps must happen in order within the day") {
    val events = Seq(
      // user 1: view -> click -> purchase, fully ordered: reached 3
      (1L, ts(10), "view"), (1L, ts(20), "click"),
      (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE the first view: only view counts
      (2L, ts(10), "purchase"), (2L, ts(20), "view"),
      // user 3: click only, no view: reached 0
      (3L, ts(10), "click"),
      // user 4: view then click, click-before-view ignored
      (4L, ts(5), "click"), (4L, ts(10), "view"), (4L, ts(15), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventSeries.dailyFunnel(events)
      .select("user_id", "reached").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 2L))
    // and the stage times respect the ordering constraint
    val u4 = EventSeries.dailyFunnel(events)
      .filter(col("user_id") === 4L)
      .select("t1_us", "t2_us").as[(Long, Long)].head()
    assert(u4._2 > u4._1) // the qualifying click is the LATER one
  }

  test("cohortRetention: offsets count distinct users from their " +
    "first day") {
    def t(day: Int, s: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + s))
    val events = Seq(
      (1L, t(0, 10)), (1L, t(0, 20)), (1L, t(2, 5)), // cohort d0
      (2L, t(0, 30)), // cohort d0, never returns
      (3L, t(1, 10)), (3L, t(2, 10)) // cohort d1
    ).toDF("user_id", "ts")
    val out = EventSeries.cohortRetention(events)
      .select("cohort_date", "day_offset", "n_users")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("1970-01-01", 0L)) == 2L) // users 1 and 2 on day 0
    assert(out(("1970-01-01", 2L)) == 1L) // only user 1 returns
    assert(out(("1970-01-02", 0L)) == 1L)
    assert(out(("1970-01-02", 1L)) == 1L)
    assert(out.size == 4)
  }
}
