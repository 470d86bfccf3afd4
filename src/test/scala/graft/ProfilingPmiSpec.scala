package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, Relevance}

/** Round-7 batch: column profiler, PMI collocations, and the hybrid
  * (filtered) vector search entry (q156-q159 support). */
class ProfilingPmiSpec extends SparkSuite {
  import spark.implicits._

  test("profile: rows / nulls / exact distincts per column in one " +
    "aggregation pass") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), None),
      (3L, None, Some(2.0)), (4L, Some("b"), Some(2.0))
    ).toDF("id", "s", "v")
    val out = Profiling.profile(df, Seq("id", "s", "v"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("id", 4L, 0L, 4L), ("s", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
    // one scan: a single aggregate (Expand-based multi-distinct), no
    // join/union of per-column passes
    val plan = Profiling.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"), plan)
  }

  test("pmiPairs: always-together tokens get pmi ln(n/df), " +
    "independent tokens get ~0, min-support gates the tail") {
    // 8 docs: "x y" in 4 docs (always together), "p" in all 8 with
    // "q" in 4 of them (independent-ish), one rare pair below support
    val docs = Seq(
      (1L, "x y p q"), (2L, "x y p"), (3L, "x y p q"), (4L, "x y p"),
      (5L, "p q rare1 rare2"), (6L, "p"), (7L, "p q"), (8L, "p")
    ).toDF("doc_id", "text")
    val out = Relevance.pmiPairs(docs, minPairDocs = 4)
      .orderBy("token_a", "token_b")
      .select("token_a", "token_b", "df_ab", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // x,y: df_x = df_y = df_xy = 4, pmi = ln(8*4/16) = ln 2
    assert(m(("x", "y"))._1 == 4L)
    assert(math.abs(m(("x", "y"))._2 - math.log(2.0)) < 1e-4)
    // p,q: df_p = 8, df_q = 4, df_pq = 4 -> pmi = ln(8*4/32) = 0
    assert(m(("p", "q"))._2 == 0.0)
    // rare1/rare2 co-occur once — below min support
    assert(!m.contains(("rare1", "rare2")))
  }

  test("bm25: a doc matching more query tokens outranks one matching " +
    "fewer; non-matching docs are absent; idf favors rare terms") {
    val docs = Seq(
      (1L, "spark join window extra pad pad"),
      (2L, "spark pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad"),
      (4L, "join spark pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25(docs, Seq("spark", "join", "window"),
        topK = 10)
      .orderBy("rank").select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 4L, 2L)) // 3 matches > 2 > 1
    assert(!out.exists(_._1 == 3L))
    assert(out.map(_._3).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
  }

  test("lexicalDiversity: hand-computed TTR/hapax/entropy on a " +
    "2-type doc; empty doc yields zero counts and null scores") {
    val docs = Seq((1L, "a a a b"), (2L, ""))
      .toDF("doc_id", "text")
    val out = Relevance.lexicalDiversity(docs).orderBy("doc_id")
      .collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 2L &&
      r1.getLong(3) == 1L)
    assert(r1.getDouble(4) == 0.5)      // ttr = 2/4
    assert(r1.getDouble(5) == 0.5)      // hapax = 1/2
    // H = -(3/4 ln 3/4 + 1/4 ln 1/4) = 0.5623 (4dp)
    assert(math.abs(r1.getDouble(6) - 0.5623) < 1e-9)
    val r2 = out(1)
    assert(r2.getLong(1) == 0L && r2.isNullAt(6))
  }

  test("pmiPairs counts DOCUMENT frequency: repeated tokens within a " +
    "doc count once") {
    val docs = Seq((1L, "a b a b a b"), (2L, "a b"), (3L, "a"),
      (4L, "b")).toDF("doc_id", "text")
    val out = Relevance.pmiPairs(docs, minPairDocs = 1)
      .select("token_a", "token_b", "df_ab", "df_a", "df_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", "b", 2L, 3L, 3L)))
  }
}
