package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE training/encoding: the merge sequence on a hand-computable
  * corpus, encode/decode round trip, monotone compression with more
  * merges, and the no-shuffle encode plan. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // the classic BPE illustration corpus: word frequencies chosen so
  // the merge order is hand-derivable
  private lazy val tiny = Seq(
    (0L, Seq.fill(5)("low").mkString(" ")),
    (1L, Seq.fill(2)("lower").mkString(" ")),
    (2L, Seq.fill(6)("newest").mkString(" ")),
    (3L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("train reproduces the hand-derived merge sequence on the classic corpus") {
    val merges = Bpe.train(tiny, nMerges = 4)
      .orderBy("rank").as[(Long, String, String, String)].collect()
    // pair counts round 1: (e,s)=9, (s,t</w>)=9, (w,e)=8(newest 6 + lower 2)...
    // ties at 9 break lexicographically: ("e","s") < ("s","t</w>")
    assert(merges(0) == ((0L, "e", "s", "es")))
    // round 2: (es, t</w>) = 9 is now the max
    assert(merges(1) == ((1L, "es", "t</w>", "est</w>")))
    // round 3: (l,o) = 7 (low 5 + lower 2)
    assert(merges(2) == ((2L, "l", "o", "lo")))
    // round 4: (n,e)=(e,w)=(w,est</w>)=6 three-way tie, (lo,w</w>)=5;
    // lexicographic on (left, right): ("e","w") wins
    assert(merges(3) == ((3L, "e", "w", "ew")))
  }

  test("encode applies merges greedily by rank; decode round-trips") {
    val merges = Bpe.train(tiny, nMerges = 4)
    val enc = Bpe.encode(tiny, merges).orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect()
    // "low" with merges {es, est</w>, lo, ne}: l o w</w> -> lo w</w>
    assert(enc(0)._2.take(2) == Seq("lo", "w</w>"))
    // "newest": n e w e s t</w> -> es(r0) -> est</w>(r1) -> ew(r3):
    // [n, ew, est</w>]
    assert(enc(2)._2.take(3) == Seq("n", "ew", "est</w>"))
    // round trip on every doc
    tiny.as[(Long, String)].collect().zip(enc).foreach {
      case ((_, text), (_, toks, n)) =>
        assert(Bpe.decode(toks) == text.trim.split("\\s+").mkString(" "))
        assert(n == toks.length.toLong)
    }
  }

  test("more merges never lengthen the encoding; fixture corpus compresses") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m10 = Bpe.train(docs, nMerges = 10, maxWordTypes = 5000)
    val m40 = Bpe.train(docs, nMerges = 40, maxWordTypes = 5000)
    assert(m10.count() == 10 && m40.count() == 40)
    // rank table prefix-stable: the first 10 merges agree
    val p10 = m10.orderBy("rank").collect().toSeq
    val p40 = m40.orderBy("rank").limit(10).collect().toSeq
    assert(p10 == p40)
    def totalTokens(m: org.apache.spark.sql.DataFrame): Long =
      Bpe.encode(docs, m).agg(sum("n_bpe_tokens")).head().getLong(0)
    val t10 = totalTokens(m10)
    val t40 = totalTokens(m40)
    val t0 = totalTokens(m10.limit(0))
    assert(t40 <= t10 && t10 <= t0)
    assert(t40 < t0) // merges actually fire on real text
  }

  test("encode is map-side: no Exchange in the executed plan") {
    val merges = Bpe.train(tiny, nMerges = 2)
    val plan = Bpe.encode(tiny, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("fertilityStats counts merged words and exact ratios") {
    // with the full 4-merge table: "low" -> l o w</w> with (l,o)->lo
    // merged: lo w</w> = 2 tokens; "newest" -> n ew est</w> = ... walk
    // is involved, so pin against encode itself instead of by hand
    val merges = Bpe.train(tiny, nMerges = 4)
    val enc = Bpe.encode(tiny, merges)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val got = Bpe.fertilityStats(tiny, merges)
      .select("doc_id", "n_words", "n_bpe_tokens", "n_merged_words",
        "fertility")
      .as[(Long, Long, Long, Long, Double)].collect()
    got.foreach { case (id, nw, nt, nm, fert) =>
      assert(nt == enc(id), s"doc $id token count")
      assert(nm <= nw)
      assert(fert == math.rint(1e6 * nt.toDouble / nw) / 1e6 ||
        math.abs(fert - nt.toDouble / nw) < 1e-6)
    }
    // doc 0 is "low"x5: every word encodes identically, so merged is
    // 0 or 5, never partial
    val d0 = got.find(_._1 == 0L).get
    assert(d0._4 == 0L || d0._4 == 5L)
    // empty doc: null ratios, zero counts
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val e = Bpe.fertilityStats(empty, merges)
      .select("n_words", "fertility")
      .as[(Long, Option[Double])].head()
    assert(e == ((0L, None)))
  }
}
