package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityFilters

/** Gopher/MassiveText rule gate: each rule pinned on a crafted document
  * that violates exactly that rule (the fixture corpus has no newlines,
  * so the line rules only bind here). */
class QualityFiltersSpec extends SparkSuite {
  import spark.implicits._

  // 60 words of clean prose-ish text that passes every rule
  private val good = (("the data and model that have to work with scale " +
    "well under load because every stage keeps its partial state " +
    "small and mergeable across executors so a failure of one node " +
    "never forces a global recompute of the full corpus which is " +
    "the property that makes this able to run at volume") + "").trim

  private def flagsOf(text: String): Map[String, Long] = {
    val row = QualityFilters.gopherFlags(
      Seq((1L, text)).toDF("doc_id", "text"), minWords = 50).head()
    row.schema.fieldNames.zipWithIndex.collect {
      case (n, i) if n.startsWith("flag_") || n == "keep" =>
        n -> row.getLong(i)
    }.toMap
  }

  test("clean document passes all seven rules") {
    val f = flagsOf(good)
    assert(f.values.forall(_ == 1L), s"unexpected failures: $f")
  }

  test("word-count bounds") {
    assert(flagsOf("too short")("flag_word_count") == 0L)
    assert(flagsOf(good)("flag_word_count") == 1L)
  }

  test("mean word length must be 3..10 chars") {
    val shortWords = Seq.fill(60)("a b the of").mkString(" ")
    assert(flagsOf(shortWords)("flag_mean_word_len") == 0L)
    val longWords = Seq.fill(60)("incomprehensibilities").mkString(" ")
    assert(flagsOf(longWords)("flag_mean_word_len") == 0L)
  }

  test("symbol-to-word ratio: # and ... both count") {
    assert(flagsOf(good + " # # # # # # # #")("flag_symbol_ratio") == 0L)
    assert(flagsOf(good + " ... ... ... ... ... ... ...")
      ("flag_symbol_ratio") == 0L)
    assert(flagsOf(good)("flag_symbol_ratio") == 1L)
  }

  test("bullet-line fraction < 90%") {
    // 10 lines, 9 bullets → 90% exactly → fails (strict <)
    val bullety = (Seq.fill(9)("- " + good.take(40)) :+ good).mkString("\n")
    assert(flagsOf(bullety)("flag_bullet_lines") == 0L)
    val some = (Seq.fill(2)("* item") ++ Seq.fill(8)(good.take(40)))
      .mkString("\n")
    assert(flagsOf(some)("flag_bullet_lines") == 1L)
  }

  test("ellipsis-terminated-line fraction < 30%") {
    val elly = (Seq.fill(3)(good.take(30) + "...") ++
      Seq.fill(7)(good.take(30))).mkString("\n")
    assert(flagsOf(elly)("flag_ellipsis_lines") == 0L)
    val fine = (Seq.fill(2)(good.take(30) + "...") ++
      Seq.fill(8)(good.take(30))).mkString("\n")
    assert(flagsOf(fine)("flag_ellipsis_lines") == 1L)
  }

  test("80% of words must contain a letter") {
    val numeric = (good.split(" ").take(30) ++
      Seq.fill(31)("12345")).mkString(" ")
    assert(flagsOf(numeric)("flag_alpha_words") == 0L)
  }

  test("at least two distinct Gopher stopwords") {
    val noStops = Seq.fill(60)("alpha beta gamma delta").mkString(" ")
    assert(flagsOf(noStops)("flag_stopwords") == 0L)
    val oneStop = "the " + Seq.fill(60)("alpha beta gamma").mkString(" ")
    assert(flagsOf(oneStop)("flag_stopwords") == 0L)
    val twoStops = "the with " + Seq.fill(60)("alpha beta gamma")
      .mkString(" ")
    assert(flagsOf(twoStops)("flag_stopwords") == 1L)
  }

  test("keep is the conjunction; gopherFilter applies it without a join") {
    val docs = Seq(
      (1L, good),                      // keeps
      (2L, "too short"),               // word count fails
      (3L, good + " # # # # # # # #")  // symbol ratio fails
    ).toDF("doc_id", "text")
    val kept = QualityFilters.gopherFilter(docs, minWords = 50)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // pure predicate over the scan: no Exchange, no join in the plan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("lengthOutlierFlags: bounds are the group percentiles, flags " +
    "match a naive recompute, broadcast join shape") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = QualityFilters.lengthOutlierFlags(docs).cache()
    assert(out.count() == docs.count())
    // naive per-group recompute via sorted interpolation
    val byLang = docs.select("lang", "n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (l, rows) => (l, rows.map(_._2.toDouble).sorted) }
    def interp(v: Seq[Double], p: Double): Double = {
      val idx = p * (v.length - 1)
      val lo = idx.floor.toInt; val hi = idx.ceil.toInt
      v(lo) + (idx - lo) * (v(hi) - v(lo))
    }
    out.select("lang", "n_chars", "within_bounds")
      .as[(String, Long, Boolean)].collect().foreach {
        case (l, n, w) =>
          val v = byLang(l)
          val want = n >= interp(v, 0.01) && n <= interp(v, 0.99)
          assert(w == want, s"lang=$l n=$n flag=$w want=$want")
      }
    // some rows flagged out on the fixture, most kept
    val nOut = out.filter(!col("within_bounds")).count()
    assert(nOut > 0 && nOut < out.count() / 10)
    // the bounds side is a broadcast join, not a shuffle join
    val plan = QualityFilters.lengthOutlierFlags(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("madOutlierFlags: hand-computed median/MAD, robust to the " +
    "outlier itself") {
    // group a: values 10,12,14,16,1000 -> med 14, adev {4,2,0,2,986},
    // MAD 2 -> inliers are |x-14| <= 6: the 1000 is the only outlier.
    // Even-count group b: 1,2,3,4 -> med 2.5, adev {1.5,.5,.5,1.5},
    // MAD interpolates to 1.0 -> all within 3 MADs.
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 12L), (3L, "a", 14L), (4L, "a", 16L),
      (5L, "a", 1000L),
      (6L, "b", 1L), (7L, "b", 2L), (8L, "b", 3L), (9L, "b", 4L)
    ).toDF("doc_id", "source", "n_chars")
    val out = QualityFilters.madOutlierFlags(docs)
      .select("doc_id", "med", "mad", "is_inlier")
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(5L) == ((5L, 14.0, 2.0, 0L)))
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._4 == 1L))
    assert(out(6L) == ((6L, 2.5, 1.0, 1L)))
    assert(Seq(6L, 7L, 8L, 9L).forall(out(_)._4 == 1L))
    // both per-group aggregates come back as broadcast joins
    val plan = QualityFilters.madOutlierFlags(docs)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("piiIncidence: doc-level flags roll per source; clean docs " +
    "contribute zero density") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at bob@example.com please", "A"),
      (2L, "see https://example.org/page now", "A"),
      (3L, "call +1 (555) 123-4567 today", "A"),
      (4L, "nothing sensitive here at all", "A"),
      (5L, "plain text", "B")
    ).toDF("doc_id", "text", "source")
    val out = QualityFilters.piiIncidence(docs).orderBy("source")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // A: 4 docs, one of each PII kind → density 3/12 = 0.25
    assert(out == Seq(("A", 4L, 1L, 1L, 1L, 0.25),
      ("B", 1L, 0L, 0L, 0L, 0.0)))
  }

  test("lineShapeStats: hand-classified 5-line doc (bullet, caps, " +
    "numeric, short) with exact ratios; empty lines are not counted") {
    import spark.implicits._
    val text = "- item\nHELLO WORLD\n123,45\nok\n\nlong line with many words"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = QualityFilters.lineShapeStats(df)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].head()
    //            lines bullet caps numeric short  b_ratio s_ratio
    assert(out == ((1L, 5L, 1L, 1L, 1L, 4L, 0.2, 0.8)))
    // zero-shuffle plan: pure map over the scan
    val plan = QualityFilters.lineShapeStats(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
