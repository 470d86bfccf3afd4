package graft

import org.apache.spark.sql.functions._
import graft.jobs.CorpusPrepJob

/** The composed corpus-preparation pipeline: every stage only removes
  * or reweights rows, nothing is fabricated, and the output carries the
  * guarantees of its stages (no surviving contamination, no surviving
  * near-dup cluster siblings). */
class CorpusPrepSpec extends SparkSuite {
  import spark.implicits._

  test("pipeline runs end-to-end on the fixture corpus: monotone " +
    "ledger, clean output, deduped output") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    val (out, ledger) = CorpusPrepJob.run(corpus, evalSet)
    val counts = ledger.map(_._2)
    // every stage only removes rows
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(ledger.head._1 == "input" &&
      ledger.head._2 == corpus.count())
    assert(counts.last > 0)
    assert(out.count() == counts.last)

    // no doc in the output is contaminated against the eval set
    val dirty = graft.operators.Decontaminate
      .contaminationStats(out, evalSet, n = 5)
      .filter(col("contaminated") === 1L).count()
    assert(dirty == 0)

    // no two output docs share an exact content hash
    val dupHashes = out.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupHashes == 0)

    // schema contract for downstream packing/sharding
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source"))
  }

  test("DSIR stage keeps exactly topK target-shaped survivors and " +
    "the keep set skews toward the target language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    val (base, _) = CorpusPrepJob.run(corpus, evalSet)
    val nBase = base.count()
    val k = (nBase / 3).toInt.max(1)
    val (out, ledger) = CorpusPrepJob.run(corpus, evalSet,
      cfg = CorpusPrepJob.Config(dsirTopK = k))
    val m = ledger.toMap
    assert(m("dsir_selected") == k.toLong)
    // downstream stages only remove rows
    assert(m("decontaminated") <= k.toLong && out.count() <= k.toLong)
    // the selected slice is more English than the pre-selection pool
    val enBase = base.filter(col("lang") === "en").count().toDouble /
      nBase
    val dsirFrame = base // same survivors feed the stage
    val keptIds = graft.operators.Dsir.dsirScores(dsirFrame,
        col("lang") === "en", topK = k)
      .filter(col("kept") === 1L).select("doc_id")
    val enKept = dsirFrame.join(keptIds, Seq("doc_id"), "left_semi")
      .filter(col("lang") === "en").count().toDouble / k
    assert(enKept > enBase,
      s"DSIR keep set not target-skewed: $enKept <= $enBase")
  }

  test("token-budget stage caps the output at the best-quality prefix") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    val (out, ledger) = CorpusPrepJob.run(corpus, evalSet,
      CorpusPrepJob.Config(tokenBudget = 1500L))
    val byName = ledger.toMap
    assert(byName.contains("budget_capped"))
    assert(byName("budget_capped") <= byName("mixed"))
    assert(byName("budget_capped") > 0)
    val totalTokens = out.select(sum(
      graft.functions.TextFns.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(totalTokens <= 1500L)
  }

  test("gopher gate empties a synthetic word-soup corpus without " +
    "breaking downstream stages") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20).limit(50)
    // fixture docs carry at most one Gopher stopword type — the
    // >=2-distinct rule removes everything, and the pipeline must
    // still complete with an empty (not crashed) result
    val (out, ledger) = CorpusPrepJob.run(corpus, evalSet,
      CorpusPrepJob.Config(gopherMinWords = 1))
    assert(ledger.toMap.apply("gopher_gate") == 0L)
    assert(out.count() == 0L)
  }

  test("with the span-cut stage enabled, a doc embedding a verbatim " +
    "passage of an earlier doc keeps only its own words") {
    import spark.implicits._
    val run = ('a' to 'l').map(_.toString).mkString(" ") // 12 tokens
    // two filler docs keep the run tokens under the boilerplate
    // threshold (minDocs = ceil(1.0 * 4) = 4 > 2 docs carrying the run)
    val docs = Seq(
      (21L, "own unique words " + run + " trailing tail here", "en", "s"),
      (22L, "borrowed passage follows " + run, "en", "s"),
      (23L, "filler document one entirely distinct", "en", "s"),
      (24L, "filler document two wholly separate", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val evalSet = Seq((1L, "nothing shared with the corpus docs",
      "en", "s")).toDF("doc_id", "text", "lang", "source")
    val (out, ledger) = CorpusPrepJob.run(docs, evalSet,
      CorpusPrepJob.Config(selfSubstrMinTokens = 10, minQuality = 0.0,
        boilerplateMinDocFrac = 1.0, sampleFraction = 1.0,
        mixAlpha = 1.0))
    assert(ledger.exists(_._1 == "span_deduped"))
    val byId = out.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(byId(21L).contains(run))            // first occurrence kept
    assert(byId(22L) == "borrowed passage follows") // span cut
  }

  test("a planted eval-set copy and a planted duplicate both fall out") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val evalCopy = evalSet.limit(1)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"),
        col("lang"), col("source"))
    val corpus = docs.filter(col("doc_id") >= 20)
      .select("doc_id", "text", "lang", "source")
    val dupCopy = corpus.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"),
        col("lang"), col("source"))
    val planted = corpus.unionByName(evalCopy).unionByName(dupCopy)
    val (out, _) = CorpusPrepJob.run(planted, evalSet,
      CorpusPrepJob.Config(sampleFraction = 1.0, mixAlpha = 1.0))
    assert(out.filter(col("doc_id") >= 100000).count() == 0,
      "planted eval copy / duplicate must not survive")
  }

  test("SemDeDup stage prunes embedding near-dups among survivors only") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    // mixAlpha 1.0: the downstream mix keeps everything, so the
    // with/without outputs are set-comparable. The lexical stages
    // leave only 2 fixture docs at this SF, each its own seed
    // centroid — so the prune is forced with the k=1/tau=-1 extreme
    // (one cluster, least-prototypical survivor). The REAL threshold
    // semantics are SemDedupSpec's business; this test pins the
    // wiring: restriction to the frontier, ledger, set algebra.
    val cfg = CorpusPrepJob.Config(semDedupK = 1, semDedupTau = -1.0,
      mixAlpha = 1.0)
    val (without, ledgerOff) = CorpusPrepJob.run(corpus, evalSet, cfg)
    val (withSem, ledgerOn) =
      CorpusPrepJob.run(corpus, evalSet, cfg, Some(emb))
    assert(ledgerOn.map(_._1).contains("sem_deduped"))
    assert(!ledgerOff.map(_._1).contains("sem_deduped"))
    // the stage only removes rows, and at this tau it removes SOME
    val before = ledgerOn.takeWhile(_._1 != "sem_deduped").last._2
    val after = ledgerOn.find(_._1 == "sem_deduped").get._2
    assert(after > 0 && after < before,
      s"k=1/tau=-1 must prune to one per cluster ($before -> $after)")
    // enabling a filter stage can only shrink the final output
    val a = withSem.select("doc_id").as[Long].collect().toSet
    val b = without.select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(b))
    assert(a.size < b.size)
  }
}
