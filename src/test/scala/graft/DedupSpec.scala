package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 4
  private def docs = Seq(
    (1L, base),                                   // original
    (2L, base),                                   // exact dup of 1
    (3L, base + "extra tail words here"),         // near dup of 1
    (4L, "completely different content about spark query engines and " +
      "distributed shuffles at warehouse scale"),
    (5L, "the dog jumps the fox " * 6)            // shares vocab, reordered
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under the min id") {
    val out = Dedup.exact(docs).orderBy("canonical_id")
      .select("canonical_id", "n_dups").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("fingerprint dedup additionally folds token-reordered copies") {
    // doc 5 is a reorder/repeat of a vocab subset — different fingerprint;
    // docs 1/2 identical fingerprints
    val fps = Dedup.byFingerprint(docs)
    assert(fps.count() == 4)
    assert(fps.filter(col("n_dups") === 2).select("canonical_id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("minhash LSH surfaces the exact and near duplicates, not the " +
    "unrelated pair") {
    val pairs = Dedup.minhashLshPairs(docs, k = 8, bands = 4, n = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard is exact: identical docs score 1.0") {
    val out = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.9)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(out.contains((1L, 2L, 1.0)))
  }

  test("minhash dedup labeling folds duplicate clusters to one " +
    "canonical id in linear output") {
    val labels = Dedup.minhashDedupGroups(docs, k = 8, bands = 4, n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 5)          // one row per doc, never pairs
    assert(labels(1L) == 1L && labels(2L) == 1L) // exact dups cluster
    assert(labels(3L) == 1L)          // near dup joins the cluster
    assert(labels(4L) == 4L)          // unrelated doc stays canonical
  }

  test("degenerate docs (null / empty / single-token text) are " +
    "singletons, never clustered with each other") {
    val degenerate = Seq(
      (10L, base), (11L, base),      // a real dup cluster as control
      (20L, null.asInstanceOf[String]),
      (21L, ""),
      (22L, "solo")                  // one token → no bigram shingles
    ).toDF("doc_id", "text")
    val labels = Dedup.minhashDedupGroups(degenerate, k = 8, bands = 4,
        n = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 5)                       // every doc labeled
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(labels(20L) == 20L && labels(21L) == 21L && labels(22L) == 22L)
    val pairs = Dedup.minhashLshPairs(degenerate, k = 8, bands = 4, n = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))               // no degenerate pairs
  }

  test("simhash pairs exact and near duplicates within small hamming") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))   // hamming 0
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding near-dup labels have converged (an extra round " +
    "changes nothing) and every cosine edge's endpoints share a label") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val l6 = Dedup.embeddingNearDupGroups(emb, threshold = 0.4,
      iterations = 6)
    val l7 = Dedup.embeddingNearDupGroups(emb, threshold = 0.4,
      iterations = 7)
    assert(l6.except(l7).count() == 0 && l7.except(l6).count() == 0)
    val labels = l6.as[(Long, Long)].collect().toMap
    assert(labels.forall { case (id, c) => c <= id })
    val edges = graft.operators.Similarity
      .bruteForceSelfPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across groups")
    }
  }

  test("canonicalByQuality keeps the best-scored copy of a fingerprint " +
    "group even when it has the higher id") {
    import org.apache.spark.sql.functions.col
    // same token SET (= same fingerprint), different quality: doc 1 is
    // short so its punct-bomb token dominates char density (loses the
    // low-punct 0.3 band); doc 2 repeats clean tokens, diluting it
    val set = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa the !!!!!!!!!!"
    val planted = Seq(
      (1L, set),
      (2L, set + (" alpha the beta the" * 20)),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.canonicalByQuality(planted,
        graft.functions.TextFns.qualityScore(col("text")))
      .as[(String, Long, Double, Long)].collect()
    assert(out.length == 2)
    val dupGroup = out.find(_._4 == 2L).get
    assert(dupGroup._2 == 2L) // higher-quality copy wins, not min id
    val qualities = planted.select(
      graft.functions.TextFns.qualityScore(col("text"))).as[Double]
      .collect()
    assert(qualities(1) > qualities(0)) // the premise the test rests on
  }

  test("incremental fingerprint dedup drops corpus-seen and " +
    "within-batch duplicate docs, keeping min-id firsts — equals the " +
    "plain anti-join formulation") {
    import graft.functions.TextFns
    val corpus = Seq((100L, base), (101L, "old corpus doc about ducks"))
      .toDF("doc_id", "text")
    val corpusPrints = corpus
      .select(TextFns.fingerprint(col("text")).as("fingerprint"))
    val batch = Seq(
      (1L, base),                          // seen in corpus → dropped
      (2L, "fresh new content one"),       // new
      (3L, "fresh new content one"),       // in-batch dup of 2 → dropped
      (4L, "one content new fresh"),       // fingerprint dup of 2 → dropped
      (5L, "entirely novel writing")       // new
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalByFingerprint(corpusPrints, batch)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 5L))
    // plain formulation twin: within-batch min-id per fingerprint,
    // then anti-join corpus prints directly
    val plain = batch
      .withColumn("fingerprint", TextFns.fingerprint(col("text")))
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
      .join(corpusPrints, Seq("fingerprint"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == plain)
  }
}
