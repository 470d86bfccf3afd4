package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextClean, TextFns}
import graft.operators.{Decontaminate, Dedup, SemDedup}

/** Incremental corpus ingest — the daily-batch sibling of
  * [[CorpusPrepJob]] (which rebuilds from scratch). A new batch runs
  * the same ladder, but every dedup stage probes PERSISTED state
  * instead of re-processing the corpus: exact dedup against the
  * fingerprint set ([[Dedup.incrementalByFingerprint]]), near dedup
  * against the signature index ([[Dedup.incrementalLshDedup]]),
  * optionally SimHash near dedup against the persisted prints
  * ([[Dedup.incrementalSimhashDedup]] — when the state carries them),
  * and — when embeddings ride along — semantic dedup against the
  * frozen centroids + kept corpus ([[SemDedup.incrementalSemDedup]]).
  * The job returns the survivors, the APPENDED state for the next
  * batch, and the per-stage ledger.
  *
  * Scale shape: every stage is batch-sized work against a
  * scanned-once, never-shuffled state side (Bloom-probed fingerprint
  * column, broadcast banded batch, broadcast assigned batch). A 100 TB
  * corpus contributes three narrow side tables — fingerprints,
  * signatures, kept embeddings — and none of its text moves.
  *
  * Idempotency contract (spec-pinned): re-ingesting the SURVIVORS
  * against the state that absorbed them is a total no-op, and a
  * previously-kept doc can never re-enter. A batch's within-batch-
  * dropped near-dup orphans are the one asymmetry: the within-batch
  * verdict groups at band-collision granularity (the q58 scale
  * contract) while the index probe verifies at `minMatches` signature
  * agreement, so an orphan below the agreement bar against every
  * indexed doc may legitimately re-enter on a later crawl.
  */
object IncrementalIngestJob {

  /** Dev-only observability seam: when set, [[run]] reports each
    * stage's materialization wall time (name, seconds) — the number
    * the funnel profile attributes the fixed per-batch cost with.
    * Never set in production paths; the ledger shape is unchanged. */
  private[graft] var stageTimer: Option[(String, Double) => Unit] = None

  /** The persisted between-batches state. `fingerprints` is one
    * column (`fingerprint`, the [[TextFns.fingerprint]] hex form);
    * `sigIndex` is [[Dedup.minhashSignatures]] output; the semantic
    * pair is present only when the pipeline embeds. `centroids` stay
    * frozen between periodic re-trains (re-train = re-run
    * [[CorpusPrepJob]]); `keptEmbeddings` carries
    * (vec_id, embedding, cluster) for kept docs. `simhashPrints`
    * ((doc_id, simhash) — [[TextFns.simhash64]] over the same prepped
    * text the other indexes hash) is the optional fourth flavor:
    * when present, a SimHash near-dup stage runs after the MinHash
    * one ([[Dedup.incrementalSimhashDedup]] probe + within-batch
    * [[Dedup.hammingDedupGroups]]). */
  final case class State(fingerprints: DataFrame,
                         sigIndex: DataFrame,
                         centroids: Option[Array[(Long, Array[Double])]] = None,
                         keptEmbeddings: Option[DataFrame] = None,
                         simhashPrints: Option[DataFrame] = None)

  final case class Config(minQuality: Double = 0.25,
                          minhashK: Int = 8,
                          bands: Int = 4,
                          shingleN: Int = 2,
                          // signature-agreement dup threshold, of
                          // minhashK (6-of-8 ≈ Jaccard 0.75)
                          minMatches: Int = 6,
                          contaminationN: Int = 5,
                          contaminationThreshold: Double = 0.5,
                          semDedupTau: Double = 0.95,
                          // SimHash stage threshold (used only when
                          // the state carries simhashPrints)
                          simhashMaxHamming: Int = 3)

  /** Persist the between-batch state under `dir`: fingerprints and
    * the signature index as parquet side tables, the k-row centroid
    * array and kept embeddings only when the semantic stage is live.
    * The layout is the contract [[loadState]] reopens — the literal
    * form of "persisted state" in the class doc. */
  def saveState(state: State, dir: String): Unit = {
    state.fingerprints.write.mode("overwrite")
      .parquet(s"$dir/fingerprints")
    state.sigIndex.write.mode("overwrite").parquet(s"$dir/sig_index")
    state.centroids.foreach { cs =>
      val spark = state.fingerprints.sparkSession
      spark.createDataFrame(
          cs.toIndexedSeq.map { case (id, v) => (id, v.toSeq) })
        .toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    }
    state.keptEmbeddings.foreach(_.write.mode("overwrite")
      .parquet(s"$dir/kept_embeddings"))
    state.simhashPrints.foreach(_.write.mode("overwrite")
      .parquet(s"$dir/simhash_prints"))
  }

  /** Reopen a [[saveState]] layout. The two big side tables stay lazy
    * parquet scans; only the k-row centroid table is collected. The
    * optional-side-table probe resolves through Hadoop's FileSystem for
    * the path's scheme — a java.io.File check would read false on
    * HDFS/S3 and silently skip the semantic stage saveState wrote. */
  def loadState(spark: org.apache.spark.sql.SparkSession,
                dir: String): State = {
    def opt(sub: String): Option[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(s"$dir/$sub") else None
    }
    val centroids = opt("centroids").map(p =>
      spark.read.parquet(p).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1))
    State(spark.read.parquet(s"$dir/fingerprints"),
      spark.read.parquet(s"$dir/sig_index"),
      centroids,
      opt("kept_embeddings").map(spark.read.parquet(_)),
      opt("simhash_prints").map(spark.read.parquet(_)))
  }

  /** Reopen the UNION of several [[saveState]] layouts (a compact
    * snapshot plus the delta chain after it — the streaming wrapper's
    * r13 layout). Required tables read all their paths in one
    * multi-path parquet scan; optional side tables union over the
    * dirs that have them (None when none do); centroids — a fixed
    * k-row array, not append-only — come from the LATEST dir carrying
    * them. Equivalent to loadState(dir) when `dirs` has one element. */
  def loadStateUnion(spark: org.apache.spark.sql.SparkSession,
                     dirs: Seq[String]): State = {
    require(dirs.nonEmpty, "need at least one state dir")
    val fs = new org.apache.hadoop.fs.Path(dirs.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def present(sub: String): Seq[String] = dirs
      .map(d => s"$d/$sub")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    def union(sub: String): Option[org.apache.spark.sql.DataFrame] = {
      val ps = present(sub)
      if (ps.isEmpty) None else Some(spark.read.parquet(ps: _*))
    }
    val centroids = present("centroids").lastOption.map(p =>
      spark.read.parquet(p).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1))
    State(
      union("fingerprints").getOrElse(sys.error(
        s"no fingerprints under any of $dirs")),
      union("sig_index").getOrElse(sys.error(
        s"no sig_index under any of $dirs")),
      centroids,
      union("kept_embeddings"),
      union("simhash_prints"))
  }

  /** Returns (survivors, appended state, per-stage ledger). The
    * survivor frame keeps the batch's columns; the appended state is
    * built from the survivors only — a doc dropped at ANY stage never
    * pollutes the indexes. `batchEmbeddings` must align vec_id with
    * the batch's doc_id (the corpus convention).
    *
    * Cache contract: each stage caches and unpersists its superseded
    * predecessor, so the RETURNED survivor frame is still cached —
    * long-lived callers should `survivors.unpersist()` once the
    * survivors and appended state are written (the streaming wrapper
    * does; a leak here compounds one frame per micro-batch).
    *
    * (r13 note: a "lean" mode skipping the per-stage counts — pure
    * instrumentation — was A/B'd and REJECTED: without the eager
    * materialization the lazily-cached stages race-recompute under
    * the ladder's fan-out inside the caller's first action, and
    * StreamingThroughput read 10-22 s/batch vs 8-11 s with the eager
    * counts. The counts stay.) */
  def run(state: State, batch: DataFrame, evalSet: DataFrame,
          cfg: Config = Config(),
          batchEmbeddings: Option[DataFrame] = None)
      : (DataFrame, State, Seq[(String, Long)]) = {
    require(state.centroids.isDefined == state.keptEmbeddings.isDefined,
      "semantic state must come as a (centroids, keptEmbeddings) pair")
    val ledger = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    var previous: DataFrame = null
    def stage(name: String, df: DataFrame): DataFrame = {
      val cached = df.cache()
      val t0 = System.nanoTime()
      ledger += name -> cached.count()
      stageTimer.foreach(_(name, (System.nanoTime() - t0) / 1e9))
      if (previous != null) previous.unpersist()
      previous = cached
      cached
    }

    val input = stage("input", batch.select(
      col("doc_id"), col("text"), col("lang"), col("source")))

    // map-side gates first (cheapest per row, shrink before any probe):
    // same canonicalize → scrub → quality order as CorpusPrepJob, so a
    // batch ingested incrementally hashes identically to one that went
    // through the full rebuild — the property that keeps the two jobs'
    // indexes interchangeable
    val canonical = stage("canonicalized", input.withColumn("text",
      TextClean.canonicalizeClasses(col("text"))))
    val scrubbed = stage("scrubbed", canonical.withColumn("text",
      TextClean.scrub(col("text"))))
    val scored = stage("quality_gate", scrubbed
      .filter(TextFns.qualityScore(col("text")) >= cfg.minQuality))

    // benchmark decontamination (eval side broadcasts)
    val decontaminated = stage("decontaminated", Decontaminate.clean(
      scored, evalSet, cfg.contaminationN, cfg.contaminationThreshold))

    // exact dedup: within batch + against the fingerprint set
    // (Bloom-probed state scan, broadcast resolve). The ledger just
    // counted the decontaminated frame — reuse it for bloom sizing
    // instead of paying incrementalByFingerprint's own count action.
    val exactDeduped = stage("exact_deduped",
      Dedup.incrementalByFingerprint(state.fingerprints, decontaminated,
        expectedItems = Some(ledger.last._2)))

    // near dedup, two verdicts: (a) the banded probe of the signature
    // index at `minMatches` agreement (corpus wins); (b) within-batch
    // group labeling at band-collision granularity (the q58 scale
    // contract — min-id canonical survives). Both are batch-sized.
    val nearVerdicts = Dedup.incrementalLshDedup(state.sigIndex,
      exactDeduped, cfg.minhashK, cfg.bands, cfg.shingleN,
      cfg.minMatches)
    val vsIndex = exactDeduped.join(
      nearVerdicts.filter(col("kept") === 1L).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val groups = Dedup.minhashDedupGroups(vsIndex, cfg.minhashK,
      cfg.bands, cfg.shingleN)
    val nearDeduped = stage("near_deduped", vsIndex.join(
      groups.filter(col("doc_id") === col("canonical"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi"))

    // SimHash near dedup (optional fourth flavor): the q358 probe of
    // the persisted prints, then within-batch hamming groups — the
    // same two-verdict shape as the MinHash stage above
    val simDeduped = state.simhashPrints match {
      case Some(prints) =>
        val verdicts = Dedup.incrementalSimhashDedup(prints,
          nearDeduped, cfg.simhashMaxHamming)
        val vsPrints = nearDeduped.join(
          verdicts.filter(col("kept") === 1L).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        val hashed = vsPrints.select(col("doc_id"),
          TextFns.simhash64(col("text")).as("simhash"))
        val groups = Dedup.hammingDedupGroups(hashed, "simhash",
          "doc_id", cfg.simhashMaxHamming)
        stage("simhash_deduped", vsPrints.join(
          groups.filter(col("doc_id") === col("canonical"))
            .select(col("doc_id")),
          Seq("doc_id"), "left_semi"))
      case None => nearDeduped
    }

    // semantic dedup (optional): assigned batch probes the kept corpus
    val survivors = (state.centroids, state.keptEmbeddings,
        batchEmbeddings) match {
      case (Some(cs), Some(kept), Some(be)) =>
        val verdicts = SemDedup.incrementalSemDedup(cs, kept,
          be.join(simDeduped.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi"),
          cfg.semDedupTau)
        stage("sem_deduped", simDeduped.join(
          verdicts.filter(col("kept"))
            .select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_semi"))
      case (Some(_), Some(_), None) => simDeduped // no batch vectors
      case _ => simDeduped
    }

    // append the indexes from SURVIVORS only
    val delta = stateContribution(state, survivors, cfg,
      batchEmbeddings)
    val newKept = (state.keptEmbeddings, delta.keptEmbeddings) match {
      case (Some(kept), Some(dk)) =>
        // normalize the vector dtype across the union: assign emits
        // double arrays, a raw embeddings table may carry floats
        Some(kept.select(col("vec_id"),
            graft.operators.Similarity.asDouble(col("embedding"))
              .as("embedding"), col("cluster"))
          .unionByName(dk))
      case _ => state.keptEmbeddings
    }
    (survivors,
      State(state.fingerprints.unionByName(delta.fingerprints),
        state.sigIndex.unionByName(delta.sigIndex),
        state.centroids, newKept,
        state.simhashPrints.map(_.unionByName(
          delta.simhashPrints.get))),
      ledger.toList)
  }

  /** The per-batch state DELTA [[run]] appends: index rows built from
    * this batch's survivors only, shaped like a [[State]] whose tables
    * hold just the contribution. Split out so the streaming wrapper
    * can persist DELTAS instead of full snapshots (the full rewrite
    * grew O(state) per micro-batch); `run`'s appended state is
    * exactly `state ∪ stateContribution(...)` table-by-table, so the
    * two persisted layouts replay identically. Optional tables follow
    * the live stages: simhash delta exists iff the state carries
    * prints, kept-embeddings delta iff the semantic stage is live AND
    * the batch shipped vectors. */
  def stateContribution(state: State, survivors: DataFrame, cfg: Config,
                        batchEmbeddings: Option[DataFrame] = None)
      : State = {
    val deltaKept = (state.centroids, state.keptEmbeddings,
        batchEmbeddings) match {
      case (Some(cs), Some(_), Some(be)) =>
        val survivorVecs = be.join(
          survivors.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_semi")
        Some(SemDedup.assign(survivorVecs, cs)
          .select(col("vec_id"), col("vec").as("embedding"),
            col("cluster")))
      case _ => None
    }
    State(
      survivors.select(TextFns.fingerprint(col("text"))
        .as("fingerprint")),
      Dedup.minhashSignatures(survivors, cfg.minhashK, cfg.shingleN),
      state.centroids,
      deltaKept,
      state.simhashPrints.map(_ => survivors.select(col("doc_id"),
        TextFns.simhash64(col("text")).as("simhash"))))
  }
}
