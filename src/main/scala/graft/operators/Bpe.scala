package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Byte-pair-encoding tokenizer TRAINING and application (Sennrich et
  * al. 2016, arXiv:1508.07909) — the "train the tokenizer on the
  * corpus" step of a pretraining data pipeline (q77's vocabulary
  * reports feed humans; this feeds the model).
  *
  * Scale split, which mirrors how production tokenizer trainers
  * actually work: the CORPUS-VOLUME work is exactly one distributed
  * word-frequency aggregation (shuffle keyed by word type, map-side
  * combined) + a two-phase top-`maxWordTypes` cap — linear in the
  * 100 TB corpus, bounded output. The merge LOOP then runs on the
  * bounded word-type table driver-side (the classic exact algorithm;
  * ~V·avgLen work per merge over V ≤ 100k types is milliseconds — a
  * distributed pair-count job per merge would pay scheduling latency
  * thousands of times for no added parallelism, the anti-pattern the
  * design notes call hand-scheduling what doesn't need a cluster).
  * ENCODING is embarrassingly parallel again: merge ranks broadcast,
  * one `mapPartitions` pass, no shuffle.
  *
  * Determinism: word counts are exact; the merge argmax breaks count
  * ties on the (left, right) pair lexicographically; the word-type cap
  * breaks count ties on the word. Training is therefore a pure
  * function of the corpus — spec-pinned on a hand-computable corpus
  * (no SQL oracle: an iterative argmax is not expressible in DuckDB).
  *
  * Symbol alphabet: characters, with `</w>` appended to each word's
  * last symbol (the original paper's end-of-word marker scheme), so
  * decode is concatenation + marker strip.
  */
object Bpe {

  val EndMarker = "</w>"

  /** Scala-side twin of [[TextFns.tokens]] (whitespace split) for the
    * map-side encoder. */
  private[operators] def tokenize(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** The one corpus-volume pass: exact word-type counts, capped to the
    * top `maxWordTypes` by (count desc, word asc). */
  def wordCounts(docs: DataFrame, maxWordTypes: Int,
                 textCol: String = "text"): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxWordTypes)

  private def symbolize(word: String): Vector[String] = {
    val chars = word.map(_.toString).toVector
    chars.init :+ (chars.last + EndMarker)
  }

  /** Train `nMerges` BPE merges. Returns the merge table as rows
    * (rank, left, right, merged), rank 0 first. Fewer rows come back
    * when the vocabulary exhausts (no pair occurs twice). */
  def train(docs: DataFrame, nMerges: Int, maxWordTypes: Int = 100000,
            textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val types: Array[(Vector[String], Long)] =
      wordCounts(docs, maxWordTypes, textCol)
        .as[(String, Long)].collect()
        .filter(_._1.nonEmpty)
        .map { case (w, n) => (symbolize(w), n) }

    val vocab = scala.collection.mutable.ArrayBuffer(types: _*)
    val merges = Vector.newBuilder[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // weighted adjacent-pair counts over the word-type table
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => exhausted = true
        case Some(((a, b), _)) =>
          merges += ((rank, a, b))
          val ab = a + b
          var i = 0
          while (i < vocab.length) {
            val (syms, n) = vocab(i)
            if (syms.length > 1) {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += ab; j += 2
                } else { out += syms(j); j += 1 }
              }
              vocab(i) = (out.result(), n)
            }
            i += 1
          }
          rank += 1
      }
    }
    merges.result()
      .toDF("rank", "left", "right")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), concat(col("left"), col("right")).as("merged"))
  }

  /** Apply trained merges to one word (greedy lowest-rank-first — the
    * standard BPE encode). `ranks` maps (left, right) → rank. */
  private[operators] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = symbolize(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+
        (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Encode every document with a trained merge table: one broadcast
    * of the ranks, one map-side pass, no shuffle. Output per doc:
    * the BPE token sequence and its length (the sequence-length
    * budget planners consume). */
  def encode(docs: DataFrame, mergeTable: DataFrame,
             textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergeTable
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect()
      .map { case (r, a, b) => ((a, b), r) }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val src: Dataset[(Long, String)] = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    src.mapPartitions { it =>
      val r = bc.value
      // word-level memo: natural text repeats word types heavily, and
      // BPE encoding is a pure function of the word
      val memo = new scala.collection.mutable.HashMap[String, Vector[String]]()
      it.map { case (id, text) =>
        val toks = tokenize(text)
          .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, r)))
        (id, toks, toks.length.toLong)
      }
    }.toDF(idCol, "bpe_tokens", "n_bpe_tokens")
  }

  /** Per-word-TYPE encoded length (word, n_toks): the bounded
    * model-state view of [[encode]] — BPE encoding is a pure function
    * of the word, so the corpus-level token counts factor through this
    * table exactly (`n_bpe_tokens(doc) = Σ_{w ∈ doc} n_toks(w)`).
    * q112/q130 persist it so the DuckDB oracle can replay the
    * corpus-application layer (doc → words → join → sum) relationally
    * and cross-check [[encode]]/[[fertilityStats]]'s map-side pass;
    * only the per-type lengths themselves pass through. Same broadcast
    * ranks, one distinct + map pass — vocabulary-bounded output. */
  def wordTokenCounts(docs: DataFrame, mergeTable: DataFrame,
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergeTable
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect()
      .map { case (r, a, b) => ((a, b), r) }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .distinct().as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWord(w, r).length.toLong))
      }.toDF("word", "n_toks")
  }

  /** Decode = concatenate and strip the end markers: the round-trip
    * identity (`decode(encode(w)) == w`) the spec pins. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndMarker, " ").trim

  /** Tokenizer-fit report per document: word count, BPE token count,
    * fully-merged ("in-vocab") words, and the two curation ratios —
    * fertility (BPE tokens per word; high → the tokenizer fragments
    * this text, the sequence budget balloons) and split rate (share of
    * words NOT merged to a single token). Same broadcast-ranks
    * map-side pass as [[encode]] (word-level memo, no shuffle); ratios
    * in exact integer arithmetic. Rows-only surface (BPE state is not
    * SQL-replayable) — BpeSpec pins the counts on a hand-built merge
    * table. */
  def fertilityStats(docs: DataFrame, mergeTable: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergeTable
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect()
      .map { case (r, a, b) => ((a, b), r) }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val src = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    val counted = src.mapPartitions { it =>
      val r = bc.value
      val memo = new scala.collection.mutable.HashMap[String, Int]()
      it.map { case (id, text) =>
        val words = tokenize(text)
        var toks = 0L
        var merged = 0L
        words.foreach { w =>
          val n = memo.getOrElseUpdate(w, encodeWord(w, r).length)
          toks += n
          if (n == 1) merged += 1
        }
        (id, words.length.toLong, toks, merged)
      }
    }.toDF(idCol, "n_words", "n_bpe_tokens", "n_merged_words")
    counted.select(col(idCol), col("n_words"), col("n_bpe_tokens"),
      col("n_merged_words"),
      when(col("n_words") > 0, graft.functions.ExactRound.ratio(
        col("n_bpe_tokens"), col("n_words"), 6)).as("fertility"),
      when(col("n_words") > 0, graft.functions.ExactRound.ratio(
        col("n_words") - col("n_merged_words"), col("n_words"), 6))
        .as("split_rate"))
  }
}
