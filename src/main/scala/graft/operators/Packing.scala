package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Sequence packing for training: lay each shard's documents on a token
  * tape in deterministic order and cut fixed-size sequences
  * (GPT-style concat-and-chunk — docs may span a sequence boundary).
  *
  * Each doc's placement is pure coordinate arithmetic over a running
  * token count, so packing is ONE window cumsum per shard — a single
  * shuffle on the shard key — where a greedy driver-side packer doesn't
  * distribute at all. Shards (lang here, (shard_id) in production) keep
  * each window's state independent; there is no global sort.
  */
object Packing {

  /** Per-document sliding-window chunking: fixed `size`-token windows
    * every `stride` tokens (stride < size overlaps; stride == size
    * tiles) — the chunk-for-embedding / retrieval-indexing primitive
    * that precedes vector search over long documents.
    *
    * Pure map + Generate: tokenize once, explode the window-start
    * arithmetic-progression, slice the BOUND token array per start —
    * no shuffle, no second tokenization, linear in corpus tokens.
    * Exact relational algebra end to end (q114 hash oracle). Output:
    * (id, chunk_id, chunk_text, n_tokens); the tail window may be
    * short, token-less docs emit no chunks. */
  def chunk(docs: DataFrame, size: Int, stride: Int,
            textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("w"))
      .select(col(idCol), col("w"),
        explode(when(coalesce(org.apache.spark.sql.functions.size(col("w")), lit(0)) > 0,
          sequence(lit(0),
            org.apache.spark.sql.functions.size(col("w")) - 1,
            lit(stride)))
          .otherwise(array().cast("array<int>"))).as("s"))
      .select(col(idCol),
        (col("s") / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("w"), col("s") + 1, lit(size)))
          .as("chunk_text"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("w")) - col("s"))
          .cast("long").as("n_tokens"))
  }

  /** Per-doc tape coordinates: (id, shard, n_tokens, tape_start,
    * seq_start, seq_end, seq_offset) with sequences of `seqLen` tokens.
    * Token-less docs occupy zero tape and sit at their tape position. */
  def packCoordinates(docs: DataFrame, seqLen: Int,
                      shardCol: String = "lang",
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    docs
      .select(col(idCol), col(shardCol),
        coalesce(TextFns.tokenCount(col(textCol)), lit(0)).cast("long")
          .as("n_tokens"))
      .withColumn("tape_start",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) - col("n_tokens"))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        col("tape_start"),
        expr(s"tape_start DIV $seqLen").as("seq_start"),
        when(col("n_tokens") > 0,
          expr(s"(tape_start + n_tokens - 1) DIV $seqLen"))
          .otherwise(expr(s"tape_start DIV $seqLen")).as("seq_end"),
        expr(s"tape_start % $seqLen").as("seq_offset"))
  }

  /** Padding-efficiency report for LENGTH-BUCKETED batching (the
    * pad-to-longest alternative to the packed tape above): docs are
    * bucketed by `binSize` token-length bins, ordered inside each bin
    * by md5 hash (deterministic pseudo-shuffle) and cut into
    * `batchSize`-doc batches; each batch pads every doc to its longest
    * member. Reports, per bin, real vs padding tokens and the exact
    * pad ratio — ALL-INTEGER until the final bridge ratio. The sort
    * is per-bin (bounded key space); at volume the same accounting
    * runs with per-partition batch formation inside each bin —
    * batches never straddle bins either way. */
  def paddingWaste(docs: DataFrame, binSize: Int = 64,
                   batchSize: Int = 8, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(binSize > 0 && batchSize > 0, "binSize/batchSize must be > 0")
    val base = docs.select(col(idCol),
      coalesce(TextFns.tokenCount(col(textCol)), lit(0)).cast("long")
        .as("n_tok"))
    val binned = base.withColumn("bin",
      expr(s"n_tok DIV $binSize"))
    val w = Window.partitionBy(col("bin"))
      .orderBy(graft.plans.FastMd5.column(col(idCol).cast("string")),
        col(idCol))
    val batches = binned
      .withColumn("batch",
        floor((row_number().over(w) - lit(1)) / lit(batchSize))
          .cast("long"))
      .groupBy(col("bin"), col("batch"))
      .agg(count(lit(1)).as("bsz"), max(col("n_tok")).as("maxt"),
        sum(col("n_tok")).cast("long").as("sumt"))
    batches.groupBy(col("bin"))
      .agg(sum(col("bsz")).cast("long").as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum(col("sumt")).cast("long").as("real_tokens"),
        sum(col("bsz") * col("maxt") - col("sumt")).cast("long")
          .as("padding_tokens"))
      .select(col("bin"), col("n_docs"), col("n_batches"),
        col("real_tokens"), col("padding_tokens"),
        graft.functions.ExactRound.ratio(col("padding_tokens"),
          greatest(col("real_tokens") + col("padding_tokens"), lit(1L)),
          4).as("pad_ratio"))
  }
}
