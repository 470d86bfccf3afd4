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
}
