package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: TF-IDF over whitespace tokens. The
  * term-frequency and document-frequency aggregations are both partial
  * (map-side combine), the corpus size is a broadcast 1-row frame (no
  * driver-side collect in the plan), and the per-doc top-k is a window
  * over the doc partition — shuffles are by (doc, token), token, and
  * doc; nothing is ever quadratic or driver-bound.
  */
object Relevance {

  /** Top-`k` tokens per document by tf·idf (idf = ln(N/df); score desc,
    * token asc tiebreak). Output: (idCol, rank, token, tf, tfidf). */
  def tfIdfTopK(docs: DataFrame, k: Int = 5, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(graft.functions.TextFns.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val byScore = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("token"), col("tf").cast("long").as("tf"),
        round(col("score"), 6).as("tfidf"))
  }
}
