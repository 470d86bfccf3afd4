package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registrar: makes the native kernels callable
  * from SQL (`SELECT cosine_sim(a, b)`). Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.Expression

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    // minhash_sigs(shingles, k): k fused md5 min-hashes, one traversal.
    // k must be a foldable int (it sizes the signature schema).
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSignatures].getName,
        "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSignatures(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children(0))))
    // word_ngrams(text, n): n must be a foldable int
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => WordNGrams(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("token_top_count"),
      new ExpressionInfo(classOf[TokenTopCount].getName,
        "token_top_count"),
      (children: Seq[Expression]) => TokenTopCount(children(0))))
  }
}
