package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Boots a REAL extensions-enabled session (sharing the suite's
  * SparkContext) and drives every injected function through SQL —
  * the production `spark.sql.extensions=graft.plans.GraftExtensions`
  * path, not a temp-function approximation. */
class ExtensionsSpec extends SparkSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = spark // force suite session init first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(ext)
      finally ext.sessionState // keep; do not stop the shared context
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("all native kernels are callable from SQL in an extensions-" +
    "built session and agree with the Column API") {
    withExtendedSession { s =>
      import s.implicits._
      val row = s.sql(
        """SELECT
             cosine_sim(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS cos,
             minhash_sigs(array('a b', 'b c'), 2) AS sigs,
             simhash64(array('a', 'b')) AS sh,
             rolling_hash('a b c') AS rh,
             word_ngrams('a b c', 2) AS ng,
             token_top_count(array('x', 'y', 'x')) AS tc""").head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getSeq[String](1).length == 2)
      assert(row.getSeq[String](4) == Seq("a b", "b c"))
      assert(row.getLong(5) == 2L)

      // cross-check against the Column-API kernels on the suite session
      val df = Seq(("a b c", Seq("a b", "b c"), Seq("a", "b")))
        .toDF("text", "shingles", "toks")
      val viaCols = df.select(
        graft.plans.MinHashExpressions.minhashSigs(col("shingles"), 2),
        graft.plans.SimHashExpressions.simhash64(col("toks")),
        graft.plans.RollingHashExpressions.rollingHash(col("text")))
      val expected = viaCols.head()
      assert(row.getSeq[String](1) == expected.getSeq[String](0))
      assert(row.getLong(2) == expected.getLong(1))
      assert(row.getLong(3) == expected.getLong(2))
    }
  }
}
