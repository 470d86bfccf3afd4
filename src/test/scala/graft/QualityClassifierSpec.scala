package graft

import org.apache.spark.sql.functions._
import graft.ml.QualityClassifier

/** Model-based quality scoring: separation on planted data, map-side
  * scoring plan, and run-to-run determinism. */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  // two lexically disjoint registers: "reference" prose vs junk soup
  private def refDoc(i: Int) =
    s"the quick study of history shows that careful writing endures $i"
  private def junkDoc(i: Int) =
    s"click here buy now cheap deal winner prize $i zzz"

  private lazy val labeled = (
    (0 until 40).map(i => (refDoc(i), 1.0)) ++
      (0 until 40).map(i => (junkDoc(i), 0.0))
    ).toDF("text", "label")

  test("classifier separates held-out reference from junk text") {
    val model = QualityClassifier.train(labeled)
    val holdout = (
      (100 until 110).map(i => (i.toLong, refDoc(i), 1.0)) ++
        (100 until 110).map(i => (i.toLong, junkDoc(i), 0.0))
      ).toDF("doc_id", "text", "want")
    val scored = QualityClassifier.score(holdout, model)
    val rows = scored.select("doc_id", "quality_prob", "want")
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (id, p, want) =>
      if (want == 1.0) assert(p > 0.5, s"doc $id ref scored $p")
      else assert(p < 0.5, s"doc $id junk scored $p")
    }
    // keep flag mirrors the threshold
    val kept = scored.filter(col("keep")).count()
    assert(kept == 10)
  }

  test("scoring is deterministic run to run and map-side (no shuffle)") {
    val m1 = QualityClassifier.train(labeled)
    val m2 = QualityClassifier.train(labeled)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def probs(m: QualityClassifier.Model) =
      QualityClassifier.score(docs, m)
        .select("doc_id", "quality_prob")
        .as[(Long, Double)].collect().toMap
    assert(probs(m1) == probs(m2))
    val plan = QualityClassifier.score(docs, m1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
