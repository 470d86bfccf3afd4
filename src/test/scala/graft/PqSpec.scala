package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantizer => PQ, Similarity}

class PqSpec extends SparkSuite {
  import spark.implicits._

  // seeded 8-dim corpus: 3 tight clusters of 10 + 2 stragglers
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(7L)
    val centers = Seq(
      Seq.fill(8)(rng.nextDouble()), Seq.fill(8)(rng.nextDouble() + 3),
      Seq.fill(8)(rng.nextDouble() - 3))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 10
    } yield ((ci * 10 + i).toLong,
      c.map(x => (x + rng.nextGaussian() * 0.05).toFloat))
    (pts ++ Seq((100L, Seq.fill(8)(9.0f)), (101L, Seq.fill(8)(-9.0f))))
      .toDF("vec_id", "embedding")
  }

  /** Exact L2 top-k baseline, same rounding/tiebreak as adcSearch. */
  private def bruteL2(corpus: DataFrame, queries: DataFrame,
                      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      Similarity.asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-round(sqrt(PQ.sqDist(col("qv"), col("cv"))), 4)).as("sim"))
    Similarity.topKPerKey(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(-col("sim"), 4).as("dist"))
  }

  test("exact regime: k >= distinct subvectors makes ADC equal " +
    "brute-force L2 top-k") {
    val queries = corpus.filter(col("vec_id") < 3)
    val pq = PQ.pqTopK(corpus, queries, dim = 8, m = 4, k = 64,
      topK = 5)
    val exact = bruteL2(corpus, queries, 5)
    assert(pq.orderBy("query_id", "rank").collect().toSeq ==
      exact.orderBy("query_id", "rank").collect().toSeq)
  }

  test("exact regime: the codebook IS the distinct subvector set and " +
    "Lloyd is a fixed point") {
    val cb = PQ.train(corpus, dim = 8, m = 4, k = 64, iters = 8)
    val nDistinct = corpus
      .select(explode(array((0 until 4).map(s => struct(lit(s).as("s"),
        slice(Similarity.asDouble(col("embedding")), s * 2 + 1, 2)
          .as("sv"))): _*)))
      .distinct().count()
    // every distinct subvector appears in exactly one book slot
    val slots = cb.books.map(_.size).sum
    assert(slots.toLong == nDistinct)
    // idempotent: training again yields the identical codebooks
    val cb2 = PQ.train(corpus, dim = 8, m = 4, k = 64, iters = 8)
    assert(cb == cb2)
  }

  test("codes are m ids in [0, k) and encoding is deterministic") {
    val cb = PQ.train(corpus, dim = 8, m = 4, k = 8, iters = 4)
    val codes = PQ.encode(corpus, cb).orderBy("vec_id")
    val rows = codes.select(col("codes")).as[Seq[Int]].collect()
    assert(rows.forall(c => c.size == 4 && c.forall(j => j >= 0 && j < 8)))
    val again = PQ.encode(corpus, cb).orderBy("vec_id")
      .select(col("codes")).as[Seq[Int]].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("real PQ (m=4, k=8) retrieves same-cluster neighbors") {
    val queries = corpus.filter(col("vec_id").isin(0L, 10L, 20L))
    val pq = PQ.pqTopK(corpus, queries, dim = 8, m = 4, k = 8,
      topK = 5)
    // every retrieved neighbor lives in the query's own tight cluster
    // (quantization collapses within-cluster distances to ties, so the
    // exact ranking inside the cluster is not preserved — membership is)
    val got = pq.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, n) => n / 10 == q / 10 })
    // and still overlaps the exact top-5 on at least half the slots
    val exactSet = bruteL2(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.count(exactSet).toDouble / exactSet.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("tie policy: equidistant subvectors take the lowest centroid id") {
    // two distinct subvectors symmetric around the query subvector
    val tiny = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(2.0f, 0.0f))).toDF(
      "vec_id", "embedding")
    val cb = PQ.train(tiny, dim = 2, m = 1, k = 4, iters = 2)
    val probe = Seq((9L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val enc = PQ.encode(probe, cb).select("codes").as[Seq[Int]].head()
    // both centroids are at distance 1; the winner must be slot 0's id
    val d0 = math.sqrt(cb.books(0)(enc.head).zip(Seq(1.0, 0.0))
      .map { case (a, b) => (a - b) * (a - b) }.sum)
    val others = cb.books(0).zipWithIndex.filter(_._2 != enc.head)
    assert(others.forall { case (c, _) =>
      val d = math.sqrt(c.zip(Seq(1.0, 0.0))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      d > d0 || enc.head < others.head._2
    })
  }

  test("reconstructionError: the exact regime (k covers every distinct " +
    "subvector) reads 0.0 for every row; the lossy regime reads " +
    "positive, finite distortion") {
    val cbx = PQ.train(corpus, dim = 8, m = 4, k = 256)
    val exact = PQ.reconstructionError(corpus, cbx,
      PQ.encode(corpus, cbx))
    assert(exact.count() == corpus.count())
    assert(exact.filter(col("l2_distortion") =!= 0.0).count() == 0)
    val cb2 = PQ.train(corpus, dim = 8, m = 4, k = 2)
    val lossy = PQ.reconstructionError(corpus, cb2,
      PQ.encode(corpus, cb2))
      .select("l2_distortion").as[Double].collect()
    assert(lossy.length == corpus.count())
    assert(lossy.forall(d => d >= 0.0 && !d.isNaN && !d.isInfinite))
    // 32 clustered points + 2 far stragglers cannot all sit on 2
    // codewords per subspace
    assert(lossy.max > 0.0)
  }
}
