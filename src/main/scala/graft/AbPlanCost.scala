package graft

/** Scratch A/B (round 12, guide §1): split each headline query's warm
  * per-run wall time into CATALYST PLANNING (analysis + optimization +
  * physical planning, forced via `queryExecution.executedPlan` on a
  * fresh DataFrame) and EXECUTION (noop write of a pre-planned frame).
  * The sf0.1 main leg is floor-dominated (~0.2-0.35 s/query over a
  * 17 MB fixture); this names how much of that floor is driver-side
  * plan work — the part a config can move — vs actual compute.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.AbPlanCost [conf=k:v ...]'
  */
object AbPlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val extra = args.collect { case a if a.startsWith("conf=") =>
      val kv = a.stripPrefix("conf=").split(":", 2); (kv(0), kv(1)) }
    val spark = AbBench.session(extra.toIndexedSeq: _*)
    // same warm-up discipline as Bench
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    Tables.names.foreach { n =>
      try Tables.table(spark, sfDir, n).limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    var totPlan = 0.0; var totExec = 0.0; var totAll = 0.0
    Bench.headline.foreach { name =>
      // warm once (codegen cache etc.)
      SparkEntry.queries(name)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis→physical plan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val (p, e) = samples.minBy(s => s._1 + s._2)
      totPlan += p; totExec += e; totAll += p + e
      println(f"[plancost] $name%-24s plan=$p%.3f exec=$e%.3f total=${p + e}%.3f")
    }
    println(f"[plancost] TOTAL plan=$totPlan%.3f exec=$totExec%.3f all=$totAll%.3f")
    spark.stop()
  }
}
