package graft

import java.nio.file.{Files, Paths}
import graft.operators.StagedSwap

/** Crash-window recovery for the two-phase directory swap: whatever
  * point the process dies at, exactly one complete version survives
  * and recover() makes it live. */
class StagedSwapSpec extends SparkSuite {
  import spark.implicits._

  private def v(n: Int) = Seq((n, s"v$n")).toDF("id", "tag")
  private def readTag(dir: String): String =
    spark.read.parquet(dir).select("tag").as[String].head()

  test("write + swap round-trips and replaces atomically-enough") {
    val dir = Files.createTempDirectory("graft_swap").toString + "/t"
    StagedSwap.write(v(1), dir)
    assert(readTag(dir) == "v1")
    StagedSwap.write(v(2), dir)
    assert(readTag(dir) == "v2")
    assert(!Files.exists(Paths.get(dir + "__tmp")))
    assert(!Files.exists(Paths.get(dir + "__old")))
  }

  test("crash between the two swap moves: recover restores the retired " +
    "copy instead of silently starting empty") {
    val dir = Files.createTempDirectory("graft_swap2").toString + "/t"
    StagedSwap.write(v(1), dir)
    // simulate dying right after live -> __old (no __tmp promotion):
    Files.move(Paths.get(dir), Paths.get(dir + "__old"))
    assert(!Files.exists(Paths.get(dir)))
    assert(StagedSwap.recover(dir))
    assert(readTag(dir) == "v1")
  }

  test("crash between the moves WITH a completed stage: recover " +
    "promotes the staged version (it is the newer complete copy)") {
    val dir = Files.createTempDirectory("graft_swap3").toString + "/t"
    StagedSwap.write(v(1), dir)
    StagedSwap.stage(v(2), dir) // full parquet write -> _SUCCESS marker
    Files.move(Paths.get(dir), Paths.get(dir + "__old"))
    assert(StagedSwap.recover(dir))
    assert(readTag(dir) == "v2")
    assert(!Files.exists(Paths.get(dir + "__old")))
  }

  test("an INCOMPLETE stage is never promoted: recover prefers the " +
    "retired copy and discards the partial write") {
    val dir = Files.createTempDirectory("graft_swap4").toString + "/t"
    StagedSwap.write(v(1), dir)
    StagedSwap.stage(v(2), dir)
    // fake an interrupted stage: no _SUCCESS marker
    Files.delete(Paths.get(dir + "__tmp").resolve("_SUCCESS"))
    Files.move(Paths.get(dir), Paths.get(dir + "__old"))
    assert(StagedSwap.recover(dir))
    assert(readTag(dir) == "v1")
    assert(!Files.exists(Paths.get(dir + "__tmp")))
  }

  test("recover on a never-written target reports no state") {
    val dir = Files.createTempDirectory("graft_swap5").toString + "/t"
    assert(!StagedSwap.recover(dir))
  }
}
