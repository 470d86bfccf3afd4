package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Two-phase directory overwrite with crash recovery.
  *
  * Protocol: the next version is fully materialized at `<dir>__tmp`
  * (a real parquet write — Spark leaves a `_SUCCESS` marker only on
  * completion), then `swap` retires the live dir through `<dir>__old`.
  * Every crash point is recoverable because at least one complete copy
  * always exists on disk:
  *
  *   - crash mid-stage: `__tmp` has no `_SUCCESS`; live dir untouched.
  *   - crash after live→`__old`, before `__tmp`→live: live dir missing;
  *     [[recover]] promotes a COMPLETE `__tmp`, else restores `__old`.
  *   - crash before the final `__old` cleanup: live dir present;
  *     the stale `__old` is deleted on the next swap.
  *
  * Callers that stage several outputs before swapping any input (the
  * CLI's multi-frame verbs) use [[stage]] + [[swap]] separately;
  * single-output writers use [[write]].
  */
object StagedSwap {

  private def delete(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))

  def stage(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir + "__tmp")

  def swap(dir: String): Unit = {
    val target = Paths.get(dir)
    val old = Paths.get(dir + "__old")
    if (Files.exists(old)) delete(dir + "__old") // stale crashed run
    if (Files.exists(target)) {
      Files.move(target, old)
      Files.move(Paths.get(dir + "__tmp"), target)
      delete(dir + "__old")
    } else {
      Files.move(Paths.get(dir + "__tmp"), target)
      ()
    }
  }

  def write(df: DataFrame, dir: String): Unit = { stage(df, dir); swap(dir) }

  /** Repair after a crash: returns true when a live dir exists after
    * recovery. Promotes a completed stage (`__tmp` with `_SUCCESS`) if
    * the swap died between its two moves, else restores the retired
    * copy; never deletes the only surviving version. */
  def recover(dir: String): Boolean = {
    val target = Paths.get(dir)
    if (Files.exists(target)) return true
    val tmp = Paths.get(dir + "__tmp")
    val old = Paths.get(dir + "__old")
    val tmpComplete = Files.exists(tmp.resolve("_SUCCESS"))
    if (tmpComplete) {
      Files.move(tmp, target)
      if (Files.exists(old)) delete(dir + "__old")
      true
    } else if (Files.exists(old)) {
      Files.move(old, target)
      if (Files.exists(tmp)) delete(dir + "__tmp")
      true
    } else false
  }
}
