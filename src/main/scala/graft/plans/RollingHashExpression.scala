package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin–Karp style) rolling-hash document fingerprint:
  *
  *   h ← (h · 31 + codepoint) mod (2³¹ − 1),   h₀ = 0
  *
  * over the text's Unicode codepoints, left to right. The modulus keeps
  * every intermediate below 2³⁶, so the same recurrence runs in any
  * engine with 64-bit integer SQL — the DuckDB oracle replays it with
  * `list_reduce` over `ascii(char)` (codepoint) values. Codepoint-level
  * (not byte-level) so multi-byte UTF-8 hashes identically everywhere.
  *
  * One pass per row, no allocation beyond the codepoint iterator;
  * CodegenFallback is fine for a once-per-row leaf like this.
  */
case class RollingHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash"

  private val Mod = 2147483647L // 2^31 - 1

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash = copy(child = newChild)
}

object RollingHashExpressions {
  /** Rolling-hash fingerprint of a string column. */
  def rollingHash(text: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(text)))
}
