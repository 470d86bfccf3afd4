package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused whitespace-token statistics — ONE byte scan over the string
  * instead of `size(split(trim(text), "\s+"))` plus an interpreted
  * `aggregate(split(...), 0L, acc + length(x))` lambda per TOKEN
  * (q28's hot path: three regex passes and a per-token HOF frame over
  * every document).
  *
  * Token semantics replicate the relational formulation EXACTLY (the
  * q28 oracle must not move), pinned by TextFnsSpec against the HOF
  * twin on adversarial strings:
  *  - `trim` strips 0x20 SPACES only (Spark/DuckDB trim), so other
  *    whitespace survives at the ends;
  *  - Spark `split` uses limit −1: a LEADING separator yields a
  *    leading empty token and a TRAILING separator a trailing empty
  *    token (both counted, zero length);
  *  - the empty/all-space string splits to one empty token;
  *  - the separator class is Java regex `\s` = [ \t\n\x0B\f\r] —
  *    ASCII only, so multi-byte code points are never separators;
  *  - token length is `length()` semantics: Unicode code points
  *    (count of non-continuation UTF-8 bytes).
  *
  * Returns `struct(n_tokens LONG, sum_tok_len LONG)`; null → null.
  * n_tokens ≥ 1 for any non-null input (split never returns an empty
  * array), so mean = sum/n needs no zero guard beyond null text.
  */
case class TokenStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "token_stats"

  @inline private def ws(b: Byte): Boolean =
    (b >= 9 && b <= 13) || b == 32

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].trim()
    val nb = t.numBytes()
    if (nb == 0)
      return new GenericInternalRow(Array[Any](1L, 0L))
    var runs = 0L
    var sum = 0L
    var inTok = false
    var i = 0
    while (i < nb) {
      val b = t.getByte(i)
      if (ws(b)) inTok = false
      else {
        if (!inTok) { runs += 1; inTok = true }
        // count code points: every non-continuation byte starts one
        if ((b & 0xC0) != 0x80) sum += 1
      }
      i += 1
    }
    val lead = if (ws(t.getByte(0))) 1L else 0L
    val trail = if (ws(t.getByte(nb - 1))) 1L else 0L
    new GenericInternalRow(Array[Any](runs + lead + trail, sum))
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenStats = copy(child = newChild)
}

object TokenStats {
  def column(text: Column): Column =
    Bridge.column(TokenStats(Bridge.expression(text)))
}
