package graft.plans

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, one fused pass.
  *
  * Exactly `array_distinct` of the `n`-grams of
  * `split(trim(text), "\s+")` — the composed Catalyst formulation this
  * replaces (and the DuckDB oracle twin keeps) — but evaluated in a
  * single native traversal instead of `n-1` chained interpreted
  * `zip_with` passes each allocating an intermediate array (HOFs are
  * CodegenFallback; the chain measured ~20 s per 160k docs at n=5,
  * this kernel ~2 s). Trim is SPACE-ONLY like SQL `trim`, and an empty
  * trimmed string tokenizes to `[""]` like `split` — bug-compatible
  * with the column formulation so oracle hashes are unchanged.
  * First-occurrence order, null text → null, tokens < n → empty array.
  */
case class WordNGrams(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "n must be >= 1")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"word_${n}grams"

  private[this] val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi)
    val toks = ws.split(s, -1)
    val out = new java.util.LinkedHashSet[String]
    if (n == 1) {
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNGrams = copy(child = newChild)
}

object NGramExpressions {
  /** Distinct word n-gram shingles of `text`. */
  def wordNGrams(text: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(text), n))
}
