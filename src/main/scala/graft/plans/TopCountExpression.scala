package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Multiplicity of the most frequent element in a string array, one
  * per-row hash-count pass.
  *
  * The composed formulation of "top token share" is explode → count per
  * (row, token) → max per row: two hash aggregations and a shuffle of
  * every token in the corpus. A document's own token histogram fits in
  * one small per-row map, so computing it where the row already is
  * turns the whole repetition profile into a map-side projection — no
  * Exchange at any corpus size. Null elements are skipped (matching
  * count(*) over non-null exploded rows); empty array → 0; null → null.
  */
case class TokenTopCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "token_top_count"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[Any, Long](n * 2)
    var best = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = counts.merge(arr.getUTF8String(i), 1L, _ + _)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenTopCount = copy(child = newChild)
}

object TopCountExpressions {
  /** Max element multiplicity of a string-array column. */
  def tokenTopCount(tokens: Column): Column =
    Bridge.column(TokenTopCount(Bridge.expression(tokens)))
}
