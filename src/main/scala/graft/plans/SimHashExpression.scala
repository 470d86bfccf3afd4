package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash (Charikar 2002) over a token array, one fused pass.
  *
  * Per token, the 64-bit hash is the FIRST 8 BYTES OF ITS MD5 digest
  * (big-endian) — i.e. the first 16 hex chars of `md5(token)` — so the
  * value is reproducible in any engine with md5 (the DuckDB oracle
  * parses `substr(md5(t), 1, 8)`/`(9, 8)` as two 32-bit halves). Each
  * bit position votes +1/-1 across tokens; the result sets the bits
  * with positive votes, reinterpreted as a signed long.
  *
  * Replaces a 64×aggregate() higher-order formulation over xxhash64:
  * one digest per token instead of 64 hash calls, no interpreted-HOF
  * re-evaluation, and engine-portable semantics. Empty array → 0L
  * (all votes zero); null array → null; null elements are skipped.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(j).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        var i = 0
        while (i < 64) {
          if (((h >>> (63 - i)) & 1L) == 1L) votes(i) += 1
          else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << (63 - i))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHashExpressions {
  /** SimHash64 over a token array column. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
