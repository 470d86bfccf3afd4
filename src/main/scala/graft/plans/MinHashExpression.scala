package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused k-seed MinHash over a shingle array: for each seed i in [0,k),
  * the lexicographic minimum of md5(s"$i|" + shingle) hex digests.
  *
  * Semantics are identical to `array_min(transform(sh, s ->
  * md5(concat(seed, '|', s))))` repeated per seed (the DuckDB-oracle
  * definition) — but one traversal computes all k signatures with a
  * reused MessageDigest and no per-element UTF8String/concat
  * allocations. CodegenFallback: evaluated once per row, the inner loop
  * is plain JVM code, so codegen buys nothing here.
  */
case class MinHashSignatures(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill[String](k)(null)
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val shingle = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(shingle)
          val digest = md.digest()
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(b * 2) = hexDigits((digest(b) >> 4) & 0xf)
            hex(b * 2 + 1) = hexDigits(digest(b) & 0xf)
            b += 1
          }
          val h = new String(hex)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignatures = copy(child = newChild)
}

object MinHashExpressions {
  /** All k minhash signatures in one pass: array<string> of length k. */
  def minhashSigs(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(shingles), k))
}
