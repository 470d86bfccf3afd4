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

  /** Unsigned lexicographic byte order == hex-string order, so minima
    * are tracked on raw 16-byte digests and hex-encoded only once at
    * the end — no per-hash String/char[] allocation in the hot loop. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(digest: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(b * 2) = hexDigits((digest(b) >> 4) & 0xf)
      hex(b * 2 + 1) = hexDigits(digest(b) & 0xf)
      b += 1
    }
    new String(hex)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.ofDim[Array[Byte]](k)
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))
    val scratch = new Array[Byte](16)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val shingle = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(shingle)
          md.digest(scratch, 0, 16) // in-place: allocate only on new min
          if (mins(i) == null || unsignedLess(scratch, mins(i)))
            mins(i) = scratch.clone()
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(toHex(m))))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignatures = copy(child = newChild)
}

object MinHashExpressions {
  /** All k minhash signatures in one pass: array<string> of length k. */
  def minhashSigs(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(shingles), k))
}
