package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Z-order curve key over two dimensions — the multi-column analog of a
  * sorted layout (the Delta/Iceberg `OPTIMIZE ZORDER BY` shape).
  *
  * Each input is first mapped to a bucket id by binary search against
  * per-column quantile boundaries (computed once, driver-side, via
  * `approxQuantile` — a sample-sized job, never a global sort), then the
  * two 16-bit bucket ids are bit-interleaved into one long. Writing
  * range-partitioned + sorted by this key clusters rows so every file
  * covers a small min/max BOX in both dimensions — a selective predicate
  * on EITHER column prunes row groups, where a single-column sort only
  * prunes its own column.
  *
  * Quantile (not uniform) buckets make the curve robust to skew: each
  * bucket holds ~1/nBuckets of the data regardless of value
  * distribution. Null inputs map to bucket 0 (they cluster at the
  * curve's origin). Output is never null.
  */
case class ZValue2(left: Expression, right: Expression,
                   edgesX: Array[Double], edgesY: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zvalue2"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    val bx = if (a == null) 0
             else ZValue2.bucketOf(a.asInstanceOf[Double], edgesX)
    val by = if (b == null) 0
             else ZValue2.bucketOf(b.asInstanceOf[Double], edgesY)
    ZValue2.interleave16(bx, by)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val exRef = ctx.addReferenceObj("edgesX", edgesX, "double[]")
    val eyRef = ctx.addReferenceObj("edgesY", edgesY, "double[]")
    val helper = "graft.plans.ZValue2$.MODULE$"
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val bx = ctx.freshName("bx")
    val by = ctx.freshName("by")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        int $bx = ${leftGen.isNull} ? 0 :
          $helper.bucketOf(${leftGen.value}, $exRef);
        int $by = ${rightGen.isNull} ? 0 :
          $helper.bucketOf(${rightGen.value}, $eyRef);
        long ${ev.value} = $helper.interleave16($bx, $by);
      """, isNull = FalseLiteral)
  }

  // content-based equality over the edge arrays (case-class equality on
  // Array is reference-based), so equal curve keys canonicalize equal
  override def equals(other: Any): Boolean = other match {
    case z: ZValue2 =>
      left == z.left && right == z.right &&
        java.util.Arrays.equals(edgesX, z.edgesX) &&
        java.util.Arrays.equals(edgesY, z.edgesY)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.hashCode(edgesX)),
      Int.box(java.util.Arrays.hashCode(edgesY)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderFns {
  /** Column-API handle on the curve key. */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             edgesX: Array[Double], edgesY: Array[Double])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ZValue2(Bridge.expression(x), Bridge.expression(y),
      edgesX, edgesY))
  }
}

object ZValue2 {
  /** Count of boundaries <= x (binary search; edges sorted ascending). */
  def bucketOf(x: Double, edges: Array[Double]): Int = {
    var lo = 0
    var hi = edges.length // bucket in [0, edges.length]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (edges(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the low 16 bits of x (even positions) and y (odd). */
  def interleave16(x: Int, y: Int): Long = {
    def spread(v: Int): Long = {
      var b = v.toLong & 0xffffL
      b = (b | (b << 8)) & 0x00ff00ffL
      b = (b | (b << 4)) & 0x0f0f0f0fL
      b = (b | (b << 2)) & 0x33333333L
      b = (b | (b << 1)) & 0x55555555L
      b
    }
    spread(x) | (spread(y) << 1)
  }
}
