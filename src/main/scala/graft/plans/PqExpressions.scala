package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fused product-quantization kernels — the codegen'd replacements for
  * the composed `aggregate`/`zip_with` argmin formulation in
  * [[graft.operators.ProductQuantizer]] (struct-accumulator
  * higher-order functions evaluate interpreted, one lambda-frame
  * allocation per codeword per row; these run the m×k×subDim flops in
  * one tight generated loop — the ArgMaxCosine lesson applied to PQ).
  * Semantics are bit-identical to the composed form: strict `<` keeps
  * the lowest code on distance ties, left-to-right accumulation.
  */

/** `pq_encode(vec)` → array<int> of m nearest-codeword ids. `books` is
  * the ragged codebook flattened row-major; `offsets(s)` is the first
  * codeword index of subspace s and `sizes(s)` its codeword count.
  * Rows whose vector is shorter than m·subDim are null (quarantine,
  * not silent truncation). */
case class PqEncode(child: Expression, books: Array[Double],
                    sizes: Array[Int], subDim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  private val m = sizes.length
  private val offsets: Array[Int] = sizes.scanLeft(0)(_ + _).init
  require(subDim > 0 && m > 0 &&
    books.length == sizes.sum * subDim,
    s"books length ${books.length} != ${sizes.sum} codewords × $subDim")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < m * subDim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < sizes(s)) {
        val base = (offsets(s) + j) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = arr.getDouble(s * subDim + i) - books(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[]")
    val sizesRef = ctx.addReferenceObj("sizes", sizes, "int[]")
    val offsRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    val codes = ctx.freshName("codes")
    val s = ctx.freshName("s"); val j = ctx.freshName("j")
    val i = ctx.freshName("i"); val d = ctx.freshName("d")
    val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    nullSafeCodeGen(ctx, ev, v => s"""
      |if ($v.numElements() < ${m * subDim}) { ${ev.isNull} = true; }
      |else {
      |  int[] $codes = new int[$m];
      |  for (int $s = 0; $s < $m; $s++) {
      |    int $best = -1;
      |    double $bestD = java.lang.Double.MAX_VALUE;
      |    for (int $j = 0; $j < $sizesRef[$s]; $j++) {
      |      int $base = ($offsRef[$s] + $j) * $subDim;
      |      double $d = 0.0;
      |      for (int $i = 0; $i < $subDim; $i++) {
      |        double $diff = $v.getDouble($s * $subDim + $i)
      |          - $booksRef[$base + $i];
      |        $d += $diff * $diff;
      |      }
      |      if ($d < $bestD) { $bestD = $d; $best = $j; }
      |    }
      |    $codes[$s] = $best;
      |  }
      |  ${ev.value} = new org.apache.spark.sql.catalyst.util
      |    .GenericArrayData($codes);
      |}
      |""".stripMargin)
  }

  // content equality over the codebook payload (the Bloom/ZValue rule)
  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child && subDim == p.subDim &&
        java.util.Arrays.equals(sizes, p.sizes) &&
        java.util.Arrays.equals(books, p.books)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(subDim),
      Int.box(java.util.Arrays.hashCode(sizes)),
      Int.box(java.util.Arrays.hashCode(books)))

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

/** `adc_sqdist(codes, dtab)` → double: Σ_s dtab[s][codes[s]], the ADC
  * table-lookup sum over a row's code array and a query's m×k distance
  * table (both regular runtime arrays — no literal payload, so plain
  * structural equality suffices). */
case class AdcSqDist(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType),
    ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sqdist"

  override def nullSafeEval(c: Any, t: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val tab = t.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tab.numElements() < m) return null
    var s = 0
    var acc = 0.0
    while (s < m) {
      acc += tab.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
    val mv = ctx.freshName("mv")
    nullSafeCodeGen(ctx, ev, (c, t) => s"""
      |int $mv = $c.numElements();
      |if ($t.numElements() < $mv) { ${ev.isNull} = true; }
      |else {
      |  double $acc = 0.0;
      |  for (int $s = 0; $s < $mv; $s++) {
      |    $acc += $t.getArray($s).getDouble($c.getInt($s));
      |  }
      |  ${ev.value} = $acc;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSqDist =
    copy(left = newLeft, right = newRight)
}

/** `int8_quantize(vec)` → struct(scale double, qvec array<long>):
  * the fused form of [[graft.operators.Similarity.quantizeInt8]]'s
  * composed HOFs (array_max/transform/round chains evaluate
  * interpreted — measured ~19 s for 64k×64 at 32×). Value-identical:
  * scale = round(max|v|/127, 6) via BigDecimal HALF_UP (the codegen
  * contract of Spark's own round), codes = round(vᵢ/rawScale) HALF_UP
  * on the UNROUNDED scale, zero vectors → scale 0 + zero codes. */
case class Int8Quantize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("qvec", ArrayType(LongType, containsNull = false),
        nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = java.lang.Math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val codes = new Array[Long](n)
    val scale =
      if (maxAbs == 0.0) 0.0
      else {
        val raw = maxAbs / 127.0
        i = 0
        while (i < n) {
          codes(i) = Int8Quantize.roundHalfUp(arr.getDouble(i) / raw)
          i += 1
        }
        java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(codes)))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val maxAbs = ctx.freshName("maxAbs"); val a = ctx.freshName("a")
    val codes = ctx.freshName("codes"); val raw = ctx.freshName("raw")
    val scale = ctx.freshName("scale")
    nullSafeCodeGen(ctx, ev, v => s"""
      |int $n = $v.numElements();
      |double $maxAbs = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $a = java.lang.Math.abs($v.getDouble($i));
      |  if ($a > $maxAbs) $maxAbs = $a;
      |}
      |long[] $codes = new long[$n];
      |double $scale = 0.0;
      |if ($maxAbs != 0.0) {
      |  double $raw = $maxAbs / 127.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    $codes[$i] = graft.plans.Int8Quantize
      |      .roundHalfUp($v.getDouble($i) / $raw);
      |  }
      |  $scale = java.math.BigDecimal.valueOf($raw)
      |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
      |}
      |${ev.value} = new org.apache.spark.sql.catalyst.expressions
      |  .GenericInternalRow(new Object[]{ $scale,
      |    new org.apache.spark.sql.catalyst.util
      |      .GenericArrayData($codes) });
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Int8Quantize = copy(child = newChild)
}

object Int8Quantize {
  /** `BigDecimal.valueOf(q).setScale(0, HALF_UP).longValue()` with the
    * BigDecimal taken ONLY in the ±1e-7 band around a .5 fraction —
    * the cosineAtLeast guard trick applied to code rounding: 41M
    * per-element BigDecimal allocations were the hot path of the 128×
    * quantized-kNN run (q92, ~1 s of 1.6 s). Away from the band every
    * rounding rule (decimal-string HALF_UP, binary half-away,
    * floor(x+.5)) agrees, so the fast arm is value-identical by
    * construction; only near-tie values (≈2e-7 of uniform inputs) pay
    * the exact decimal path. Keeping the tie arm on BigDecimal keeps
    * the q90/q92 oracle contract (Spark round() semantics) bit-intact. */
  def roundHalfUp(q: Double): Long = {
    val a = java.lang.Math.abs(q)
    val f = java.lang.Math.floor(a)
    val frac = a - f
    if (frac < 0.4999999 || frac > 0.5000001) {
      val m = if (frac < 0.5) f.toLong else f.toLong + 1L
      if (q < 0) -m else m
    } else
      java.math.BigDecimal.valueOf(q)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }
}

object PqExpressions {
  /** Column handle: fused int8 quantization (scale + codes struct). */
  def int8Quantize(vec: Column): Column =
    Bridge.column(Int8Quantize(Bridge.expression(vec)))

  /** Column handle: m-code array for `vec` under the (possibly ragged)
    * per-subspace codebooks. */
  def pqEncode(vec: Column, books: Seq[Seq[Seq[Double]]],
               subDim: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec),
      books.flatten.flatten.toArray, books.map(_.size).toArray, subDim))

  /** Column handle: ADC squared distance of a code array against a
    * query distance table. */
  def adcSqDist(codes: Column, dtab: Column): Column =
    Bridge.column(AdcSqDist(Bridge.expression(codes),
      Bridge.expression(dtab)))
}
