package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for fused cosine similarity over two
  * `array<double>` columns.
  *
  * The built-in formulation (`aggregate(zip_with(a,b,*), …)` three times
  * for dot/‖a‖/‖b‖) allocates a zipped array and three lambda-interpreter
  * frames per row; higher-order functions also don't participate in
  * whole-stage codegen. This expression is one pass over both arrays with
  * no allocation, and `doGenCode` emits a plain Java loop inside the
  * generated stage — the (b)-tier custom-operator path of the design
  * notes (custom Expression before custom physical operator).
  *
  * Null semantics: null input array → null; element count mismatch uses
  * the common prefix (callers align dimensions); zero-norm → null
  * (matches `dot/nullif(norm*norm,0)`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType),
    ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $xi = $a.getDouble($i);
      |  double $yi = $b.getDouble($i);
      |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
      |}
      |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
      |if ($denom == 0.0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $dot / $denom;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native fused ±1 signed projection: all `outDim` Johnson-Lindenstrauss
  * components of one input vector in a single traversal.
  *
  * The HOF formulation (one `aggregate(zip_with(v, signs_j))` per
  * component) interprets 2·dim lambda frames per component per row and
  * measured ~3× slower than the NATIVE brute-force cosine it was meant
  * to beat (ScaleCheck, 64k×32 components). This kernel is outDim
  * accumulators in one plain Java loop inside the generated stage.
  *
  * Accumulation order per component is ascending element index from a
  * 0.0 seed — term-for-term identical to the left fold AND to the
  * oracle's left-associated SQL sum, preserving the bit-equality
  * contract. Raw sums only: the caller applies /√outDim and rounding.
  * Signs ride along flattened row-major (component-major) as ±1 bytes.
  *
  * CALLER-MUST-GUARD-LENGTH contract: an input vector SHORTER than
  * `dim` is truncated to the common prefix (missing terms contribute
  * 0) — silently wrong projections, not an error. Wrap the child in a
  * dimension guard (`assert_true(size(v) === dim)`, as
  * Similarity.randomProject/projectedTopK do) when the input length is
  * not statically known. Malformed sign matrices, by contrast, fail
  * loudly at construction.
  */
case class SignedProject(child: Expression, signs: Array[Byte], dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  require(dim > 0 && signs.nonEmpty && signs.length % dim == 0,
    s"signs.length (${signs.length}) must be a positive multiple of " +
      s"dim ($dim) — a component-major outDim×dim ±1 matrix")

  private val outDim = signs.length / dim

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, false)
  override def prettyName: String = "signed_project"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j * dim
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * signs(base + i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    nullSafeCodeGen(ctx, ev, v => s"""
      |int $n = java.lang.Math.min($v.numElements(), $dim);
      |double[] $out = new double[$outDim];
      |for (int $j = 0; $j < $outDim; $j++) {
      |  double $acc = 0.0;
      |  int $base = $j * $dim;
      |  for (int $i = 0; $i < $n; $i++) {
      |    $acc += $v.getDouble($i) * $signsRef[$base + $i];
      |  }
      |  $out[$j] = $acc;
      |}
      |${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      |""".stripMargin)
  }

  // content-based equality over the sign bytes (the Bloom/ZValue
  // lesson): semantically equal projections must canonicalize equal
  override def equals(other: Any): Boolean = other match {
    case s: SignedProject =>
      child == s.child && dim == s.dim &&
        java.util.Arrays.equals(signs, s.signs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(signs)))

  override protected def withNewChildInternal(
      newChild: Expression): SignedProject = copy(child = newChild)
}

object VectorExpressions {
  /** Column-API handle on the native kernel. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  /** All JL components of `v` in one traversal; `signs` is the
    * component-major flattened ±1 matrix. */
  def signedProject(v: Column, signs: Array[Byte], dim: Int): Column =
    Bridge.column(SignedProject(Bridge.expression(v), signs, dim))
}
