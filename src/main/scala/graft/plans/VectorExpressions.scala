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

object VectorExpressions {
  /** Column-API handle on the native kernel. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
}
