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
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(e, _) =>
        CosineSimilarity.Getters.contains(e.simpleString)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"array<numeric> required, got " +
        s"${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // non-double children are widened per element INSIDE the loop —
  // value-identical to a prior cast-to-double pass (float→double and
  // integral→double are exact for these magnitudes) but without
  // materializing a double[] copy per row. Null ELEMENTS are undefined
  // input here, exactly as they were for the original double-only
  // kernel (primitive getters don't check null slots); embedding/code
  // columns carry no null elements.
  private def elem(t: DataType): String =
    t.asInstanceOf[ArrayType].elementType.simpleString

  private def get(arr: ArrayData, i: Int, t: String): Double = t match {
    case "float" => arr.getFloat(i).toDouble
    case "int" => arr.getInt(i).toDouble
    case "bigint" => arr.getLong(i).toDouble
    case "smallint" => arr.getShort(i).toDouble
    case "tinyint" => arr.getByte(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elem(left.dataType), elem(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, i, tx); val yi = get(y, i, ty)
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
    def getter(arr: String, idx: String, t: DataType): String =
      s"(double) $arr.${CosineSimilarity.Getters(elem(t))}($idx)"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $xi = ${getter(a, i, left.dataType)};
      |  double $yi = ${getter(b, i, right.dataType)};
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

object CosineSimilarity {
  /** element simpleString → ArrayData accessor name (the accepted
    * numeric element types). */
  val Getters: Map[String, String] = Map(
    "double" -> "getDouble", "float" -> "getFloat",
    "int" -> "getInt", "bigint" -> "getLong",
    "smallint" -> "getShort", "tinyint" -> "getByte")
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

/** Native fused nearest-centroid argmax: the 4dp-rounded cosine winner
  * over a k×dim centroid matrix in one generated loop per row.
  *
  * The HOF formulation (`array_max(transform(centroidLit, c ->
  * struct(round(cosine(v,c),4), -id)))`) re-reads the input ArrayData
  * k times, allocates k structs per row, and interprets the lambda —
  * measured 59 s at (64k rows × k=64) in ScaleCheck, growing with k
  * to 90 s at k=256 even though the downstream pair join SHRINKS.
  * This kernel: the input is copied to a local double[] once, the
  * child norm and the k centroid norms are computed once (norms at
  * construction), and the k dot products are plain Java loops.
  *
  * Ranking contract (must mirror the q107/q110 oracle SQL exactly):
  * winner = max 4dp-ROUNDED cosine, ties to the SMALLEST centroid id.
  * Rounding is monotone, so the raw argmax bounds the winner set: only
  * candidates within 1e-4 of the raw max can round equal to it —
  * those few get the exact `BigDecimal.valueOf(x).setScale(4,
  * HALF_UP)` Spark's own `round()` codegen applies, and the first
  * (ids are REQUIRED ascending) rounded-equal candidate wins.
  * Per-centroid accumulation is ascending-index from 0.0 — bit-equal
  * to [[CosineSimilarity]]. Agreement with DuckDB's
  * `list_cosine_similarity` is EMPIRICAL, not guaranteed to the last
  * ulp (DuckDB's instruction sequence is its own; one last-ulp
  * disagreement at a 4dp rounding boundary was observed in the q336
  * staging work) — which is why rank-sensitive oracles (q335/q336)
  * stage the engine's sims/ranks instead of recomputing them, and the
  * remaining cosine-recompute oracle sites (q35/q107/q110/…) sit on
  * the PLANS.md transcendental-audit watch with the boundary-flip
  * probability argument (a flip needs a sim within ~1 ulp of a
  * 0.00005 grid line AND the flipped cell to change an output row).
  *
  * Null/degenerate: null input → null; zero-norm input → null; a
  * zero-norm CENTROID never wins (cosine undefined → excluded);
  * all-excluded → null. Output: `struct<cluster:bigint, sim:double>`
  * with `sim` already rounded.
  */
case class ArgMaxCosine(child: Expression, ids: Array[Long],
                        centroids: Array[Double], dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  require(dim > 0 && centroids.length == ids.length * dim,
    s"centroids.length (${centroids.length}) must equal " +
      s"ids.length (${ids.length}) × dim ($dim) — row-major k×dim")
  require(ids.sameElements(ids.sorted),
    "centroid ids must be ascending (the tie rule is smallest id)")

  private val k = ids.length
  // per-centroid norms, ascending-index accumulation (bit-equal to the
  // per-row kernel's own norm loops)
  private val norms: Array[Double] = Array.tabulate(k) { c =>
    var s = 0.0; var i = 0
    while (i < dim) { val v = centroids(c * dim + i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("sim", DoubleType,
        nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_cosine"

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val x = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); nx += x(i) * x(i); i += 1 }
    if (nx == 0.0) return null
    val sqnx = math.sqrt(nx)
    val sims = new Array[Double](k)
    var rawMax = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0
      val base = c * dim
      i = 0
      while (i < n) { dot += x(i) * centroids(base + i); i += 1 }
      val denom = sqnx * norms(c)
      val s = if (denom == 0.0) Double.NegativeInfinity else dot / denom
      sims(c) = s
      if (s > rawMax) rawMax = s
      c += 1
    }
    if (rawMax == Double.NegativeInfinity) return null
    val rm = round4(rawMax)
    c = 0
    while (c < k) {
      if (sims(c) >= rawMax - 1e-4 && round4(sims(c)) == rm) {
        return new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](ids(c), rm))
      }
      c += 1
    }
    null // unreachable: the raw max itself rounds to rm
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val n = ctx.freshName("n"); val x = ctx.freshName("x")
    val nx = ctx.freshName("nx"); val i = ctx.freshName("i")
    val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
    val base = ctx.freshName("base"); val s = ctx.freshName("s")
    val sims = ctx.freshName("sims"); val rawMax = ctx.freshName("rawMax")
    val denom = ctx.freshName("denom"); val rm = ctx.freshName("rm")
    val sqnx = ctx.freshName("sqnx"); val won = ctx.freshName("won")
    nullSafeCodeGen(ctx, ev, v => s"""
      |int $n = java.lang.Math.min($v.numElements(), $dim);
      |double[] $x = new double[$n];
      |double $nx = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $x[$i] = $v.getDouble($i); $nx += $x[$i] * $x[$i];
      |}
      |if ($nx == 0.0) { ${ev.isNull} = true; } else {
      |  double $sqnx = java.lang.Math.sqrt($nx);
      |  double[] $sims = new double[$k];
      |  double $rawMax = java.lang.Double.NEGATIVE_INFINITY;
      |  for (int $c = 0; $c < $k; $c++) {
      |    double $dot = 0.0;
      |    int $base = $c * $dim;
      |    for (int $i = 0; $i < $n; $i++) {
      |      $dot += $x[$i] * $centsRef[$base + $i];
      |    }
      |    double $denom = $sqnx * $normsRef[$c];
      |    double $s = ($denom == 0.0)
      |      ? java.lang.Double.NEGATIVE_INFINITY : $dot / $denom;
      |    $sims[$c] = $s;
      |    if ($s > $rawMax) $rawMax = $s;
      |  }
      |  if ($rawMax == java.lang.Double.NEGATIVE_INFINITY) {
      |    ${ev.isNull} = true;
      |  } else {
      |    double $rm = java.math.BigDecimal.valueOf($rawMax)
      |      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
      |    boolean $won = false;
      |    for (int $c = 0; $c < $k && !$won; $c++) {
      |      if ($sims[$c] >= $rawMax - 1e-4
      |          && java.math.BigDecimal.valueOf($sims[$c])
      |            .setScale(4, java.math.RoundingMode.HALF_UP)
      |            .doubleValue() == $rm) {
      |        ${ev.value} = new org.apache.spark.sql.catalyst
      |          .expressions.GenericInternalRow(
      |            new Object[]{ $idsRef[$c], $rm });
      |        $won = true;
      |      }
      |    }
      |    if (!$won) { ${ev.isNull} = true; }
      |  }
      |}
      |""".stripMargin)
  }

  // content-based equality over the centroid payload (the Bloom/ZValue
  // lesson): semantically equal assignments must canonicalize equal
  override def equals(other: Any): Boolean = other match {
    case a: ArgMaxCosine =>
      child == a.child && dim == a.dim &&
        java.util.Arrays.equals(ids, a.ids) &&
        java.util.Arrays.equals(centroids, a.centroids)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(ids)),
      Int.box(java.util.Arrays.hashCode(centroids)))

  override protected def withNewChildInternal(
      newChild: Expression): ArgMaxCosine = copy(child = newChild)
}

/** Native numeric-array → array<double> cast: the codegen'd
  * replacement for `transform(v, x -> cast(x as double))`, which is an
  * interpreted higher-order function (ArrayTransform has no doGenCode)
  * — one lambda frame per ELEMENT per row. Every embedding operator
  * casts its float vectors up front (`Similarity.asDouble`), so that
  * interpretation tax fronted every vector query: isolated at the 128×
  * crossover, the q35 corpus cast alone was ~0.5 s of a 1.55 s query.
  * This kernel is one plain Java copy loop inside the generated stage;
  * a rare null ELEMENT falls back to a boxed copy of that row (same
  * output as the transform formulation).
  *
  * Value semantics are exactly `cast(float as double)` / identity on
  * double / integral widening — bit-identical to the HOF it replaces,
  * so no oracle moves. */
case class ToDoubleArray(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if Seq("float", "double", "int", "bigint",
          "smallint", "tinyint").contains(t.simpleString) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"array<numeric> required, got $other")
    }

  override def dataType: DataType = ArrayType(DoubleType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "to_double_array"

  /** Per-element accessor call for the child's element type. */
  private def getter(arr: String, i: String): String =
    elemType.simpleString match {
      case "float" => s"(double) $arr.getFloat($i)"
      case "double" => s"$arr.getDouble($i)"
      case "int" => s"(double) $arr.getInt($i)"
      case "bigint" => s"(double) $arr.getLong($i)"
      case "smallint" => s"(double) $arr.getShort($i)"
      case _ => s"(double) $arr.getByte($i)"
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val get: Int => Double = elemType.simpleString match {
      case "float" => i => arr.getFloat(i).toDouble
      case "double" => i => arr.getDouble(i)
      case "int" => i => arr.getInt(i).toDouble
      case "bigint" => i => arr.getLong(i).toDouble
      case "smallint" => i => arr.getShort(i).toDouble
      case _ => i => arr.getByte(i).toDouble
    }
    if ((0 until n).exists(arr.isNullAt)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) null else get(i)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = get(i); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    val hasNull = ctx.freshName("hasNull")
    val boxed = ctx.freshName("boxed")
    val j = ctx.freshName("j")
    nullSafeCodeGen(ctx, ev, v => s"""
      |int $n = $v.numElements();
      |boolean $hasNull = false;
      |double[] $out = new double[$n];
      |for (int $i = 0; $i < $n; $i++) {
      |  if ($v.isNullAt($i)) { $hasNull = true; break; }
      |  $out[$i] = ${getter(v, i)};
      |}
      |if ($hasNull) {
      |  Object[] $boxed = new Object[$n];
      |  for (int $j = 0; $j < $n; $j++) {
      |    $boxed[$j] = $v.isNullAt($j)
      |      ? null : (Object) Double.valueOf(${getter(v, j)});
      |  }
      |  ${ev.value} =
      |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
      |} else {
      |  ${ev.value} =
      |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ToDoubleArray = copy(child = newChild)
}

object VectorExpressions {
  /** Column-API handle on the native kernel. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd numeric-array → array<double> cast (see
    * [[ToDoubleArray]]). */
  def toDoubleArray(v: Column): Column =
    Bridge.column(ToDoubleArray(Bridge.expression(v)))

  /** Nearest centroid of `v` by 4dp cosine (smallest-id tiebreak) as
    * `struct<cluster, sim>`; `centroids` is (id, vector) rows — sorted
    * ascending by id here to honor the kernel's tie contract. */
  def argMaxCosine(v: Column,
                   centroids: Array[(Long, Array[Double])]): Column = {
    require(centroids.nonEmpty, "argMaxCosine needs >= 1 centroid")
    val sorted = centroids.sortBy(_._1)
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim),
      "all centroids must share one dimensionality")
    Bridge.column(ArgMaxCosine(Bridge.expression(v),
      sorted.map(_._1), sorted.flatMap(_._2), dim))
  }

  /** All JL components of `v` in one traversal; `signs` is the
    * component-major flattened ±1 matrix. */
  def signedProject(v: Column, signs: Array[Byte], dim: Int): Column =
    Bridge.column(SignedProject(Bridge.expression(v), signs, dim))
}
