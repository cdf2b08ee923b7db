package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native codegen vector kernels over `array<float>` / `array<double>`
  * columns.
  *
  * The composable formulation (`zip_with` + `aggregate`) runs through
  * Catalyst's interpreted HigherOrderFunction path — closure dispatch
  * per element, boxed lambda variables — and dominated the benchmark
  * profile (3 folds per cosine x 64 elements x O(n^2) candidate pairs).
  * These expressions emit a tight primitive loop inside whole-stage
  * codegen instead; the fused cosine does dot, |a| and |b| in a single
  * pass over the two arrays.
  *
  * Numerics are kept oracle-compatible: every accumulator is a double
  * folded left-to-right in element order, exactly like the sequential
  * `aggregate` fold and DuckDB's `list_dot_product`, so results are
  * bit-identical to both. Array elements are assumed non-null
  * (embeddings are dense); mismatched lengths take the common prefix.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} expects two array<float|double> args, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @inline protected final def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Interpreted getter: element i of `a` as double. */
  @inline protected final def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Codegen getter: element `i` of array variable `arr` as double. */
  protected final def genGet(arr: String, dt: DataType, i: String): String = dt match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** Dot product: sum_i a_i * b_i, double accumulator, left-to-right. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, ta, i) * get(b, tb, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${genGet(a, ta, i)} * ${genGet(b, tb, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Fused cosine similarity: dot(a,b) / (|a| * |b|) in ONE pass — three
  * double accumulators, each folded left-to-right, so the result is
  * bit-identical to computing the three folds separately. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${genGet(a, ta, i)};
         |  final double $y = ${genGet(b, tb, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** Fused Euclidean distance: sqrt(sum_i (a_i - b_i)^2). */
case class VecL2Dist(left: Expression, right: Expression) extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, ta, i) - get(b, tb, i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${genGet(a, ta, i)} - ${genGet(b, tb, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Dist =
    copy(left = l, right = r)
}

/** SQUARED Euclidean distance: sum_i (a_i - b_i)^2 — the same
  * left-to-right fold as the `aggregate(zip_with(...))` HOF pair it
  * replaces (bit-identical result), minus the intermediate array
  * allocation and the two interpreted lambda passes. Matrix profile's
  * per-pair kernel (days^2 invocations). */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, ta, i) - get(b, tb, i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left), elemType(right))
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${genGet(a, ta, i)} - ${genGet(b, tb, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** SRP-LSH signature against a fixed plane matrix: bit k = sign of
  * v . planes[k], packed into an int. One fused pass over nPlanes x dim
  * multiply-adds per row — replaces nPlanes separate interpreted dot
  * folds (the knnAnn map-side hot spot).
  *
  * The expression carries only the GENERATOR PARAMETERS (nPlanes, dim,
  * seed) — three scalars with trivial value equality for plan
  * canonicalization — and regenerates the deterministic plane matrix
  * lazily wherever it evaluates. Embedding the matrix itself (the
  * pre-r11 design: 16 tables × 8×64 boxed doubles riding the
  * serialized expression tree) is what pushed knnAnn's task binaries
  * to the 1 MB DAGScheduler warning; the codegen reference object is
  * the 4 KB primitive double[][], regenerated per executor. */
case class VecSrpSignature(child: Expression, nPlanes: Int, dim: Int,
                           seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val planes: Array[Array[Double]] =
    graft.functions.VectorFunctions.hyperplanes(nPlanes, dim, seed)
      .map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"VecSrpSignature expects array<float|double>, got ${dt.catalogString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0; var k = 0
    while (k < planes.length) {
      val p = planes(k)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0; var i = 0
      while (i < n) {
        s += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i); i += 1
      }
      if (s > 0) sig |= (1 << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
      val k = ctx.freshName("k"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val getter = if (isFloat) s"(double)$v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $sig = 0;
         |for (int $k = 0; $k < $mat.length; $k++) {
         |  final double[] $p = $mat[$k];
         |  final int $n = java.lang.Math.min($v.numElements(), $p.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $getter * $p[$i]; }
         |  if ($s > 0) $sig |= (1 << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecSrpSignature =
    copy(child = c)
}
