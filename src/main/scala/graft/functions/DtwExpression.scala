package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, ArrayType}

/** Dynamic-time-warping distance between two numeric series — the
  * elastic-alignment measure for comparing time series that drift in
  * phase (two regions' seasonal curves peaking a month apart score
  * close under DTW, far under Euclidean).
  *
  * The O(n·m) DP runs INSIDE the expression over two array columns:
  * series are collapsed to bounded per-key arrays first (calendar
  * grain), so at 100 TB the quadratic term is over series LENGTH
  * (dozens-to-hundreds of points), never over rows — the corpus pass
  * is the grouped collapse; every pairwise DTW after that is a
  * constant-size kernel invocation, embarrassingly parallel across
  * pairs.
  *
  * Parity: the DP uses the padded formulation (D[0][0]=0, borders at
  * the 1e18 sentinel) with L1 point cost; additions happen in fixed
  * DP order, so on q6-quantized inputs the result is bit-identical to
  * the DuckDB recursive-CTE oracle that walks the same cells. */
object DtwKernel {
  def dtw(l: ArrayData, r: ArrayData): Double = {
    val n = l.numElements(); val m = r.numElements()
    if (n == 0 || m == 0) return if (n == m) 0.0 else 1e18
    var prev = new Array[Double](m + 1)
    var cur = new Array[Double](m + 1)
    prev(0) = 0.0
    var j = 1
    while (j <= m) { prev(j) = 1e18; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = 1e18
      val ai = l.getDouble(i - 1)
      j = 1
      while (j <= m) {
        val c = math.abs(ai - r.getDouble(j - 1))
        var best = prev(j)
        if (prev(j - 1) < best) best = prev(j - 1)
        if (cur(j - 1) < best) best = cur(j - 1)
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

/** dtw_distance(a, b) over two array<double> series. */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"DtwDistance expects two array<double> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    DtwKernel.dtw(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DtwKernel.dtw($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DtwDistance = copy(left = l, right = r)
}

object DtwFunctions {
  import org.apache.spark.sql.GraftSql
  def dtwDistance(a: Column, b: Column): Column =
    GraftSql.column(DtwDistance(
      GraftSql.catalystExpression(a), GraftSql.catalystExpression(b)))
}
