package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Per-row kernels over a PACKED calendar-bounded series (the whole
  * daily frame broadcast as one array<struct> literal) — the
  * matrixProfile/VecL2Sq treatment applied to nested-median
  * statistics: instead of materializing days² (day, slope) rows
  * through a theta join and window-sorting them, each day's entire
  * pairwise pass + exact rank selection runs inside ONE expression
  * evaluation as a compiled while-loop over primitive arrays.
  *
  * CodegenFallback is deliberate: the expression evaluates once per
  * DAY (~2.4k rows at any data scale — the series is calendar-
  * bounded), so the per-row virtual-call overhead is nanoseconds
  * total, while the per-ELEMENT work (days−1 slopes + one sort) is
  * already a tight compiled loop. doGenCode would buy nothing here.
  */
object SeriesFunctions {

  /** Siegel per-day repeated median: the exact LOWER median (rank
    * ⌈m/2⌉ of the ascending sort) of the q6-quantized slopes from
    * (t, y) to every other point of `all` (array<struct<t,y>>).
    * Slope arithmetic is bit-identical to the theta-join formulation
    * it replaces — negating both numerator and denominator is exact
    * in IEEE — and q6 reproduces the Column-level
    * floor(v·1e6 + 0.5 + 1e-6)/1e6 (long floor, then double divide). */
  def siegelDayMedian(all: Column, t: Column, y: Column): Column =
    GraftSql.column(SiegelDayMedianSlope(GraftSql.expression(all),
      GraftSql.expression(t), GraftSql.expression(y)))
}

case class SiegelDayMedianSlope(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(Array(
          StructField(_, DoubleType, _, _), StructField(_, DoubleType, _, _))), _),
          DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "siegel_day_median expects (array<struct<double,double>>, " +
          s"double, double), got $other")
    }

  override def nullSafeEval(allV: Any, tV: Any, yV: Any): Any = {
    val arr = allV.asInstanceOf[ArrayData]
    val ti = tV.asInstanceOf[Double]
    val yi = yV.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Double](math.max(n - 1, 0))
    var k = 0
    var j = 0
    while (j < n) {
      val row = arr.getStruct(j, 2)
      val tj = row.getDouble(0)
      if (tj != ti) {
        val raw = (yi - row.getDouble(1)) / (ti - tj)
        // q6: long floor then double divide — the exact Column fold
        out(k) = java.lang.Math.floor(raw * 1.0e6 + 0.5 + 1.0e-6)
          .toLong / 1.0e6
        k += 1
      }
      j += 1
    }
    if (k == 0) return null
    java.util.Arrays.sort(out, 0, k)
    out(math.ceil(k / 2.0).toInt - 1)
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SiegelDayMedianSlope =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "siegel_day_median"
}
