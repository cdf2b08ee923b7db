package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/** Clipped multiset-intersection size between two SORTED per-document
  * gram-count arrays (`array<struct<g: string, c: bigint>>`, ascending
  * by gram) — the ROUGE overlap kernel: Σ min(count_a, count_b) over
  * grams present on both sides.
  *
  * Why an expression and not a join or a map HOF: the (doc, gram)
  * join formulation re-shuffles every pair's grams twice (pair ×
  * gram_a expansion, then a (doc_b, gram) shuffle); the map-HOF
  * formulation is O(|a|·|b|) per pair because `element_at` on Spark's
  * MapType is a linear array scan. A two-pointer merge over the two
  * sorted arrays is O(|a|+|b|) per pair with zero extra shuffle —
  * grams travel exactly once per participating document, and the
  * kernel runs inside whole-stage codegen. At 100 TB the cost is one
  * doc-keyed aggregation to build the arrays plus a pair-keyed join;
  * array sizes are bounded by per-document vocabulary, never corpus
  * size.
  *
  * Parity: exact integer sums, insensitive to duplicate-free ordering
  * ties (grams are unique per doc after the count aggregation). */
object GramOverlapKernel {
  def clipped(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var s = 0L
    while (i < n && j < m) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) {
        s += math.min(ra.getLong(1), rb.getLong(1)); i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    s
  }
}

/** clipped_overlap(a, b) over two sorted array<struct<string,bigint>>. */
case class ClippedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 =>
      st.fields(0).dataType == StringType &&
        st.fields(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ClippedOverlap expects two array<struct<string,bigint>> args, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    GramOverlapKernel.clipped(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GramOverlapKernel.clipped($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ClippedOverlap = copy(left = l, right = r)
}

/** Longest-common-subsequence length between two token arrays — the
  * ROUGE-L kernel. Classic two-row DP, O(|a|·|b|) time / O(|b|) space
  * per pair; callers bound the arrays to a fixed leading window so the
  * quadratic term is over a CONSTANT, never document length (let alone
  * corpus size). Runs inside whole-stage codegen like [[ClippedOverlap]]. */
object LcsKernel {
  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai.equals(b.getUTF8String(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m).toLong
  }
}

/** lcs_length(a, b) over two array<string> token sequences. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"LcsLength expects two array<string> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsKernel.lcs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsKernel.lcs($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LcsLength = copy(left = l, right = r)
}

object GramOverlapFunctions {
  import org.apache.spark.sql.GraftSql
  def clippedOverlap(a: Column, b: Column): Column =
    GraftSql.column(ClippedOverlap(
      GraftSql.catalystExpression(a), GraftSql.catalystExpression(b)))
  def lcsLength(a: Column, b: Column): Column =
    GraftSql.column(LcsLength(
      GraftSql.catalystExpression(a), GraftSql.catalystExpression(b)))
}
