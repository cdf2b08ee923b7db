package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension #2: LEFT OUTER as-of join as a
  * first-class physical operator (the same §7.5 tier as
  * [[TopKPerGroupNode]]; registered by [[GraftExtensions]]).
  *
  * Semantics: for every left row, the LAST right row (in the right
  * side's (key, time, tieBreak) sort order) with equal keys and
  * rTime <= lTime; right columns are null when no such row exists —
  * identical to [[graft.operators.TemporalJoins.asOfJoin]]'s
  * union+running-last formulation and to ANSI `ASOF LEFT JOIN`.
  *
  * Why a dedicated operator when the composition already scales: the
  * composition unions both inputs into one stream, so the per-key sort
  * carries |L|+|R| rows, materializes a running-last column, and then
  * filters half the rows back out. This operator instead asks
  * EnsureRequirements for co-partitioned, (key, time)-sorted children
  * — the exchanges Catalyst already knows how to plan, reuse, and
  * AQE-coalesce — and then streams BOTH sorted sides through one
  * forward-only merge pass per partition: O(|L|+|R|) with no union
  * row-widening, no window state, no post-filter. The right pointer
  * never rewinds (left times are nondecreasing within a key), and only
  * ONE buffered right row (the current best match) is ever held —
  * constant memory per partition regardless of key cardinality. */
final case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                              leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                              leftTime: Expression, rightTime: Expression,
                              rightTieBreak: Seq[Expression]) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

final case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                              leftTime: Expression, rightTime: Expression,
                              rightTieBreak: Seq[Expression],
                              left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition on the keys (EnsureRequirements aligns the two
    * children's shuffle specs) ... */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  /** ... and sort each side by (keys, time) — right also by the tie
    * break, so "last match wins" is deterministic at equal timestamps. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      // schema-level orderings over the projected key / time rows
      val keyAttrs = lKeys.zipWithIndex.map { case (e, i) =>
        AttributeReference(s"k$i", e.dataType, nullable = true)() }
      val keyOrd = GenerateOrdering.generate(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val tAttr = AttributeReference("t", lTime.dataType, nullable = true)() :: Nil
      val tOrd = GenerateOrdering.generate(tAttr.map(SortOrder(_, Ascending)), tAttr)
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeProj(lRow)
        // advance the right pointer past every row at-or-before (lKey, lT)
        var advancing = true
        while (advancing && rNext != null) {
          val rKey = rKeyProj(rNext)
          val kc = keyOrd.compare(rKey, lKey)
          if (kc < 0) {
            rNext = if (rIter.hasNext) rIter.next() else null
          } else if (kc == 0 && tOrd.compare(rTimeProj(rNext), lT) <= 0) {
            lastMatch = rNext.copy()
            lastMatchKey = rKey.copy()
            rNext = if (rIter.hasNext) rIter.next() else null
          } else advancing = false
        }
        val matched = lastMatch != null && lastMatchKey != null &&
          keyOrd.compare(lastMatchKey, lKey) == 0
        resultProj(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. Column NAMES must be unambiguous across the
  * two inputs for downstream selects (rename the right side's key/time
  * columns first, as with any join). `rightTieBreak` names right-side
  * columns that order same-timestamp matches (last wins). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftKeys: Seq[String], rightKeys: Seq[String],
            lTime: String, rTime: String,
            rightTieBreak: Seq[String] = Nil): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    GraftSql.ofRows(left.sparkSession, AsOfJoinNode(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, lTime), attr(rPlan, rTime), rightTieBreak.map(attr(rPlan, _))))
  }
}
