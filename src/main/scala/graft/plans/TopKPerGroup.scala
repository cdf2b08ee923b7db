package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group — the
  * `row_number() over (partition by g order by o) <= k` pattern as a
  * first-class operator (SURVEY §7.5's "custom LogicalPlan + Strategy +
  * SparkPlan" tier; registered by [[GraftExtensions]]).
  *
  * Why not the window formulation: WindowExec must SORT every
  * partition on (group, order) — O(n log n) over the full 100 TB input
  * — and materializes a rank column just to filter on it. This
  * operator keeps a bounded k-heap per group instead: O(n log k),
  * no sort, no rank column, and it runs TWO-PHASE like HashAggregate —
  * a partial pass before the shuffle caps each (group, partition) at
  * k rows, so the exchange moves at most k * partitions rows per
  * group rather than the whole table.
  *
  * Output rows per group are the same SET the window+filter produces
  * (ties broken by the ordering's tie-break columns); within-group
  * output order is unspecified, as with any unsorted relational result.
  */
final case class TopKPerGroupNode(groupExprs: Seq[Expression],
                                  order: Seq[SortOrder], k: Int,
                                  child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

final case class TopKPerGroupExec(groupExprs: Seq[Expression],
                                  order: Seq[SortOrder], k: Int,
                                  partial: Boolean,
                                  child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Final pass needs co-located groups (EnsureRequirements inserts the
    * exchange); the partial pass runs wherever the child's rows are. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      // best-first comparator from the SortOrder; heap keeps the worst
      // retained row at its head so it can be evicted in O(log k)
      val cmp = GenerateOrdering.generate(orderE, childOutput)
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) { // row ranks better than current worst
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Plans TopKPerGroupNode as partial → (shuffle) → final, mirroring
  * the HashAggregate two-phase shape. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the operator. */
object TopKPerGroup {
  /** Top `k` rows of `df` per distinct value of `groupCols`, ranked by
    * `orderCols` (include a unique tie-break column for deterministic
    * results, exactly as with window row_number). */
  def apply(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val order = orderCols.map(GraftSql.catalystExpression(_) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    GraftSql.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(GraftSql.catalystExpression), order, k,
        df.queryExecution.analyzed))
  }
}
