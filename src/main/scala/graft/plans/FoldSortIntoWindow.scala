package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Folds a global pre-sort into the window's own orderSpec — fixing the
  * plan Spark produces when it decorrelates `LATERAL (... ORDER BY s
  * LIMIT k)` (and the hand-written equivalent `row_number() OVER
  * (PARTITION BY p)` over an ORDER-BY subquery).
  *
  * The decorrelator rewrites the correlated LIMIT as
  *
  *   Window [row_number() OVER (PARTITION BY p)]   -- EMPTY orderSpec
  *   +- Sort [s...], global=true                   -- whole-table range sort
  *
  * i.e. the per-group ordering the LIMIT needs is expressed as a GLOBAL
  * range-partitioned sort of the entire input, whose order the window
  * then consumes implicitly (hash exchange + stable local sort on p).
  * At 100 TB that global sort is a full extra shuffle of the fact table
  * — strictly wasted work, because only the order WITHIN each partition
  * group matters. This rule rewrites the pattern to
  *
  *   Window [row_number() OVER (PARTITION BY p ORDER BY s...)]
  *   +- <sort child>
  *
  * which plans as one hash exchange on p plus a local sort on (p, s) —
  * the plan one would write by hand. Row-number ties are ordered
  * identically (same sort keys, now per-partition).
  *
  * Fires only on the exact decorrelation fingerprint, so it cannot
  * change any query's semantics:
  *  - every window function in the node is `row_number()` with an empty
  *    orderSpec (the only function the LIMIT-decorrelator plants; rank/
  *    dense_rank or running aggregates are never rewritten),
  *  - the window input is a global Sort, optionally behind Projects
  *    (column pruning inserts one), each transparent (attribute/alias
  *    projections only — no generators, no aggregation),
  *  - the sort keys are deterministic.
  * Output schema and (per the SQL contract, unordered) results are
  * unchanged; an added Project re-exposes exactly the original output.
  */
object FoldSortIntoWindow extends Rule[LogicalPlan] {

  private def isOrderlessRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber,
      WindowSpecDefinition(_, Nil, _)), _) => true
    case _ => false
  }

  /** Walk through transparent Projects to a global Sort; returns the
    * projects traversed (outermost first) and the sort. */
  private def findSort(plan: LogicalPlan,
      acc: List[Project]): Option[(List[Project], Sort)] = plan match {
    case s @ Sort(_, true, _, _) => Some((acc, s))
    case p @ Project(projList, child)
        if projList.forall(pe => pe.isInstanceOf[AttributeReference] ||
          pe.isInstanceOf[Alias]) && !p.expressions.exists(_.exists {
            case _: WindowExpression => true
            case _: AggregateWindowFunction => true
            case _ => false
          }) =>
      findSort(child, acc :+ p)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(winExprs, partSpec, Nil, wchild, hint)
        if winExprs.nonEmpty && winExprs.forall(isOrderlessRowNumber) =>
      findSort(wchild, Nil) match {
        case Some((projects, sort))
            if sort.order.forall(_.deterministic) &&
              // each traversed project must be able to carry the sort
              // keys upward: keys must resolve against the sort output
              sort.order.flatMap(_.references)
                .forall(sort.child.outputSet.contains) =>
          // Rebuild the project chain innermost-first, appending any
          // sort-key attributes a projection would otherwise drop.
          val sortAttrs = AttributeSet(sort.order.flatMap(_.references)).toSeq
          val newInput = projects.foldRight(sort.child: LogicalPlan) {
            (p, child) =>
              val missing = sortAttrs.filterNot(p.outputSet.contains)
                .filter(child.outputSet.contains)
              Project(p.projectList ++ missing, child)
          }
          val newWinExprs = winExprs.map {
            case a @ Alias(WindowExpression(fn,
                WindowSpecDefinition(ps, Nil, frame)), name) =>
              Alias(WindowExpression(fn,
                WindowSpecDefinition(ps, sort.order, frame)), name)(
                a.exprId, a.qualifier, a.explicitMetadata, a.nonInheritableMetadataKeys)
            case other => other
          }
          // Window output = child output ++ window cols; the child may
          // now expose extra sort-key columns — re-project the original
          // schema so parents are untouched.
          Project(w.output, Window(newWinExprs, partSpec, sort.order, newInput, hint))
        case _ => w
      }
  }
}
