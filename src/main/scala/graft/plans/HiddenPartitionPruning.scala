package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Hidden-partitioning pruning rule — the Catalyst piece of the
  * Iceberg `PARTITIONED BY (days(extracted_at))` emulation (reference
  * extract_bitcoin_prices.py:144; SURVEY §1.4, §4).
  *
  * LakeCatalog stores a derived `p_date = to_date(extracted_at)`
  * partition column and hides it behind a projection, so user queries
  * filter on `extracted_at` only — which Spark cannot use for
  * partition pruning on its own. This rule derives the implied
  * `p_date` bounds from timestamp predicates and injects them under
  * the projection, where the standard pushdown rules carry them into
  * the scan's PartitionFilters:
  *
  *   extracted_at >= T  =>  p_date >= date(T)
  *   extracted_at <= T  =>  p_date <= date(T)   (>, <, = likewise)
  *
  * The derivation is sound because to_date is monotone in UTC (all
  * sessions run UTC; build.sbt pins it): ts1 <= ts2 implies
  * date(ts1) <= date(ts2), so the date bound can never exclude a row
  * the timestamp predicate keeps. The original predicate still runs —
  * the rewrite only ADDS a coarser partition-level filter.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object HiddenPartitionPruning extends Rule[LogicalPlan] {
  private val PartitionCol = "p_date"
  private val TsCol = "extracted_at"

  /** User-provided rules run after the main optimizer batch, so
    * predicate pushdown has already placed the timestamp filter
    * directly over the relation that exposes p_date; physical planning
    * (FileSourceStrategy) runs after us and classifies the injected
    * p_date conjuncts as PartitionFilters. The reference-to-p_date
    * guard keeps the rewrite idempotent across fixpoint iterations. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if child.output.exists(a => a.name == PartitionCol && a.dataType == DateType) &&
          !cond.references.exists(_.name == PartitionCol) =>
      val pDate = child.output.find(_.name == PartitionCol).get
      val bounds = derive(cond, pDate)
      if (bounds.isEmpty) f
      else Filter(And(cond, bounds.reduce(And)), child)
  }

  private def toDate(ts: Expression): Expression =
    Cast(ts, DateType, Some("UTC"))

  /** Derive p_date bounds from conjunctive extracted_at predicates. */
  private def derive(cond: Expression, pDate: Attribute): Seq[Expression] = {
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == TsCol && a.dataType == TimestampType
      case _ => false
    }
    def lit(e: Expression): Boolean = e.foldable && e.dataType == TimestampType
    cond match {
      case And(l, r) => derive(l, pDate) ++ derive(r, pDate)
      case GreaterThanOrEqual(a, v) if isTs(a) && lit(v) =>
        Seq(GreaterThanOrEqual(pDate, toDate(v)))
      case GreaterThan(a, v) if isTs(a) && lit(v) =>
        Seq(GreaterThanOrEqual(pDate, toDate(v)))
      case LessThanOrEqual(a, v) if isTs(a) && lit(v) =>
        Seq(LessThanOrEqual(pDate, toDate(v)))
      case LessThan(a, v) if isTs(a) && lit(v) =>
        Seq(LessThanOrEqual(pDate, toDate(v)))
      case EqualTo(a, v) if isTs(a) && lit(v) =>
        Seq(EqualTo(pDate, toDate(v)))
      // mirrored literal-first forms
      case GreaterThanOrEqual(v, a) if isTs(a) && lit(v) =>
        Seq(LessThanOrEqual(pDate, toDate(v)))
      case GreaterThan(v, a) if isTs(a) && lit(v) =>
        Seq(LessThanOrEqual(pDate, toDate(v)))
      case LessThanOrEqual(v, a) if isTs(a) && lit(v) =>
        Seq(GreaterThanOrEqual(pDate, toDate(v)))
      case LessThan(v, a) if isTs(a) && lit(v) =>
        Seq(GreaterThanOrEqual(pDate, toDate(v)))
      case _ => Nil
    }
  }
}

/** Session extension wiring: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HiddenPartitionPruning)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
