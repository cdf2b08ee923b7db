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
  * LakeCatalog stores a derived `graft_days_<ts> = to_date(<ts>)`
  * partition column and hides it behind a projection, so user queries
  * filter on the timestamp column only — which Spark cannot use for
  * partition pruning on its own. This rule derives the implied
  * partition bounds from timestamp predicates and injects them under
  * the projection, where the standard pushdown rules carry them into
  * the scan's PartitionFilters:
  *
  *   ts >= T  =>  graft_days_ts >= date(T)
  *   ts <= T  =>  graft_days_ts <= date(T)   (>, <, = likewise)
  *
  * Scoping: the rewrite fires only for DateType columns named with the
  * `graft_days_` prefix, whose suffix names a TimestampType column in
  * the same relation. Directory-derived partition columns cannot carry
  * Catalyst metadata (the partition schema is re-inferred from paths on
  * read), so the derivation contract is encoded in the physical column
  * NAME — LakeCatalog.append is the only writer of that prefix, exactly
  * like Iceberg's `days(x)` transform column. A user table with an
  * unrelated date column (e.g. its own `p_date` processing date) can
  * never match.
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
  /** Physical-column prefix marking a LakeCatalog `days()` transform. */
  val Prefix = "graft_days_"

  /** User-provided rules run after the main optimizer batch, so
    * predicate pushdown has already placed the timestamp filter
    * directly over the relation that exposes the partition column;
    * physical planning (FileSourceStrategy) runs after us and
    * classifies the injected conjuncts as PartitionFilters. The
    * references-partition-column guard keeps the rewrite idempotent
    * across fixpoint iterations. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val bounds = child.output.collect {
        case p if p.dataType == DateType && p.name.startsWith(Prefix) &&
            !cond.references.exists(_.name == p.name) =>
          child.output.find(t => t.name == p.name.stripPrefix(Prefix) &&
              t.dataType == TimestampType)
            .map(ts => derive(cond, p, ts.name)).getOrElse(Nil)
      }.flatten
      if (bounds.isEmpty) f
      else Filter(And(cond, bounds.reduce(And)), child)
  }

  private def toDate(ts: Expression): Expression =
    Cast(ts, DateType, Some("UTC"))

  /** Derive partition bounds from conjunctive predicates on `tsName`. */
  private def derive(cond: Expression, pDate: Attribute,
                     tsName: String): Seq[Expression] = {
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == tsName && a.dataType == TimestampType
      case _ => false
    }
    def lit(e: Expression): Boolean = e.foldable && e.dataType == TimestampType
    cond match {
      case And(l, r) => derive(l, pDate, tsName) ++ derive(r, pDate, tsName)
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
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Besides the optimizer rule and the TopKPerGroup strategy, the native
  * vector/sketch kernels are registered as SQL functions, so the SQL
  * entry point (SURVEY §3.3) reaches the same codegen expressions the
  * DataFrame API uses — `SELECT vec_cosine(a.embedding, b.embedding)`
  * works over Thrift/spark-sql exactly like `VectorFunctions.cosine`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def register(ext: SparkSessionExtensions, name: String, arity: Int,
                       builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments")
        builder(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HiddenPartitionPruning)
    ext.injectOptimizerRule(_ => FoldSortIntoWindow)
    ext.injectOptimizerRule(session => new MatViewRewrite(session))
    ext.injectOptimizerRule(session => new RedundantJoinElimination(session))
    // hint batch: must substitute BEFORE ResolveRelations rejects
    // time travel over temp views (see TimeTravelResolution)
    ext.injectHintResolutionRule(session => new TimeTravelResolution(session))
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    register(ext, "vec_dot", 2, a => graft.functions.VecDot(a(0), a(1)))
    register(ext, "vec_cosine", 2, a => graft.functions.VecCosine(a(0), a(1)))
    register(ext, "vec_l2dist", 2, a => graft.functions.VecL2Dist(a(0), a(1)))
    register(ext, "sorted_jaccard", 2, a => graft.functions.SortedLongJaccard(a(0), a(1)))
    // over an array<bigint> of token hashes (e.g. transform(tokens, xxhash64))
    register(ext, "long_simhash", 1, a => graft.functions.LongSimHash(a(0)))
    // element-wise vector sum aggregate (array<float|double> -> array<double>)
    register(ext, "vec_sum", 1,
      a => graft.functions.VecSumAgg(a(0)).toAggregateExpression())
    // Misra-Gries frequent-items sketch: mg_topk(col, k) -> array<string>
    ext.injectFunction((FunctionIdentifier("mg_topk"),
      new ExpressionInfo("graft.functions", "mg_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "mg_topk expects (column, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"mg_topk k must be an integer literal, got $other")
        }
        graft.functions.MisraGriesTopK(args(0), k).toAggregateExpression()
      }))
    // KMV distinct-count sketch: kmv_mins(hash_col, k) -> array<bigint>
    ext.injectFunction((FunctionIdentifier("kmv_mins"),
      new ExpressionInfo("graft.functions", "kmv_mins"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_mins expects (column, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_mins k must be an integer literal, got $other")
        }
        graft.functions.KmvMins(args(0), k).toAggregateExpression()
      }))
  }
}
