package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.DoubleType

/** Materialized-view substitution — the lakehouse answer to "this
  * nightly rollup re-scans 100 TB for numbers the mart already holds".
  * A summary table registered against a base path is TRANSPARENTLY
  * substituted into any matching aggregate: the user query is
  * unchanged, the optimized plan reads the (orders-of-magnitude
  * smaller) summary instead of the fact table.
  *
  * Soundness is classic roll-up derivability (Gupta & Mumick's
  * materialized-view rewriting; the same algebra behind Iceberg/
  * Snowflake MV query rewrite): for any grouping G coarser than (a
  * subset of) the MV grain K,
  *   SUM(x)  over G = SUM(mv_sum_x)  over G
  *   COUNT(*) over G = SUM(mv_count) over G
  *   MIN(x)  over G = MIN(mv_min_x)  over G   (MAX likewise)
  * because SUM/COUNT/MIN/MAX are decomposable over any partition of
  * the rows, and the MV partitions them by K. The rewrite fires only
  * when EVERY output column is derivable:
  *  - grouping expressions are bare key columns of the MV grain;
  *  - aggregates are undistinct, unfiltered SUM/COUNT(lit)/MIN/MAX
  *    over measure columns the MV covers;
  *  - below the aggregate sit only attribute-pruning Projects and
  *    Filters whose references are grain keys (a key filter commutes
  *    with the grouping, so it is replayed on the MV);
  * otherwise the plan is left untouched. AVG is served too — not by
  * pretending it is self-decomposable (it is not) but by deriving it
  * from the decomposable pair the MV stores:
  * SUM(mv_sum_x)/SUM(mv_count), double measures only.
  *
  * Output attribute ExprIds are preserved (each rewritten column is
  * re-aliased under its original id), so parent operators — the
  * rounding projection, sorts, joins — are oblivious to the swap.
  * The substituted relation comes from `newInstance()` so two
  * rewrites in one query never collide on attribute ids.
  *
  * Freshness is the caller's contract, exactly as in every lakehouse
  * MV implementation: [[MatView.build]] recomputes the summary and
  * registration is explicit; nothing here tracks base-table commits.
  */
object MatView {
  /** Registered summary: MV column contract is keys verbatim,
    * `mv_count`, and `mv_sum_/mv_min_/mv_max_<measure>`. */
  final case class Def(basePath: String, mvPath: String, keys: Seq[String],
                       measures: Seq[String], relation: LogicalRelation)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, List[Def]]()

  /** Rewrite suppression for the registry's OWN maintenance plans:
    * [[build]]'s summary aggregate over an already-registered base
    * would otherwise be hijacked by [[MatViewRewrite]] and computed
    * FROM the stale summary it is replacing (confirmed failure:
    * rebuild after base appends kept old sums and dropped new grain
    * keys, silently). Same for [[refresh]]'s merge. Thread-local —
    * only the maintenance computation is exempt, concurrent user
    * queries on other threads keep being served. */
  private val bypass = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private[plans] def bypassed: Boolean = bypass.get()
  private def withBypass[T](body: => T): T = {
    bypass.set(java.lang.Boolean.TRUE)
    try body finally bypass.set(java.lang.Boolean.FALSE)
  }

  private[plans] def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  def clear(): Unit = reg.clear()

  /** All summaries registered for a single-root scan, COARSEST grain
    * first (fewest keys → fewest rows → cheapest to serve from). The
    * rewrite tries them in this order and takes the first that covers
    * the query — textbook MV selection, where serving a day-grain
    * rollup from the month-grain summary beats re-reading the
    * day-grain one. A multi-path union is never the registered base. */
  def lookup(rootPaths: Seq[String]): Seq[Def] = {
    val ns = rootPaths.map(norm)
    if (ns.length != 1) Nil
    else Option(reg.get(ns.head)).getOrElse(Nil).sortBy(_.keys.length)
  }

  /** Compute + persist the summary for `basePath`, register it, and
    * return the registration. One shuffle keyed by the grain; the MV
    * is the partial-aggregate state any coarser rollup re-combines. */
  def build(s: SparkSession, basePath: String, mvPath: String,
            keys: Seq[String], measures: Seq[String]): Def = withBypass {
    val df = s.read.parquet(basePath)
    df.groupBy(keys.map(col): _*)
      .agg(summaryAggs(measures).head, summaryAggs(measures).tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    register(s, basePath, mvPath, keys, measures)
  }

  private def summaryAggs(measures: Seq[String]) =
    count(lit(1)).as("mv_count") +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"mv_sum_$m"),
      min(col(m)).as(s"mv_min_$m"),
      max(col(m)).as(s"mv_max_$m")))

  private def analyzedRelation(s: SparkSession, path: String): LogicalRelation =
    s.read.parquet(path).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"MV at $path did not analyze to a file relation"))

  private def register(s: SparkSession, basePath: String, mvPath: String,
                       keys: Seq[String], measures: Seq[String]): Def = {
    val d = Def(basePath, mvPath, keys, measures, analyzedRelation(s, mvPath))
    // one def per grain: a re-register (same keys) replaces, whatever
    // versioned path it now lives at
    reg.compute(norm(basePath), (_, old) =>
      d :: Option(old).getOrElse(Nil)
        .filterNot(x => x.mvPath == mvPath || x.keys == keys))
    d
  }

  /** Registered summaries for `basePath` (current versioned paths) —
    * the accessor tools/specs use instead of assuming the build-time
    * path, which [[refresh]] advances. */
  def registered(basePath: String): Seq[Def] =
    Option(reg.get(norm(basePath))).getOrElse(Nil)

  /** Incremental maintenance: fold an appended `delta` batch into
    * every summary registered for the base WITHOUT rescanning it —
    * the partial-aggregate state is itself decomposable, so the
    * refresh is summarize(delta) ⊎ current, recombined per grain key
    * (sum+=sum, count+=count, min=min-of-mins, max likewise). At
    * 100 TB this is the difference between an MV that costs one
    * fact-table scan per refresh and one that costs the BATCH — wire
    * it to LakeCatalog.tableSince and the mart stays fresh at change-
    * feed cost. Append-only deltas only: deletes/updates need the
    * base rescan (min/max are not subtractable).
    *
    * Each refresh writes a NEW versioned directory (`…_v<n>`) and
    * re-registers — the previous version's files stay on disk, so a
    * query planned against the old relation keeps reading intact
    * files (the same old-snapshot-files discipline as a real MV
    * store; an in-place swap was measured unsafe — concurrent scans
    * hit FileNotFoundException mid-delete). The version before the
    * previous is garbage-collected; the one-version tail is the
    * bounded leak, expired like Iceberg snapshots. */
  /** Tag of the last [[refresh]] applied to a summary (None when the
    * version was built/refreshed untagged) — read from the `_graft_
    * refresh_tag` sidecar inside the versioned dir, so tag and summary
    * contents can never disagree across a crash (the tag is written
    * only after the version's parquet write completes, and a replayed
    * refresh with the same tag is a no-op). */
  def refreshTag(d: Def): Option[String] = {
    val p = java.nio.file.Paths.get(d.mvPath, "_graft_refresh_tag")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  def refresh(s: SparkSession, basePath: String,
              delta: org.apache.spark.sql.DataFrame,
              tag: Option[String] = None): Seq[Def] = withBypass {
    val ds = Option(reg.get(norm(basePath))).getOrElse(
      throw new IllegalArgumentException(s"no MV registered for $basePath"))
    ds.map { d =>
      if (tag.isDefined && refreshTag(d) == tag) d // idempotent replay
      else refreshOne(s, basePath, d, delta, tag)
    }
  }

  private def refreshOne(s: SparkSession, basePath: String, d: Def,
                         delta: org.apache.spark.sql.DataFrame,
                         tag: Option[String]): Def = {
      val needed = d.keys ++ d.measures
      val missing = needed.filterNot(delta.columns.contains)
      require(missing.isEmpty,
        s"delta batch is missing MV columns ${missing.mkString(", ")} — " +
          s"refresh folds per-key partials and cannot impute them")
      val deltaSum = delta.groupBy(d.keys.map(col): _*)
        .agg(summaryAggs(d.measures).head, summaryAggs(d.measures).tail: _*)
      val combAggs = sum(col("mv_count")).as("mv_count") +:
        d.measures.flatMap(m => Seq(
          sum(col(s"mv_sum_$m")).as(s"mv_sum_$m"),
          min(col(s"mv_min_$m")).as(s"mv_min_$m"),
          max(col(s"mv_max_$m")).as(s"mv_max_$m")))
      val merged = s.read.parquet(d.mvPath).unionByName(deltaSum)
        .groupBy(d.keys.map(col): _*).agg(combAggs.head, combAggs.tail: _*)
      val VersionRe = "(.*)_v(\\d+)$".r
      val (root, ver) = d.mvPath match {
        case VersionRe(r, n) => (r, n.toInt)
        case p => (p, 0)
      }
      val next = s"${root}_v${ver + 1}"
      merged.write.mode("overwrite").parquet(next)
      // tag AFTER the parquet write: a crash mid-write leaves the
      // partial version untagged and unregistered, so a replayed
      // refresh overwrites it cleanly instead of skipping
      tag.foreach(t => java.nio.file.Files.write(
        java.nio.file.Paths.get(next, "_graft_refresh_tag"),
        t.getBytes("UTF-8")))
      val newDef = register(s, basePath, next, d.keys, d.measures)
      // GC the version BEFORE the one we just superseded; d.mvPath
      // itself stays for in-flight readers until the next refresh
      if (ver >= 1) {
        val old = java.nio.file.Paths.get(
          if (ver == 1) root else s"${root}_v${ver - 1}")
        if (java.nio.file.Files.exists(old)) {
          val del = java.nio.file.Files.walk(old).sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
          try del.forEach(p => { java.nio.file.Files.delete(p); () })
          finally del.close()
        }
      }
      newDef
  }
}

class MatViewRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MatView.bypassed) plan
    else plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, hint) =>
        rewrite(groupings, aggExprs, child, hint).getOrElse(agg)
    }

  private def rewrite(groupings: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan,
                      hint: Option[AggregateHint]): Option[LogicalPlan] = {
    // Walk to the scan through attribute-pruning Projects, collecting
    // Filters; anything else disqualifies the subtree.
    val filters = Seq.newBuilder[Expression]
    @annotation.tailrec
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case Filter(cond, c) => filters += cond; strip(c)
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some(lr)
      case _ => None
    }
    val scan = strip(child)
    val fs = filters.result()
    val candidates = for {
      lr <- scan.toSeq
      // coarsest-first: the first derivable candidate is the cheapest
      d <- MatView.lookup(lr.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.map(_.toString))
      groupKeys <- asGrainKeys(groupings, d).toSeq
      // determinism gate (same as Spark's own rewrite rules): a
      // non-deterministic predicate like rand() < 0.1 has an empty /
      // key-only reference set and would pass the reference check
      // vacuously — replaying it on the MV samples GROUPS where the
      // user asked to sample ROWS
      if fs.forall(f => f.deterministic &&
        f.references.forall(r => d.keys.contains(r.name)))
      mv = d.relation.newInstance()
      mvAttr = mv.output.map(a => a.name -> a).toMap
      newAggs <- derive(aggExprs, d, mvAttr).toSeq
    } yield {
      val base = fs.foldLeft(mv: LogicalPlan) { (p, f) =>
        Filter(remap(f, mvAttr), p)
      }
      Aggregate(groupKeys.map(mvAttr(_)), newAggs, base, hint)
    }
    candidates.headOption
  }

  private def asGrainKeys(groupings: Seq[Expression],
                          d: MatView.Def): Option[Seq[String]] = {
    val names = groupings.map {
      case a: AttributeReference if d.keys.contains(a.name) => a.name
      case _ => return None
    }
    Some(names)
  }

  private def remap(e: Expression,
                    mvAttr: Map[String, AttributeReference]): Expression =
    e.transform { case a: AttributeReference => mvAttr(a.name) }

  /** Rewrite every output column or give up: grain keys re-alias to
    * the MV attribute under the ORIGINAL ExprId; decomposable
    * aggregates re-target their pre-combined MV column. Arbitrary
    * scalar expressions AROUND the aggregates (CollapseProject folds
    * `sum(x) * 2`-style projections into the Aggregate before user
    * rules run) are preserved — only the aggregate leaves and key
    * references inside them are re-targeted. */
  private object NotDerivable extends Exception { override def fillInStackTrace(): Throwable = this }

  private def derive(aggExprs: Seq[NamedExpression], d: MatView.Def,
                     mvAttr: Map[String, AttributeReference])
      : Option[Seq[NamedExpression]] = {
    def rewriteAgg(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.isDefined) throw NotDerivable
      ae.aggregateFunction match {
        case s: Sum =>
          val c = measureCol(s.child, "mv_sum_", d, mvAttr)
            .getOrElse(throw NotDerivable)
          val re = ae.copy(aggregateFunction = Sum(c))
          // Sum re-applies its type widening to the already-widened MV
          // column (Decimal(p+10,s) → Decimal(p+20,s)); consumers hold
          // the ORIGINAL ExprId and dataType, so cast back. (Doubles
          // and longs are type-stable — the cast folds away.)
          if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
        case m: Min =>
          ae.copy(aggregateFunction = Min(measureCol(m.child, "mv_min_", d,
            mvAttr).getOrElse(throw NotDerivable)))
        case m: Max =>
          ae.copy(aggregateFunction = Max(measureCol(m.child, "mv_max_", d,
            mvAttr).getOrElse(throw NotDerivable)))
        case c: Count if c.children.forall(_.foldable) =>
          // COUNT is 0 over zero rows, SUM is NULL — diverges for a
          // global (no grouping keys) aggregate over an empty base
          Coalesce(Seq(ae.copy(aggregateFunction = Sum(mvAttr("mv_count"))),
            Literal(0L)))
        case a: Average if ae.dataType == DoubleType =>
          // (double measures only: a decimal AVG's sum-then-divide
          // precision contract differs from double division)
          // AVG is not self-decomposable, but it IS derivable from the
          // decomposable pair the MV already stores:
          //   AVG(x) over G = SUM(mv_sum_x) / SUM(mv_count)
          // (weighted by construction — each MV row contributes its
          // group's total, not its mean). NULL semantics line up: a
          // served group has mv_count >= 1, and the global-over-empty
          // case is NULL/NULL = NULL exactly like AVG. Cast back
          // because Average's result type (e.g. decimal p+4/s+4) is
          // not Divide-of-Sums' type.
          val c = measureCol(a.child, "mv_sum_", d, mvAttr)
            .getOrElse(throw NotDerivable)
          val div = Divide(
            Cast(ae.copy(aggregateFunction = Sum(c)), DoubleType),
            Cast(ae.copy(aggregateFunction = Sum(mvAttr("mv_count")),
              resultId = NamedExpression.newExprId), DoubleType))
          if (div.dataType == ae.dataType) div else Cast(div, ae.dataType)
        case _ => throw NotDerivable
      }
    }
    def rewriteExpr(e: Expression): Expression = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference =>
        if (d.keys.contains(a.name)) mvAttr(a.name) else throw NotDerivable
      case other => other.mapChildren(rewriteExpr)
    }
    try Some(aggExprs.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(rewriteExpr(al.child), al.name)(exprId = al.exprId)
      case _ => throw NotDerivable
    }) catch { case NotDerivable => None }
  }

  private def measureCol(child: Expression, prefix: String, d: MatView.Def,
                         mvAttr: Map[String, AttributeReference])
      : Option[AttributeReference] = child match {
    case a: AttributeReference if d.measures.contains(a.name) =>
      mvAttr.get(prefix + a.name)
    case _ => None
  }
}
