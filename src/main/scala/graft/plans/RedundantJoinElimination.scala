package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Constraint-based redundant-join elimination — the optimizer rewrite
  * every warehouse engine ships once it has PK/FK metadata (Oracle's
  * join elimination, SQL Server's FK table elimination, Trino/Calcite
  * project-join-transpose family; Spark itself has no constraint store,
  * which is the gap this fills): a join against a dimension whose
  * columns the query never uses is pure row-multiplicity bookkeeping,
  * and declared constraints prove the multiplicity is exactly 1 — so
  * the join (and the whole dimension SCAN) can be deleted from the
  * plan. At 100 TB views routinely join every dimension "just in
  * case"; queries touching two of ten dimensions should pay for two,
  * not ten.
  *
  * Soundness, per join type, for `left JOIN dim ON l.fk = d.pk` where
  * no `dim` column survives above the join:
  *  - LEFT OUTER needs only the declared UNIQUE KEY ([[Constraints
  *    .declareKey]]): uniqueness ⇒ at most one match per left row, and
  *    left-outer ⇒ at least one output row — every left row appears
  *    exactly once, join deleted unconditionally.
  *  - INNER additionally needs referential integrity ([[Constraints
  *    .declareForeignKey]]): FK ⇒ the probe value is non-null and
  *    present in the dimension, so the join filters nothing.
  * The dimension side must strip to its bare scan through
  * attribute-pruning Projects only — a Filter on it could drop rows
  * (inner) and the rewrite declines.
  *
  * Constraints are DECLARED and trusted (the `RELY` constraint model:
  * the warehouse loader guarantees them, the optimizer exploits them)
  * — exactly how every production engine treats FK elimination, since
  * verifying uniqueness per query would cost more than the join. */
object Constraints {
  private val keys =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  private val fks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Declare `keyCol` unique + non-null in the parquet at `path`. */
  def declareKey(path: String, keyCol: String): Unit = {
    keys.put(norm(path), Set(keyCol)); ()
  }

  /** Declare that `fkCol` of the parquet at `childPath` is non-null and
    * always present in the declared key of `parentPath`. */
  def declareForeignKey(childPath: String, fkCol: String,
      parentPath: String): Unit = {
    fks.put((norm(childPath), fkCol), norm(parentPath)); ()
  }

  def clear(): Unit = { keys.clear(); fks.clear() }

  /** Audit-then-declare: verify uniqueness + non-null with ONE
    * aggregate over the data (rows == non-null == distinct), then
    * declare. The RELY model with a receipt — run at LOAD time, once,
    * not per query; throws with the three counts when the audit
    * fails, declaring nothing. */
  def verifyAndDeclareKey(s: SparkSession, path: String,
      keyCol: String): Unit = {
    import org.apache.spark.sql.functions.{count, countDistinct, col, lit}
    val r = s.read.parquet(path)
      .agg(count(lit(1)), count(col(keyCol)), countDistinct(col(keyCol)))
      .collect()(0)
    val (n, nn, ndv) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(n == nn && n == ndv,
      s"$keyCol is not a unique non-null key of $path: " +
        s"rows=$n non_null=$nn distinct=$ndv")
    declareKey(path, keyCol)
  }

  private[plans] def keyOf(path: String): Option[String] =
    Option(keys.get(norm(path))).flatMap(_.headOption)
  private[plans] def fkTarget(path: String, col: String): Option[String] =
    Option(fks.get((norm(path), col)))
}

class RedundantJoinElimination(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: Join) =>
      tryEliminate(j, p.references).map(l => p.copy(child = l)).getOrElse(p)
    case a @ Aggregate(_, _, j: Join, _) =>
      tryEliminate(j, a.references).map(l => a.copy(child = l)).getOrElse(a)
    // DISTINCT over a declared unique key is the identity: Spark plans
    // Distinct/dropDuplicates as a grouping-only Aggregate; when the
    // groupings include the scan's declared key and every output is a
    // bare grouping attribute, the de-dup shuffle computes nothing —
    // replace with a Project (same output attrs, zero exchanges).
    case a @ Aggregate(groupings, aggs, child, _)
        if aggs.forall(_.isInstanceOf[AttributeReference]) &&
          aggs.map(_.exprId).toSet == groupings.collect {
            case ar: AttributeReference => ar.exprId
          }.toSet &&
          groupings.forall(_.isInstanceOf[AttributeReference]) &&
          distinctRedundant(groupings, child) =>
      Project(aggs, child)
  }

  /** True when `child` strips to a scan whose declared unique key is
    * among the grouping attributes (filters allowed — a subset of rows
    * of a unique column is still unique). */
  private def distinctRedundant(groupings: Seq[Expression],
      child: LogicalPlan): Boolean =
    strip(child, allowFilter = true).exists { lr =>
      pathOf(lr).flatMap(Constraints.keyOf).exists(pk =>
        groupings.exists {
          case ar: AttributeReference =>
            ar.name == pk && lr.outputSet.contains(ar)
          case _ => false
        })
    }

  /** The left child when `j`'s right side is provably redundant for a
    * parent referencing only `parentRefs`. */
  private def tryEliminate(j: Join, parentRefs: AttributeSet)
      : Option[LogicalPlan] = {
    if (j.joinType != Inner && j.joinType != LeftOuter) return None
    // parent must not touch the dimension side
    if (parentRefs.exists(j.right.outputSet.contains)) return None
    for {
      cond <- j.condition
      (lAttr, rAttr) <- asEquiPair(cond, j)
      dimPath <- scanPath(j.right)
      pk <- Constraints.keyOf(dimPath)
      if rAttr.name == pk
      if j.joinType == LeftOuter || innerSafe(j.left, lAttr, dimPath)
    } yield j.left
  }

  private def asEquiPair(cond: Expression, j: Join)
      : Option[(AttributeReference, AttributeReference)] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
        Some((a, b))
      else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
        Some((b, a))
      else None
    case _ => None
  }

  /** Inner elimination needs the declared FK from the left scan's
    * column to the dimension — and the probe column must reach the
    * left scan UNTRANSFORMED (an expression over it voids the
    * declaration). */
  private def innerSafe(left: LogicalPlan, lAttr: AttributeReference,
      dimPath: String): Boolean =
    scanPathOf(left, lAttr).exists(p =>
      Constraints.fkTarget(p, lAttr.name).contains(dimPath))

  /** Bare-scan path of a plan that is only attribute-pruning Projects
    * over one file relation (Filters allowed on the LEFT side lookup —
    * they don't affect whether lAttr is the scan's own column). */
  @annotation.tailrec
  private def strip(p: LogicalPlan, allowFilter: Boolean): Option[LogicalRelation] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c, allowFilter)
      case Filter(_, c) if allowFilter => strip(c, allowFilter)
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some(lr)
      case _ => None
    }

  private def pathOf(lr: LogicalRelation): Option[String] = {
    val roots = lr.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.map(_.toString)
    if (roots.length == 1)
      Some(roots.head.stripPrefix("file:").replaceAll("/+$", ""))
    else None
  }

  private def scanPath(p: LogicalPlan): Option[String] =
    strip(p, allowFilter = false).flatMap(pathOf)

  private def scanPathOf(p: LogicalPlan, attr: AttributeReference)
      : Option[String] =
    strip(p, allowFilter = true)
      .filter(_.outputSet.contains(attr))
      .flatMap(pathOf)
}
