package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: for every output column of a DataFrame, the
  * set of (table, column) LEAVES it derives from — the governance
  * primitive behind impact analysis ("which marts break if
  * l_discount changes type"), PII propagation audits ("does any
  * export column derive from c_name"), and debugging ("where did
  * this number actually come from").
  *
  * Works on the ANALYZED plan (pre-optimization, so user-visible
  * column names survive) by propagating leaf sets bottom-up through
  * attribute references: a relation's attributes map to themselves;
  * every NamedExpression produced by a Project / Aggregate / Window /
  * Generate maps to the union of the leaves of the attributes it
  * references (transitively, through any scalar expression). Join /
  * Filter / Sort / SetOp nodes produce no new attributes and pass
  * the maps through; Union merges positionally.
  *
  * This is DERIVATION lineage (which inputs feed the value), not
  * influence lineage: filter/join predicates affect which ROWS
  * survive but do not make their columns part of a value's
  * derivation — the standard column-lineage semantics (matching
  * OpenLineage's column-level facet).
  *
  * Table names come from the scan: the last path segment of a
  * file relation (`…/lineitem.parquet` → `lineitem`); non-file
  * leaves fall back to the node name. */
object Lineage {

  type Leaves = Set[(String, String)]

  /** Derivation edges of named plans as a (plan, out_col, src_table,
    * src_col) DataFrame — the registry/oracle surface: lineage is a
    * pure function of the ANALYZED plan (no execution, no data read),
    * so for fixed plans the edge set is a constant the DuckDB oracle
    * can assert verbatim. Driver-built rows: the edge count is
    * #outputs × #leaves, metadata-scale by construction. */
  def edges(s: org.apache.spark.sql.SparkSession,
            plans: Seq[(String, DataFrame)]): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val rows = for {
      (plan, df) <- plans
      (out, leaves) <- columns(df).toSeq
      (t, c) <- leaves.toSeq
    } yield org.apache.spark.sql.Row(plan, out, t, c)
    val schema = StructType(Seq(
      StructField("plan", StringType, nullable = false),
      StructField("out_col", StringType, nullable = false),
      StructField("src_table", StringType, nullable = false),
      StructField("src_col", StringType, nullable = false)))
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema)
      .orderBy("plan", "out_col", "src_table", "src_col")
  }

  def columns(df: DataFrame): Map[String, Leaves] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[(String, String)])).toMap
  }

  private def tableNameOf(lr: LogicalRelation): String =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map { p =>
          val seg = p.getName
          if (seg.endsWith(".parquet")) seg.stripSuffix(".parquet") else seg
        }.getOrElse("file_relation")
      case other => other.getClass.getSimpleName
    }

  private def walk(p: LogicalPlan): Map[ExprId, Leaves] = {
    // each child is walked exactly ONCE — Union consumes the per-branch
    // maps and SubqueryAlias the merged map from the same traversal
    // (re-walking children per node is exponential in alias/view depth,
    // and Spark wraps every view in SubqueryAlias)
    val childMaps: Seq[Map[ExprId, Leaves]] = p.children.map(walk)
    val fromChildren: Map[ExprId, Leaves] =
      childMaps.foldLeft(Map.empty[ExprId, Leaves])(_ ++ _)
    def leavesOf(e: Expression): Leaves =
      e.references.toSeq.flatMap(a =>
        fromChildren.getOrElse(a.exprId, Set.empty[(String, String)])).toSet
    p match {
      case lr: LogicalRelation =>
        val t = tableNameOf(lr)
        lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case leaf: LeafNode =>
        val t = leaf.nodeName
        leaf.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case Project(pl, _) =>
        fromChildren ++ pl.map(ne => ne.exprId -> leavesOf(ne))
      case Aggregate(_, aggs, _, _) =>
        fromChildren ++ aggs.map(ne => ne.exprId -> leavesOf(ne))
      case w: Window =>
        fromChildren ++ w.windowExpressions.map(ne => ne.exprId -> leavesOf(ne))
      case g: Generate =>
        // every generator output column derives from the generator input
        val src = leavesOf(g.generator)
        fromChildren ++ g.generatorOutput.map(a => a.exprId -> src)
      case u: Union =>
        // positional merge: output column i derives from every branch's i-th
        val merged = u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
          }.toSet
        }
        fromChildren ++ merged
      case e: Expand =>
        fromChildren ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap(proj => leavesOf(proj(i))).toSet
        }
      case _: SubqueryAlias => fromChildren
      case _ => fromChildren // Filter/Join/Sort/Limit/Distinct/SetOps: pass-through
    }
  }
}
