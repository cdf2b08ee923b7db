package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL-level time travel over the lake emulation: makes
  * `SELECT … FROM v VERSION AS OF n` and `… TIMESTAMP AS OF ts` work
  * through ANY SQL entry point (spark.sql, the Thrift/JDBC endpoint —
  * i.e. a dbt model can time-travel the way it would against real
  * Iceberg, reference README.md:301's snapshots surface made
  * queryable).
  *
  * Spark's parser already produces [[RelationTimeTravel]] for the
  * syntax; its analyzer then rejects it for anything that is not a
  * DSv2 time-travel-capable table — temp views included (the error is
  * raised inside ResolveRelations, before extension resolution rules
  * run). So this rule is injected into the HINT resolution batch,
  * which runs before the Resolution batch: a time-travel node whose
  * relation name is registered (LakeCatalog.exposeSql) is substituted
  * with the catalog's `tableAsOf` plan before the built-in analyzer
  * ever sees it; unregistered names fall through to Spark's standard
  * UNSUPPORTED_FEATURE error.
  *
  * Timestamp resolution happens driver-side against the snapshot LOG
  * (metadata, KB-scale) — never the data. */
object TimeTravel {
  /** Resolver pair a catalog registers per exposed view. */
  final case class Target(asOfVersion: Long => DataFrame,
                          asOfTimestamp: java.time.Instant => DataFrame)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Target]()

  def register(viewName: String, t: Target): Unit = {
    reg.put(viewName.toLowerCase(java.util.Locale.ROOT), t); ()
  }
  def clear(): Unit = reg.clear()
  private[plans] def lookup(name: String): Option[Target] =
    Option(reg.get(name.toLowerCase(java.util.Locale.ROOT)))
}

class TimeTravelResolution(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(ur: UnresolvedRelation, ts, ver) =>
      TimeTravel.lookup(ur.multipartIdentifier.mkString(".")) match {
        case None => tt
        case Some(target) =>
          (ver, ts) match {
            case (Some(v), _) =>
              target.asOfVersion(v.toLong).queryExecution.analyzed
            case (None, Some(expr)) if expr.foldable =>
              // mimic Spark's own TimeTravelSpec: evaluate the literal
              // expression as a session-zone timestamp
              val micros = Cast(expr, TimestampType,
                Some(session.sessionState.conf.sessionLocalTimeZone))
                .eval(null).asInstanceOf[Long]
              target.asOfTimestamp(
                java.time.Instant.EPOCH.plus(micros,
                  java.time.temporal.ChronoUnit.MICROS))
                .queryExecution.analyzed
            case _ => tt // non-literal timestamp: Spark's error path
          }
      }
  }
}
