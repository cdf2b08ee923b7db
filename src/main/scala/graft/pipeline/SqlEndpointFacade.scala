package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The dbt-over-JDBC surface: the reference's dbt profile talks to a
  * Spark Thrift server (`Iceberg-dbt-project/scripts/dbt/
  * bitcoin_analytics/profiles.yml:4-11`, method: thrift — served by
  * `docker-compose.yml:126-146`). This starts the SAME endpoint —
  * Spark's HiveThriftServer2 — inside the engine's JVM, bound to the
  * given port, serving the engine's session state: catalog tables,
  * global views, and the custom kernels GraftExtensions registers as
  * SQL functions (vec_cosine, sorted_jaccard, mg_topk, …). A dbt
  * profile pointed at this host:port runs its models unchanged.
  *
  * The endpoint REQUIRES and runs in singleSession mode
  * (`spark.sql.hive.thriftServer.singleSession=true`, a static conf
  * set at session build time in Sessions.build/TestSpark and enforced
  * by GraftThriftServer.start): every JDBC connection shares the
  * owning session, which is what lets clients see the engine's temp
  * views (and lets the engine see client-built tables — the dbt write
  * path, JdbcWritePathSpec). The caveat is the flip side: client temp
  * views and SET statements are visible across clients and to the
  * engine session itself, so a multi-client Serve deployment shares
  * one mutable session namespace — fine for the reference's
  * single-threaded dbt profile (threads: 1, profiles.yml:10). A
  * multi-tenant deployment starts the endpoint with
  * `multiSession = true` from a session built with
  * `spark.sql.hive.thriftServer.singleSession=false` instead: every
  * JDBC connection then gets its own cloned session (isolated temp
  * views and SET state; global temp views and the engine's kernel
  * functions still shared) — see [[MultiSessionProbe]]. */
object SqlEndpoint {
  type Handle = org.apache.spark.sql.hive.thriftserver.GraftThriftServer.Handle

  def start(s: SparkSession, port: Int, multiSession: Boolean = false): Handle =
    org.apache.spark.sql.hive.thriftserver.GraftThriftServer
      .start(s, port, multiSession)
}
