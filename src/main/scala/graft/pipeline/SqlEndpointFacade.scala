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
  * Each JDBC connection gets a cloned session (Spark's standard
  * multi-session thrift mode): endpoint users create their own temp
  * views while shared state stays shared. */
object SqlEndpoint {
  type Handle = org.apache.spark.sql.hive.thriftserver.GraftThriftServer.Handle

  def start(s: SparkSession, port: Int): Handle =
    org.apache.spark.sql.hive.thriftserver.GraftThriftServer.start(s, port)
}
