package org.apache.spark.sql.hive.thriftserver

/** Package-located accessor for the (package-private) HiveThriftServer2
  * — the same pattern as `org.apache.spark.sql.GraftSql` for catalyst
  * internals. Lives here ONLY to re-export start/stop with public
  * types; all engine-facing API is `graft.pipeline.SqlEndpoint`. */
object GraftThriftServer {
  final class Handle private[thriftserver] (server: HiveThriftServer2) {
    def stop(): Unit = server.stop()
  }

  def start(s: org.apache.spark.sql.SparkSession, port: Int): Handle = {
    val classic = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    classic.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    new Handle(HiveThriftServer2.startWithContext(classic.sqlContext))
  }
}
