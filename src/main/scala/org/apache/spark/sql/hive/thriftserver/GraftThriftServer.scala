package org.apache.spark.sql.hive.thriftserver

/** Package-located accessor for the (package-private) HiveThriftServer2
  * — the same pattern as `org.apache.spark.sql.GraftSql` for catalyst
  * internals. Lives here ONLY to re-export start/stop with public
  * types; all engine-facing API is `graft.pipeline.SqlEndpoint`. */
object GraftThriftServer {
  final class Handle private[thriftserver] (server: HiveThriftServer2,
      session: org.apache.spark.sql.classic.SparkSession,
      jvmDefaultTz: java.util.TimeZone,
      confBefore: Map[String, String]) {
    /** Stops the server AND undoes its shared-session side effects.
      * In singleSession mode the server operates directly on the
      * owning session, and its startup/operation mutates session confs
      * — observed: `spark.sql.datetime.java8API.enabled` flips to
      * true, so a later `collect()` returns java.time.LocalDate where
      * the engine's callers expect java.sql.Date (cross-suite test
      * poisoning). Restore every runtime conf the server changed, and
      * the JVM default timezone (Hive session state can call
      * TimeZone.setDefault). */
    def stop(): Unit = {
      try server.stop()
      finally {
        java.util.TimeZone.setDefault(jvmDefaultTz)
        val after = session.conf.getAll
        for ((k, v) <- confBefore if after.get(k) != Some(v))
          try session.conf.set(k, v) catch { case _: Throwable => () }
        for (k <- after.keySet if !confBefore.contains(k))
          try session.conf.unset(k) catch { case _: Throwable => () }
      }
    }
  }

  def start(s: org.apache.spark.sql.SparkSession, port: Int): Handle = {
    val classic = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    classic.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    // A RESTARTED endpoint (second start in one JVM) reads the port
    // from the JVM-cached Hive execution-client conf, NOT the
    // sqlContext conf above — observed: a second start on a new port
    // silently re-binds the FIRST port. The post-start probe below
    // turns that silent wrong-port serve into a fail-fast error.
    // singleSession (serve the OWNING session, so its registered temp
    // views are visible over JDBC) is a STATIC conf — it must be set on
    // the session builder (Sessions.build and TestSpark do). Fail fast
    // here instead of letting every table query die with
    // TABLE_OR_VIEW_NOT_FOUND at the client.
    require(classic.conf.get("spark.sql.hive.thriftServer.singleSession", "false") == "true",
      "start the session with spark.sql.hive.thriftServer.singleSession=true " +
        "(static conf) so the endpoint serves the owning session's tables")
    val tz = java.util.TimeZone.getDefault
    val confBefore = classic.conf.getAll
    val server = HiveThriftServer2.startWithContext(classic.sqlContext)
    val handle = new Handle(server, classic, tz, confBefore)
    // Verify the server answers on the REQUESTED port. Hive's
    // execution-client conf is constructed once per JVM, so a restart
    // on a different port serves the original one — fail fast with the
    // actual constraint instead of letting clients time out against a
    // port nothing listens on.
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try { new java.net.Socket("localhost", port).close(); up = true }
      catch { case _: Exception => Thread.sleep(250) }
    }
    if (!up) {
      // The server IS still coming up — just on the JVM-cached (first
      // configured) port, not the requested one. Stopping it mid-startup
      // is fatal to the whole JVM: Hive's ThriftCLIService.run() holds
      // the server in a field that stop() nulls, and if the race lands
      // between construction and serve() the NPE is caught by run()'s
      // catch-all, which calls System.exit(-1) (observed killing an
      // entire test fork). Wait for the port the service ACTUALLY bound
      // to accept connections — serve() is then running and stop() is
      // an ordinary clean shutdown.
      import scala.jdk.CollectionConverters._
      val boundPort = server.getServices.asScala.collectFirst {
        case t: org.apache.hive.service.cli.thrift.ThriftCLIService => t.getPortNumber
      }.getOrElse(0)
      var served = false
      if (boundPort > 0) {
        val settle = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (!served && System.nanoTime() < settle) {
          try { new java.net.Socket("localhost", boundPort).close(); served = true }
          catch { case _: Exception => Thread.sleep(250) }
        }
      }
      if (served && boundPort == port) {
        // Slow start, right port: the server just needed more than the
        // first probe window — it is up and correct; fall through to
        // the normal return below.
      } else {
        // Stop ONLY a fully-started server (served on its bound port).
        // If it never served — boundPort unknown or 30 s of silence —
        // stopping now is the System.exit race itself; leak the
        // half-started service and fail loudly instead (the error names
        // the per-JVM port constraint, which is the only recovery).
        if (served) { try handle.stop() catch { case _: Throwable => () } }
        throw new IllegalStateException(
          s"thrift endpoint did not come up on requested port $port" +
          (if (boundPort > 0 && boundPort != port) s" (it bound JVM-cached port $boundPort)"
           else "") +
          ". The Hive execution-client conf is cached per JVM, so an endpoint " +
          "restarted in the same JVM serves the FIRST configured port — reuse " +
          "that port (or a fresh JVM) instead.")
      }
    }
    handle
  }
}
