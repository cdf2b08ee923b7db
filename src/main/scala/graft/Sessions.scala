package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory for the engine's mains (Verify, Bench,
  * Serve, ScaleSmoke previously carried near-identical copies whose
  * hardening configs drifted apart — Serve shipped without the
  * heartbeat fix and became a zombie under load spikes).
  *
  * The base carries every config the engine requires or this
  * environment has burned us on:
  *  - GraftExtensions (pruning rules + TopKPerGroup strategy + kernel
  *    SQL functions) — gate queries fail without it;
  *  - UTC + non-ANSI (reference semantics, oracle parity) + AQE;
  *  - artifact isolation OFF (Spark 4 per-session isolation routes
  *    every Janino class-resolution probe through an RPC fetch even in
  *    local mode — measured 5x wall on codegen-heavy queries; one
  *    library in one JVM has no isolated artifacts to protect);
  *  - heartbeat 60 s / network timeout 600 s (a machine-load spike
  *    starving the single-JVM heartbeat thread for >10 s must not kill
  *    the context — the round-4 "Cannot call methods on a stopped
  *    SparkContext" failure);
  *  - checkpoint cleaner (iterative ops' reliable checkpoints are
  *    otherwise never reclaimed over a long run);
  *  - explicit 64 MB broadcast threshold (dimension tables stay
  *    broadcast at sf0.1 without relying on stats). */
object Sessions {
  def build(cpus: String, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // static conf, so it must be set at build time: the thrift
      // endpoint (Serve / SqlEndpoint) serves the owning session's
      // registered tables only in singleSession mode — without it each
      // JDBC connection gets an isolated newSession() that cannot see
      // them (TABLE_OR_VIEW_NOT_FOUND for every announced table)
      .config("spark.sql.hive.thriftServer.singleSession", "true")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
