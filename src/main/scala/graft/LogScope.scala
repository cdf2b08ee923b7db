package graft

/** Nesting-safe scoped log-level override (shared by the deliberate
  * suppression sites: Caching.sweepPersistentRdds, StreamGateConf,
  * Bench's per-measured-query WindowExec scope).
  *
  * Captures the logger's EFFECTIVE level before the override and
  * restores that exact level after, so a non-default level the session
  * or user configured (e.g. DEBUG on org.apache.spark.rdd while
  * chasing a lineage bug) is never clobbered to a hardcoded constant,
  * and nested scopes unwind correctly — the inner scope restores the
  * outer scope's level, not the library default.
  */
private[graft] object LogScope {
  def withLevel[T](name: String,
                   level: org.apache.logging.log4j.Level)(body: => T): T = {
    val prev = org.apache.logging.log4j.LogManager.getLogger(name).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(name, level)
    try body
    finally org.apache.logging.log4j.core.config.Configurator.setLevel(name, prev)
  }
}
