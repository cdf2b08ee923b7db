package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.logging.log4j.{Level => L}

/** Targeted regression specs for the round-11 ADVICE fixes that until
  * now only had code-level receipts (r11 verdict Next #6). Each test
  * exercises the FAILURE MODE the fix removed, not just the happy
  * path. (The fifth ADVICE fix — GraftCatalog's all-digit tag
  * fallthrough — already has its regression test in the catalog
  * suite.) */
class AdviceRegressionSpec extends AnyFunSuite {

  private def level(name: String): org.apache.logging.log4j.Level =
    org.apache.logging.log4j.LogManager.getLogger(name).getLevel

  test("LogScope restores the PRIOR effective level, not a hardcoded default") {
    val name = "graft.test.logscope.prior"
    // simulate a user-configured non-default level (the clobbering
    // failure mode: a fixed WARN restore would erase this DEBUG)
    org.apache.logging.log4j.core.config.Configurator.setLevel(name, L.DEBUG)
    try {
      LogScope.withLevel(name, L.ERROR) {
        assert(level(name) === L.ERROR)
      }
      assert(level(name) === L.DEBUG)
    } finally org.apache.logging.log4j.core.config.Configurator
      .setLevel(name, null: org.apache.logging.log4j.Level)
  }

  test("LogScope nests (inner restores outer's override) and survives throws") {
    val name = "graft.test.logscope.nest"
    org.apache.logging.log4j.core.config.Configurator.setLevel(name, L.INFO)
    try {
      LogScope.withLevel(name, L.ERROR) {
        LogScope.withLevel(name, L.WARN) {
          assert(level(name) === L.WARN)
        }
        // the inner scope must unwind to ERROR (the outer override),
        // not jump straight back to INFO
        assert(level(name) === L.ERROR)
      }
      assert(level(name) === L.INFO)
      // the restore must run on the exception path too
      intercept[RuntimeException] {
        LogScope.withLevel(name, L.ERROR) { throw new RuntimeException("boom") }
      }
      assert(level(name) === L.INFO)
    } finally org.apache.logging.log4j.core.config.Configurator
      .setLevel(name, null: org.apache.logging.log4j.Level)
  }

  test("sweepPersistentRdds leaves the rdd logger's configured level untouched") {
    val rddLogger = "org.apache.spark.rdd"
    val before = level(rddLogger)
    import org.apache.spark.sql.functions._
    val df = TestSpark.spark.range(100).withColumn("x", col("id") * 2)
    df.persist().count()
    Caching.sweepPersistentRdds(TestSpark.spark)
    assert(level(rddLogger) === before)
    assert(TestSpark.spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("bhFdr: crit is consistent with the frame's OWN row count (m drift)") {
    // the r11 ADVICE fix persisted the z-battery before the m-count;
    // the failure mode is m diverging from the ranked frame it divides
    val rows = graft.operators.Stats.bhFdr(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val m = rows.length.toDouble
    def q4(v: Double) = math.floor(v * 10000 + 0.5 + 0.000001) / 10000
    rows.foreach { r =>
      assert(r.getAs[Double]("bh_crit") ===
        q4(r.getAs[Int]("rank") / m * 0.1))
    }
    // ranks are a permutation of 1..m and rejection is a prefix
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    val rejectedRanks = rows.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[Int]("rank"))
    if (rejectedRanks.nonEmpty)
      assert(rejectedRanks.sorted.toSeq === (1 to rejectedRanks.max))
  }

  test("fixtureTag embeds this JVM's pid and is input-sensitive") {
    val src = new java.io.File(s"${TestSpark.sfDir}/lineitem.parquet")
    val tag = SparkEntry.fixtureTag(TestSpark.sfDir, src)
    // pid suffix => two concurrent JVMs get disjoint fixture paths by
    // construction (the bench-vs-verify race the fix removed)
    assert(tag.contains("_p" + ProcessHandle.current().pid() + "_fix"))
    // stable within a JVM, different across input dirs
    assert(tag === SparkEntry.fixtureTag(TestSpark.sfDir, src))
    assert(tag !== SparkEntry.fixtureTag("/some/other/dir", src))
  }

  test("Graph projection cache is bounded across sessions (r14 ADVICE: " +
      "per-connection Thrift clones must not pin dead sessions forever)") {
    // churn more cloned sessions through the cache than its bound;
    // eviction unpersists the eldest's frames so dead session graphs
    // become collectible, and the map can never exceed the cap
    (1 to 12).foreach { _ =>
      val clone = TestSpark.spark.newSession()
      graft.operators.Graph.tradePairs(clone, TestSpark.sfDir).count()
    }
    assert(graft.operators.Graph.cachedSessionCount <= 8,
      s"cache grew past its bound: ${graft.operators.Graph.cachedSessionCount}")
    // the primary session still works after evictions (re-arm path)
    assert(graft.operators.Graph
      .tradePairs(TestSpark.spark, TestSpark.sfDir).count() > 0L)
  }
}
