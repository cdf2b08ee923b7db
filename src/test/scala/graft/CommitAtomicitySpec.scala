package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.pipeline.{LakeCatalog, LakeMeta, TableCommit}
import java.nio.file.{Files, Paths}

/** Crash-injection receipts for the journaled table-commit protocol
  * (r13 verdict Next #1): a throw planted at each protocol step must
  * leave the table either FULLY-OLD or FULLY-NEW with MATCHING
  * sidecars after recovery — never missing, never a data/metadata
  * mix. Covers the facade CTAS swap and the V2 staged CoR, plus the
  * replace-history semantics (snapshot log + tags survive a replace).
  */
class CommitAtomicitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (LakeCatalog, String) = {
    val wh = TestSpark.tempDir("graft-atomic")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("raw")
    cat.createOrReplace("raw.t",
      Seq((1L, "old"), (2L, "old")).toDF("id", "gen"))
    (cat, wh)
  }

  /** The visible generation must be self-consistent: readable data,
    * sidecar schema matching the read columns, snapshot log parseable.
    * Returns the distinct `gen` values actually served. */
  private def generation(cat: LakeCatalog, wh: String): Set[String] = {
    val df = cat.table("raw.t")
    val sidecarCols = LakeMeta.savedSchema(wh, "raw.t").get.fieldNames.toSet
    assert(df.columns.toSet.subsetOf(sidecarCols),
      s"read columns ${df.columns.toSeq} not covered by sidecar $sidecarCols")
    assert(cat.snapshots("raw.t").count() >= 1L, "snapshot log unreadable")
    df.select("gen").distinct().as[String].collect().toSet
  }

  private def crashAt(point: String)(body: => Unit): Unit = {
    TableCommit.crashHook = p =>
      if (p == point) throw new RuntimeException(s"injected crash at $p")
    try {
      val e = intercept[RuntimeException](body)
      assert(e.getMessage.contains("injected crash") ||
        Option(e.getCause).exists(_.getMessage.contains("injected crash")))
    } finally TableCommit.crashHook = _ => ()
  }

  test("facade CTAS crash BEFORE the journal write: fully-old") {
    val (cat, wh) = freshTable()
    crashAt("pre-journal") {
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    }
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
    assert(generation(cat, wh) === Set("old"))
    assert(cat.table("raw.t").count() === 2L)
  }

  test("facade CTAS crash AFTER the journal write, before any move: " +
      "recovery rolls FORWARD to fully-new") {
    val (cat, wh) = freshTable()
    crashAt("post-journal") {
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    }
    // the journal is the commit point — the next access recovers
    assert(Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
    assert(generation(cat, wh) === Set("new"))
    assert(cat.table("raw.t").count() === 1L)
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
  }

  test("facade CTAS crash BETWEEN the two renames (live moved aside): " +
      "recovery completes the swap — never a missing table") {
    val (cat, wh) = freshTable()
    crashAt("post-aside") {
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    }
    // mid-crash state: live dir gone, but the FIRST read recovers
    assert(generation(cat, wh) === Set("new"))
    // aside + journal residue purged
    val ns = Paths.get(wh, "raw")
    val st = Files.list(ns)
    val leftovers =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".__old_")).toList
      } finally st.close()
    assert(leftovers.isEmpty, s"aside residue: $leftovers")
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
  }

  test("facade CTAS crash AFTER the swap (residue cleanup pending): " +
      "recovery purges residue, table fully-new") {
    val (cat, wh) = freshTable()
    crashAt("post-swap") {
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    }
    assert(generation(cat, wh) === Set("new"))
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
  }

  test("V2 staged CREATE OR REPLACE crash mid-swap: invariant holds " +
      "(fully-old or fully-new, matching sidecars) via catalog recovery") {
    val (cat, wh) = freshTable()
    val catName = "graft_atomic_" + java.lang.Integer.toHexString(wh.hashCode)
    spark.conf.set(s"spark.sql.catalog.$catName", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh)
    TableCommit.crashHook = p =>
      if (p == "post-aside") throw new RuntimeException("injected crash at " + p)
    try {
      intercept[Exception] {
        spark.sql(s"CREATE OR REPLACE TABLE $catName.raw.t AS " +
          "SELECT id * 10 AS id, 'new' AS gen FROM VALUES (1L), (2L) v(id)")
      }
    } finally TableCommit.crashHook = _ => ()
    // next catalog access triggers recoverIfPending: one complete
    // generation, sidecars matching (Spark's exec may have aborted the
    // staging table, making roll-back legitimate — the INVARIANT is
    // what's asserted, as in the thriftmulti race receipt)
    val served = spark.table(s"$catName.raw.t")
    val gens = served.select("gen").distinct().as[String].collect().toSet
    assert(gens === Set("old") || gens === Set("new"), s"torn table: $gens")
    val n = served.count()
    assert((gens == Set("old") && n == 2L) || (gens == Set("new") && n == 2L),
      s"generation/count mismatch: $gens with $n rows")
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
  }

  test("a catalog-routed reader arriving mid-swap BLOCKS on the commit " +
      "lock and serves the complete new generation — no missing-table " +
      "window for facade reads") {
    val (cat, wh) = freshTable()
    val windowOpen = new java.util.concurrent.CountDownLatch(1)
    // hold the swap open mid-window (live moved aside, staged pending)
    TableCommit.crashHook = p =>
      if (p == "post-aside") { windowOpen.countDown(); Thread.sleep(1200) }
    val writer = new Thread(() =>
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen")))
    var readerResult: Either[Throwable, (Long, Set[String])] = null
    val reader = new Thread(() => {
      readerResult =
        try {
          windowOpen.await() // the journal exists from here on
          val df = cat.table("raw.t") // recoverIfPending blocks on the lock
          Right((df.count(),
            df.select("gen").distinct().as[String].collect().toSet))
        } catch { case t: Throwable => Left(t) }
    })
    try {
      writer.start(); reader.start()
      writer.join(30000); reader.join(30000)
    } finally TableCommit.crashHook = _ => ()
    assert(readerResult != null && readerResult.isRight,
      s"mid-swap read failed: $readerResult")
    val (n, gens) = readerResult.toOption.get
    assert(n === 1L && gens === Set("new"),
      s"mid-swap read saw a torn/old state: n=$n gens=$gens")
  }

  test("recoverAll sweeps a pending journal at catalog init — a table " +
      "nobody reads again still resolves") {
    val (cat, wh) = freshTable()
    crashAt("post-aside") {
      cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    }
    assert(Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
    // no read of raw.t — the sweep alone must resolve it
    TableCommit.recoverAll(wh)
    assert(!Files.exists(Paths.get(wh, "_commits", "raw__t.json")))
    assert(generation(cat, wh) === Set("new"))
  }

  test("replace preserves table history: snapshot log accumulates and " +
      "tags survive across CTAS generations") {
    val (cat, wh) = freshTable()
    cat.tagSnapshot("raw.t", "v1", 1L)
    cat.createOrReplace("raw.t", Seq((9L, "new")).toDF("id", "gen"))
    val ops = cat.snapshots("raw.t").orderBy(col("snapshot_id"))
      .select("operation").as[String].collect().toSeq
    assert(ops === Seq("replace", "replace"), s"history lost: $ops")
    assert(cat.tags("raw.t") === Map("v1" -> 1L))
  }

  test("sidecars are invisible to scans and listings; clone copies " +
      "(not hard-links) the snapshot log") {
    val (cat, wh) = freshTable()
    assert(Files.exists(LakeMeta.snapshotLogPath(wh, "raw.t")))
    // raw path scan must not trip over _graft_meta
    val direct = spark.read.parquet(LakeMeta.tablePath(wh, "raw.t"))
    assert(direct.count() === 2L)
    assert(cat.tableNames === Seq("raw.t"))
    cat.cloneTable("raw.t", "raw.t2")
    // appending to the clone's log must NOT leak into the source's
    cat.createOrReplace("raw.t2", Seq((5L, "clone")).toDF("id", "gen"))
    assert(cat.snapshots("raw.t").count() === 1L)
    assert(cat.snapshots("raw.t2").count() === 2L)
  }
}
