package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Crash-atomic table-directory commit protocol, shared by the facade
  * CTAS ([[LakeCatalog.createOrReplace]]) and the V2 staged CTAS/RTAS
  * ([[graft.sources.GraftCatalog]]'s StagingTableCatalog commit) — ONE
  * implementation of the swap so the two write surfaces can never
  * drift (the same sharing discipline as [[LakeMeta]] on the read
  * side).
  *
  * Design (the Iceberg commit shape, emulated at directory grain):
  * sidecars live INSIDE the table directory (LakeMeta.metaDir), so a
  * fully-written staged directory is a complete self-describing table
  * generation. The swap is journaled write-ahead:
  *
  *   1. write `<warehouse>/_commits/<ns>__<table>.json` naming the
  *      staged and aside directories (tmp file + ATOMIC_MOVE rename —
  *      the journal either exists complete or not at all). THIS IS
  *      THE COMMIT POINT.
  *   2. move live → aside (skipped when the table doesn't exist yet)
  *   3. move staged → live
  *   4. delete aside, delete journal
  *
  * A crash at any point recovers by ROLLING FORWARD from the journal
  * (idempotent [[recover]]): if the journal exists the commit is
  * honored — staged becomes live — and the aside/journal residue is
  * purged; if the crash predates the journal write, nothing committed
  * and the staged directory is invisible residue (dot/underscore
  * prefixed, skipped by listings and scans). Either way every reader
  * observes a table whose data and sidecars are from ONE generation —
  * fully-old or fully-new, never a mix and never half-moved metadata.
  * Recovery runs lazily: at the head of every locked commit, and from
  * the table-existence checks both catalogs route through (one
  * `Files.exists` on the journal path when nothing is pending).
  *
  * Reader visibility: a CATALOG-ROUTED reader (LakeCatalog.table /
  * GraftCatalog.loadTable — both call recoverIfPending) that arrives
  * while the journal exists BLOCKS on the commit lock and then serves
  * the complete new generation, so for those paths there is no
  * missing-table window (receipt: CommitAtomicitySpec's mid-swap
  * reader test). What remains is (a) the check-then-read race — a
  * reader that passed the journal check just before the journal was
  * written can still list the directory mid-rename — and (b) RAW
  * path reads (spark.read.parquet of the table dir) that bypass the
  * catalog entirely; both see a window two renames wide. Eliminating
  * those needs pointer indirection the directory-per-table layout
  * can't express; writer-vs-writer tearing and crash loss — the
  * failure modes with durable consequences — are what this protocol
  * closes.
  *
  * 100 TB posture: the critical section is metadata-grain (one journal
  * file + two directory renames, never a data copy), exactly like an
  * Iceberg metadata CAS; data volume never enters the lock.
  */
private[graft] object TableCommit {

  /** Test-only crash injection: invoked with a point label at each
    * protocol step; a test hook throws to simulate a crash mid-commit.
    * Points: pre-journal, post-journal, post-aside, post-swap. */
  @volatile private[graft] var crashHook: String => Unit = _ => ()

  private val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // warehouses whose file lock THIS thread already holds — re-entrant
  // commits (e.g. recovery inside a locked commit) must not re-acquire
  // the FileChannel lock (OverlappingFileLockException)
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Per-warehouse commit critical section: a JVM monitor (concurrent
    * Thrift sessions share one process) nested around a cross-process
    * file lock (`.graft_commit.lock` at the warehouse root) so
    * multi-JVM writers against one warehouse serialize too. Reentrant
    * per thread. */
  def withCommitLock[T](warehouse: String)(body: => T): T = {
    val key = Paths.get(warehouse).toAbsolutePath.normalize.toString
    if (held.get()(key)) return body
    val mon = commitMonitors.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(warehouse, ".graft_commit.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        held.set(held.get() + key)
        try body
        finally {
          held.set(held.get() - key)
          l.release()
        }
      } finally ch.close()
    }
  }

  private def journalPath(warehouse: String, ns: String,
      table: String): Path =
    Paths.get(warehouse, "_commits", s"${ns}__$table.json")

  private def liveDir(warehouse: String, ns: String, table: String): Path =
    Paths.get(warehouse, ns, table)

  /** Swap `stagedDir` (a fully-written sibling inside the namespace
    * dir, dot/underscore prefixed) into place as `<ns>/<table>`.
    * MUST be called under [[withCommitLock]]. Handles both the
    * replace case (live exists — journaled aside-swap) and the create
    * case (no live dir — one atomic rename, no journal needed). */
  def swapDirs(warehouse: String, ns: String, table: String,
      stagedDir: Path): Unit = {
    recoverLocked(warehouse, ns, table) // resolve any rival's residue
    val live = liveDir(warehouse, ns, table)
    if (!Files.exists(live)) {
      crashHook("pre-journal")
      Files.move(stagedDir, live) // one rename: atomic by itself
      crashHook("post-swap")
      return
    }
    val aside = live.resolveSibling(
      ".__old_" + java.util.UUID.randomUUID().toString.replace("-", "") +
        "_" + table)
    val journal = journalPath(warehouse, ns, table)
    crashHook("pre-journal")
    writeAtomically(journal,
      s"""{"ns":${q(ns)},"table":${q(table)},""" +
        s""""staged":${q(stagedDir.getFileName.toString)},""" +
        s""""aside":${q(aside.getFileName.toString)}}""")
    crashHook("post-journal")
    Files.move(live, aside)
    crashHook("post-aside")
    Files.move(stagedDir, live)
    crashHook("post-swap")
    deleteRecursive(aside)
    Files.deleteIfExists(journal)
  }

  /** Cheap pending-commit check for read paths: one `Files.exists` on
    * the journal; only when a crash left a journal behind does this
    * take the lock and roll the commit forward. */
  def recoverIfPending(warehouse: String, ns: String, table: String): Unit =
    if (Files.exists(journalPath(warehouse, ns, table)))
      withCommitLock(warehouse) { recoverLocked(warehouse, ns, table) }

  /** Warehouse-wide sweep: roll forward EVERY pending journal — run at
    * catalog initialization so a crashed commit on a table nobody
    * reads again still resolves (per-table lazy recovery only fires on
    * that table's next access). One directory listing when `_commits`
    * is absent/empty — free on the no-crash path. */
  def recoverAll(warehouse: String): Unit = {
    val dir = Paths.get(warehouse, "_commits")
    if (!Files.isDirectory(dir)) return
    val pending = {
      val st = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".json")).toList
      } finally st.close()
    }
    if (pending.isEmpty) return
    withCommitLock(warehouse) {
      pending.foreach { f =>
        // ns/table come from the journal CONTENT (the filename's
        // `ns__table` join is ambiguous when a name contains "__")
        val p = dir.resolve(f)
        if (Files.exists(p)) {
          val txt = new String(Files.readAllBytes(p), "UTF-8")
          val re = """"(ns|table)":"([^"]+)"""".r
          val fields = re.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2)).toMap
          for (ns <- fields.get("ns"); t <- fields.get("table"))
            recoverLocked(warehouse, ns, t)
        }
      }
    }
  }

  /** Idempotent roll-forward from the journal; caller holds the lock.
    * The journal write is the commit point, so recovery always drives
    * toward staged-becomes-live; the defensive aside-restore covers a
    * journal whose staged dir vanished (manual cleanup) so the table
    * is never left missing. */
  private def recoverLocked(warehouse: String, ns: String,
      table: String): Unit = {
    val journal = journalPath(warehouse, ns, table)
    if (!Files.exists(journal)) return
    val txt = new String(Files.readAllBytes(journal), "UTF-8")
    def field(k: String): String =
      ("\"" + k + "\":\"([^\"]+)\"").r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(
          throw new IllegalStateException(
            s"corrupt commit journal $journal: $txt"))
    val live = liveDir(warehouse, ns, table)
    val staged = live.resolveSibling(field("staged"))
    val aside = live.resolveSibling(field("aside"))
    if (Files.exists(staged)) {
      // crash before/between the moves: finish them
      if (Files.exists(live) && !Files.exists(aside)) Files.move(live, aside)
      if (!Files.exists(live)) Files.move(staged, live)
    } else if (!Files.exists(live) && Files.exists(aside)) {
      Files.move(aside, live) // defensive: staged lost — restore old
    }
    deleteRecursive(aside)
    Files.deleteIfExists(journal)
  }

  private def writeAtomically(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(p)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally st.close()
    }
}
