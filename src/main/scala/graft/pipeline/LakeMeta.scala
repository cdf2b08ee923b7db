package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.types.{DataType, StructType}

/** Warehouse-metadata READ helpers shared by [[LakeCatalog]] (the
  * in-process facade) and [[graft.sources.GraftLakeSource]] (the
  * DataSourceV2 path mount): one implementation of the sidecar /
  * snapshot-log / tags layout so the two read paths can never drift.
  *
  * All functions are driver-side metadata reads keyed by
  * (warehouseDir, namespace.table) — the same signature shape Iceberg's
  * metadata layer has (catalog location + table identifier). Writes
  * stay in LakeCatalog: the V2 source is read-only by design (the
  * reference's writers all run through the pipeline facade).
  */
private[graft] object LakeMeta {

  /** Physical commit partition column (append tables only). */
  val CommitCol = "commit"

  /** Generation-pointer layout constants (see [[TableCommit]]): a
    * table directory is a CONTAINER holding dot-prefixed generation
    * dirs, a tiny pointer file naming the current one, and retirement
    * markers for grace-retained old generations. The dot prefix keeps
    * generations invisible to any raw parquet scan of the container —
    * a bypassing reader fails loudly instead of seeing a torn mix of
    * generations. */
  val PointerName = "_gen_pointer"
  val GenPrefix = ".gen-"
  val RetiredPrefix = ".gen_retired_"
  val SnapshotLogName = "snapshots.jsonl"
  val TagsName = "tags.json"

  /** The table CONTAINER directory `<warehouse>/<ns>/<table>`. Holds
    * the pointer + generations; never read raw — data lives under
    * [[dataPath]]. */
  def tablePath(warehouseDir: String, name: String): String = {
    val parts = name.split('.')
    require(parts.length == 2, s"expected namespace.table, got $name")
    s"$warehouseDir/${parts(0)}/${parts(1)}"
  }

  /** The current generation's DATA directory: container + the
    * generation the pointer names. One small-file read; a reader that
    * captures this path is snapshot-isolated for the retention grace
    * (the generation dir is immutable-except-appends once current and
    * survives [[TableCommit.retireGraceMs]] past its retirement).
    * Falls back to the container itself for a pre-generation legacy
    * layout (no pointer file). */
  def dataPath(warehouseDir: String, name: String): String = {
    val c = tablePath(warehouseDir, name)
    val p = Paths.get(c, PointerName)
    if (!Files.exists(p)) c
    else s"$c/${new String(Files.readAllBytes(p), "UTF-8").trim}"
  }

  /** Metadata sidecars are COLLOCATED inside the generation directory
    * (`<table>/<gen>/_graft_meta/…`) so a generation is one complete
    * self-describing table state: data, schema, snapshot log and tags
    * commit together under a single pointer swap — there is no crash
    * window where a table's data and sidecars can disagree. The `_`
    * prefix keeps the subtree invisible to parquet scans of the data
    * dir. */
  val MetaDirName = "_graft_meta"

  def metaDir(warehouseDir: String, name: String): Path =
    Paths.get(dataPath(warehouseDir, name), MetaDirName)

  def snapshotLogPath(warehouseDir: String, name: String): Path =
    metaDir(warehouseDir, name).resolve(SnapshotLogName)

  def schemaPath(warehouseDir: String, name: String): Path =
    metaDir(warehouseDir, name).resolve("schema.json")

  def tagsPath(warehouseDir: String, name: String): Path =
    metaDir(warehouseDir, name).resolve(TagsName)

  /** The table's full READ schema (data columns then hidden partition
    * columns) recorded at write time — see LakeCatalog.saveSchema. */
  def savedSchema(warehouseDir: String, name: String): Option[StructType] = {
    val p = schemaPath(warehouseDir, name)
    if (!Files.exists(p)) None
    else Some(DataType.fromJson(
      new String(Files.readAllBytes(p), "UTF-8")).asInstanceOf[StructType])
  }

  def readTags(warehouseDir: String, name: String): Map[String, Long] = {
    val p = tagsPath(warehouseDir, name)
    if (!Files.exists(p)) Map.empty
    else {
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      """"([^"]+)":(\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }
  }

  /** The source timestamp column of the table's hidden day
    * partitioning (None for unpartitioned / CTAS tables): recovered
    * from the sidecar's `graft_days_<ts>` physical column — the
    * derivation contract shared by the facade's upsert, the V1 write
    * seam and the catalog's partitioning report. */
  def partitionTsOf(warehouseDir: String, name: String): Option[String] =
    savedSchema(warehouseDir, name).toSeq.flatMap(_.fieldNames)
      .find(_.startsWith(graft.plans.HiddenPartitionPruning.Prefix))
      .map(_.stripPrefix(graft.plans.HiddenPartitionPruning.Prefix))

  /** True iff a snapshot-log line carries `"batch_id":batchId` — the
    * idempotence check behind [[LakeCatalog.appendExactlyOnce]] (a
    * replayed foreachBatch epoch is a no-op). Pure metadata-file pass
    * over the KB-scale log. */
  def batchApplied(warehouseDir: String, name: String,
      batchId: Long): Boolean = {
    val p = snapshotLogPath(warehouseDir, name)
    Files.exists(p) && {
      val re = (""""batch_id":""" + batchId + """[,}\s]""").r
      val lines = Files.lines(p)
      try {
        import scala.jdk.CollectionConverters._
        lines.iterator().asScala.exists(l => re.findFirstIn(l).isDefined)
      } finally lines.close()
    }
  }

  /** True iff `id` appears in the table's snapshot log — the
    * existence check behind VERSION-AS-OF resolution (a digit string
    * is only a snapshot id if the snapshot is real; otherwise it can
    * still be a tag name). Pure metadata-file pass. */
  def snapshotExists(warehouseDir: String, name: String, id: Long): Boolean = {
    val p = snapshotLogPath(warehouseDir, name)
    Files.exists(p) && {
      val idRe = (""""snapshot_id":""" + id + """[,}\s]""").r
      val lines = Files.lines(p)
      try {
        import scala.jdk.CollectionConverters._
        lines.iterator().asScala.exists(l => idRe.findFirstIn(l).isDefined)
      } finally lines.close()
    }
  }

  /** Latest snapshot id committed at or before `inst` — the
    * as-of-timestamp resolution, as a pure metadata-file pass (no
    * Spark job; the facade's `snapshotIdAt` reads through its
    * snapshots DataFrame, this serves the V2 source where no session
    * frame exists yet). */
  def snapshotIdAt(warehouseDir: String, name: String,
      inst: java.time.Instant): Long = {
    val p = snapshotLogPath(warehouseDir, name)
    require(Files.exists(p), s"$name has no snapshot log")
    val tsRe = """"committed_at":"([^"]+)"""".r
    val idRe = """"snapshot_id":(\d+)""".r
    val lines = Files.lines(p)
    val best =
      try {
        import scala.jdk.CollectionConverters._
        lines.iterator().asScala.flatMap { l =>
          for {
            t <- tsRe.findFirstMatchIn(l).map(_.group(1))
            id <- idRe.findFirstMatchIn(l).map(_.group(1).toLong)
            if !java.time.Instant.parse(t).isAfter(inst)
          } yield id
        }.foldLeft(-1L)(math.max)
      } finally lines.close()
    require(best >= 1L,
      s"$name has no snapshot committed at or before $inst")
    best
  }

  /** Oldest snapshot still time-travelable: physical rewrites fence at
    * their OWN snapshot (earlier files are gone); expire entries carry
    * an explicit fence value. */
  def rewriteFloor(warehouseDir: String, name: String): Long = {
    val p = snapshotLogPath(warehouseDir, name)
    if (!Files.exists(p)) return 0L
    val idRe = """"snapshot_id":(\d+)""".r
    val fenceRe = """"fence":(\d+)""".r
    val lines = Files.lines(p)
    try {
      import scala.jdk.CollectionConverters._
      lines.iterator().asScala.flatMap { l =>
        if (l.contains("\"operation\":\"rewrite\""))
          idRe.findFirstMatchIn(l).map(_.group(1).toLong)
        else if (l.contains("\"operation\":\"expire\""))
          fenceRe.findFirstMatchIn(l).map(_.group(1).toLong)
        else None
      }.foldLeft(0L)(math.max)
    } finally lines.close()
  }
}
