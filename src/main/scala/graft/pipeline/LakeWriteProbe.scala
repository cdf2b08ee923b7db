package graft.pipeline

/** Forked-JVM warehouse writer for the DataSourceV2 mount spec: builds
  * a small LakeCatalog warehouse (3 day-partitioned append commits +
  * a tag + a CTAS table) in its OWN SparkSession and JVM, so the spec
  * that reads it back through `spark.read.format("graft")` proves the
  * V2 path needs nothing from the writing session — the warehouse is
  * just files + sidecar metadata (the external-session read the
  * round-8 verdict asked for, mirroring the MultiSessionProbe
  * pattern).
  *
  * args(0) = warehouse directory. Prints LAKE_WRITE_OK on success.
  */
object LakeWriteProbe {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    val spark = graft.Sessions.build("4")
    try {
      import spark.implicits._
      val cat = new LakeCatalog(spark, wh)
      cat.createNamespace("probe")
      (1 to 3).foreach { i =>
        val df = Seq(
          (i.toLong, s"row$i",
            java.sql.Timestamp.valueOf(f"2026-01-0$i%d 00:00:00")))
          .toDF("id", "name", "extracted_at")
        cat.append("probe.t", df, partitionTs = Some("extracted_at"))
      }
      cat.tagSnapshot("probe.t", "v2", 2L)
      cat.createOrReplace("probe.mart",
        spark.range(5).selectExpr("id AS n"))
      println("LAKE_WRITE_OK")
    } finally spark.stop()
  }
}
