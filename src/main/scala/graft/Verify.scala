package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-proofing (a round whose Verify dies mid-run must still yield
  * partial correctness rows, not `{}`): oracle_sql.json is written
  * FIRST, each query runs under a watchdog cap (default 120 s,
  * SPARK_GRAFT_VERIFY_CAP_SEC) with job-group cancellation, and
  * progress is logged per query. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — extra names restrict the
    // dump to those queries (local iteration aid; the driver passes 2)
    val sfDir = args(0); val outDir = args(1)
    val wanted = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val capSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CAP_SEC", "120").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // reference ran Spark 3.5 non-ANSI (SURVEY §7.6); also needed for
      // wrapping long arithmetic in minhash rehashing
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Spark 4 per-session artifact isolation routes EVERY Janino
      // class-resolution probe during codegen compilation through an
      // ExecutorClassLoader RPC fetch (even in local mode) and adds
      // per-task isolated-classloader setup: measured 5x wall on the
      // minhash-LSH query (38 codegen units, 15.2s -> 3.0s compile).
      // This engine runs one library in one JVM - no session-isolated
      // artifacts to protect.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => wanted.isEmpty || wanted(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    def runCapped(name: String, body: => Unit): Unit = {
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(s"verify-$name", name,
            interruptOnCancel = true)
          body
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
      }, s"verify-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join(capSec * 1000L)
      if (worker.isAlive) {
        System.err.println(s"[verify] $name exceeded ${capSec}s cap; cancelling")
        spark.sparkContext.cancelJobGroup(s"verify-$name")
        worker.join(30000L)
      }
    }

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.isEmpty || wanted(name) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        runCapped(name,
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name"))
        System.err.println(String.format(java.util.Locale.ROOT,
          "[verify] %s done in %.1f s", name,
          Double.box((System.nanoTime() - t0) / 1e9)))
      }
    // Operators persist shared projections (shingle index, LSH buckets)
    // with caller-owned lifecycle — release them before shutdown.
    spark.catalog.clearCache()
    spark.stop()
  }
}
