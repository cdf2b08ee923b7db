package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch profiling main for the q_dedup_minhash regression — prints
  * per-job wall times for two consecutive runs. Deleted once resolved. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?").take(80)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        println(f"[stage] ${si.stageId}%3d tasks=${si.numTasks}%4d wall=$wall%7.2f s " +
          f"run=${si.taskMetrics.executorRunTime / 1e3}%7.2f s " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%7.2f s " +
          f"deser=${si.taskMetrics.executorDeserializeTime / 1e3}%6.2f s " +
          f"gc=${si.taskMetrics.jvmGCTime / 1e3}%5.2f s  ${si.name.take(60)}")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def cg(label: String): Unit = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      println(s"[codegen] $label: compiles=${METRIC_SOURCE_CODE_SIZE.getCount} " +
        s"compileTimeMs=${METRIC_COMPILATION_TIME.getSnapshot.getValues.sum}")
    }
    val full = graft.operators.Dedup.minhashPairs(spark, sfDir)
    time("full minhashPairs run1")(full.write.format("noop").mode("overwrite").save())
    cg("after run1")
    spark.catalog.clearCache()
    val full2 = graft.operators.Dedup.minhashPairs(spark, sfDir)
    time("full minhashPairs run2")(full2.write.format("noop").mode("overwrite").save())
    cg("after run2")
    spark.stop()
  }
}
