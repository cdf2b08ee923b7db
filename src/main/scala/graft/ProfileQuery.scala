package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch profiling main: run named SparkEntry queries with per-job
  * and codegen metrics. Deleted once the round-4 triage is done. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cg(): (Long, Long) = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      (METRIC_SOURCE_CODE_SIZE.getCount, METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    }

    args.foreach { name =>
      val (c0, t0ms) = cg()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/pq_out/$name")
      catch { case e: Throwable => println(s"[pq] $name FAILED: ${e.getMessage.take(200)}") }
      val (c1, t1ms) = cg()
      println(f"[pq] $name wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"codegenUnits=${c1 - c0} codegenMs=${t1ms - t0ms}")
    }
    spark.stop()
  }
}
