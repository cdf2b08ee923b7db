package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for the connected-components query. */
object ProfileCC {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { i =>
      time(s"minhashPairs count #$i") {
        println(s"  n = ${graft.operators.Dedup.minhashPairs(spark, sfDir).count()}")
      }
    }
    (1 to 2).foreach { i =>
      time(s"nearDupClusters #$i") {
        graft.operators.Dedup.nearDupClusters(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
