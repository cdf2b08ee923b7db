package graft

import org.apache.spark.sql.SparkSession

/** Long-running server mode — the reference's deployment shape (a
  * Spark cluster serving a Thrift endpoint that dbt and ad-hoc SQL
  * clients connect to, docker-compose.yml:126-146): build the engine
  * session, register the testdata tables and the graft kernel
  * functions, start the Thrift/JDBC endpoint, and block.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt "runMain graft.Serve [port]"        # default 10000
  *
  * Any Hive-JDBC client (beeline, dbt-spark `method: thrift`) can
  * then run the full query surface: the registered tables, every
  * SQL-expressible operator, and the kernel functions (vec_cosine,
  * sorted_jaccard, mg_topk, …). */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(10000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.pipeline.SqlEndpoint.start(spark, port)
    System.err.println(s"[serve] thrift endpoint on localhost:$port " +
      s"(tables: ${Tables.names.mkString(", ")})")
    Thread.currentThread().join() // serve until killed
  }
}
