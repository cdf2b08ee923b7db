package graft



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
    // shared hardened session (heartbeat/network timeouts included — a
    // long-lived server has strictly more exposure to load-spike
    // context death than the bounded harness runs)
    val spark = Sessions.build(cpus)
    Tables.registerAll(spark, sfDir)
    // SPARK_GRAFT_WAREHOUSE: also expose every lake table as a view
    // wired for SQL time travel (VERSION AS OF / TIMESTAMP AS OF over
    // JDBC — the Iceberg-user surface)
    val lake = sys.env.get("SPARK_GRAFT_WAREHOUSE").toSeq.flatMap { wh =>
      val cat = new graft.pipeline.LakeCatalog(spark, wh)
      val names = cat.tableNames
      names.foreach(n => cat.exposeSql(n))
      names
    }
    graft.pipeline.SqlEndpoint.start(spark, port)
    System.err.println(s"[serve] thrift endpoint on localhost:$port " +
      s"(tables: ${Tables.names.mkString(", ")}" +
      (if (lake.nonEmpty) s"; lake views with time travel: ${lake.mkString(", ")}"
       else "") + ")")
    Thread.currentThread().join() // serve until killed
  }
}
