package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-up validation: replicate the sf0.1 documents/embeddings tables
  * `factor`× (ids shifted so every copy is distinct) into a temp dir,
  * then run the heavy dedup/similarity operators end-to-end and report
  * rows + seconds per operator.
  *
  * The point is catching super-linear blowups before a real cluster
  * does: replication multiplies every duplicate cluster's size by
  * `factor`, so LSH buckets grow `factor`×, candidate pairs grow
  * `factor²`× within clusters, and the connected-components edge list
  * grows accordingly — exactly the stress that breaks naive all-pairs
  * or in-memory-bucket designs. A healthy run shows per-operator time
  * growing ~linearly with candidate volume (not corpus²).
  *
  *   SPARK_GRAFT_SCALE_FACTOR=10 sbt "runMain graft.ScaleSmoke"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = Sessions.build("32")

    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    def replicate(table: String, idCol: String, idStride: Long): Unit = {
      val base = spark.read.parquet(s"$baseDir/$table.parquet")
      val copies = (0 until factor).map { k =>
        base.withColumn(idCol, col(idCol) + lit(k * idStride))
      }.reduce(_ unionByName _)
      copies.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    replicate("documents", "doc_id", 10000000L)
    replicate("embeddings", "vec_id", 10000000L)
    println(s"[scale] corpus ${factor}x at $dir: " +
      s"${Tables.documents(spark, dir).count()} docs, " +
      s"${Tables.embeddings(spark, dir).count()} vectors")

    def run(label: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[scale] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    run("exactGroups")(operators.Dedup.exactGroups(spark, dir))
    run("minhashPairs")(operators.Dedup.minhashPairs(spark, dir))
    run("nearDupClusters")(operators.Dedup.nearDupClusters(spark, dir))
    run("simhashPairs")(operators.Dedup.simhashPairs(spark, dir))
    run("ngramJaccard")(operators.Dedup.ngramJaccardWithinSource(spark, dir))
    run("winnowFingerprints")(operators.TextAnalysis.winnowFingerprints(spark, dir))
    run("embeddingNearDupsLsh")(operators.Similarity.embeddingNearDups(spark, dir))
    run("knnAnn")(operators.Similarity.knnAnn(spark, dir))
    run("contamination")(operators.Dedup.contamination(spark, dir))
    run("sequencePack")(operators.TextAnalysis.sequencePack(spark, dir))
    run("chunkSplit")(operators.TextAnalysis.chunkSplit(spark, dir))

    spark.stop()
  }
}
