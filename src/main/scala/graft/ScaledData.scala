package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replicated-testdata builder shared by [[ScaleSmoke]] (fresh temp
  * dir per run) and [[MakeScaledData]] (persistent dir for the sf1
  * full-registry bench receipt): every fact table is copied `factor`×
  * with all id columns shifted by a per-copy stride, so join keys stay
  * consistent within a copy and disjoint across copies;
  * fixed-cardinality dimensions copy through unreplicated. A 10×
  * replica of sf0.1 has the sf1 row counts (~6M lineitem). */
object ScaledData {
  val IdStride = 10000000L

  /** `perturbEmbeddings = true` (MakeScaledData / the sf1 bench input)
    * nudges each embedding copy so no byte-identical vector groups
    * exist — the realistic corpus shape. ScaleSmoke keeps it FALSE:
    * its embeddingNearDups rows deliberately measure the
    * identical-collapse path, for which the replicated identical
    * groups are the point. */
  def build(spark: SparkSession, baseDir: String, outDir: String,
            factor: Int, perturbEmbeddings: Boolean = false): Unit = {
    def replicate(table: String, idCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$baseDir/$table.parquet")
      val copies = (0 until factor).map { k =>
        idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * IdStride))
        }
      }.reduce(_ unionByName _)
      copies.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    replicate("documents", Seq("doc_id"))
    // embeddings: id-shift, optionally with a per-copy deterministic
    // perturbation (copy k nudges dimension k mod 64 by k·1e-3) —
    // plain replication plants thousands of byte-identical vector
    // groups, a corpus shape real sf1 data never has (and one the
    // LSH-completeness gate's identical-groups precondition loudly
    // refuses, by design)
    if (perturbEmbeddings) {
      val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
      val copies = (0 until factor).map { k =>
        base
          .withColumn("vec_id", col("vec_id") + lit(k * IdStride))
          .withColumn("embedding",
            if (k == 0) col("embedding")
            else transform(col("embedding"),
              (x, i) => when(i === lit(k % 64), x + lit(k * 1e-3f))
                .otherwise(x)))
      }.reduce(_ unionByName _)
      copies.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    } else replicate("embeddings", Seq("vec_id"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("part", Seq("p_partkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("customer", Seq("c_custkey"))
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }
}

/** `sbt "runMain graft.MakeScaledData <baseDir> <outDir> <factor>"` —
  * materialize a replicated corpus once (e.g. the sf1-scale input for
  * the full-registry bench) instead of rebuilding per run. */
object MakeScaledData {
  def main(args: Array[String]): Unit = {
    val (baseDir, outDir, factor) = (args(0), args(1), args(2).toInt)
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    try {
      ScaledData.build(spark, baseDir, outDir, factor,
        perturbEmbeddings = true)
      println(s"[scaled] ${factor}x of $baseDir at $outDir: " +
        s"${spark.read.parquet(s"$outDir/lineitem.parquet").count()} lineitems")
    } finally spark.stop()
  }
}
