package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed co-located join: after writeBucketed on the shared key,
  * the fact⋈fact join plans with ZERO shuffle exchanges — the layout
  * investment that amortizes across every downstream join at scale. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("join on the bucket key plans without exchanges; results unchanged") {
    val cat = new graft.pipeline.LakeCatalog(spark, TestSpark.tempDir("graft-buckets"))
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val ord = Tables.orders(spark, TestSpark.sfDir)
    cat.writeBucketed("li_bucketed", li, "l_orderkey", 4)
    cat.writeBucketed("ord_bucketed", ord, "o_orderkey", 4)

    // disable broadcast so the join shape is genuinely SMJ-on-buckets,
    // and AQE so ShuffleExchangeExec nodes are visible pre-execution
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      // bucketed: the join itself needs no exchange (only the final
      // groupBy on a different key shuffles); unbucketed shuffles both
      // join inputs as well
      assert(countShuffles(bucketed) < countShuffles(unbucketed))
      val joinOnly = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"))
      assert(countShuffles(joinOnly) === 0, joinOnly.queryExecution.executedPlan.toString)

      assert(bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        === unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
