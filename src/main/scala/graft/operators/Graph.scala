package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.Rounding.round4eps

/** Iterative graph analytics on Spark DataFrames. Connected components
  * live in [[Dedup.nearDupClusters]]; this adds PageRank — the
  * canonical "iterate a keyed join + aggregate to a fixed point"
  * workload, and the shape (beside CC) that distinguishes a dataflow
  * engine from a one-shot query engine.
  *
  * Scale posture: each iteration is one join keyed on the edge source
  * + one aggregate keyed on the edge target — both hash-partitioned on
  * node id, so a 100 TB edge list distributes evenly (skewed hub nodes
  * are bounded by the aggregate's map-side partials). The edge list
  * and out-degrees are computed once and persisted; iteration count is
  * fixed (no driver-side convergence collect in the hot path).
  */
object Graph {

  /** PageRank over the customer–supplier trade graph (an edge per
    * distinct (customer, supplier) order relationship, traversed both
    * ways so the graph is undirected and free of dangling nodes).
    * Fixed `iters` power iterations with damping 0.85:
    * r'(v) = (1-d)/N + d · Σ_{u~v} r(u)/deg(u).
    * Node ids are namespaced ('c123' / 's45') since customer and
    * supplier keys share the integer space. */
  def pageRank(s: SparkSession, dir: String,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val cs = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    val withDeg = edges
      .join(edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg")), "a")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // undirected ⇒ every node appears as a source; outdeg ≥ 1 always
    val nodes = withDeg.select(col("a").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSize = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nSize))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, col("a") === col("node"))
        .groupBy(col("b")).agg(sum(col("rank") / col("outdeg")).as("mass"))
      ranks = nodes.crossJoin(broadcast(nSize))
        .join(contrib, col("node") === col("b"), "left")
        .select(col("node"),
          (lit(1) - lit(damping)) / col("n") +
            lit(damping) * coalesce(col("mass"), lit(0.0)) as "rank")
    }
    ranks.select(col("node"), round4eps(col("rank")).as("rank"))
  }
}
