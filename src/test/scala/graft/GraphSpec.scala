package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** PageRank invariants on the sf0.001 trade graph. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("pageRank: mass conserved, strictly positive, one row per node") {
    val rows = Graph.pageRank(spark, TestSpark.sfDir, iters = 3).collect()
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ > 0))
    // undirected graph has no dangling nodes → total rank stays 1
    // (up to the 4-decimal output rounding across n nodes)
    assert(math.abs(ranks.sum - 1.0) < rows.length * 1e-4)
    assert(rows.map(_.getAs[Long]("node")).distinct.length === rows.length)
    // both parity namespaces present (even = customer, odd = supplier)
    assert(rows.exists(_.getAs[Long]("node") % 2 == 0))
    assert(rows.exists(_.getAs[Long]("node") % 2 == 1))
  }
}
