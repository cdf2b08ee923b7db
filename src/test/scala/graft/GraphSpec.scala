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

  test("triangleCounts equals the brute-force 3-clique enumeration") {
    val dir = TestSpark.sfDir
    val got = Graph.triangleCounts(spark, dir).collect()
      .map(r => r.getAs[Long]("supplier") -> r.getAs[Long]("n_triangles")).toMap
    // brute force: materialize the same projected edge set, enumerate
    // all vertex triples driver-side (sf0.001 graph is tiny)
    import org.apache.spark.sql.functions._
    val ps = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 48)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val edges = ps.as("x").join(ps.as("y"), "l_partkey")
      .filter(col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey"), col("y.l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (a, ia) <- verts.zipWithIndex
      b <- verts.drop(ia + 1) if edges((a, b))
      c <- verts.dropWhile(_ <= b) if edges((b, c)) && edges((a, c))
    } expect(a) = expect.getOrElse(a, 0L) + 1L
    assert(got === expect.toMap)
    assert(got.values.sum > 0, "fixture graph should contain triangles")
  }
}
