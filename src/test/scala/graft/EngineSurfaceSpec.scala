package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Relational, TextAnalysis}

/** Invariant tests for the r11 engine-surface batch (recursive SQL,
  * map HOFs, hashing-trick featurizer, BFS eccentricity). */
class EngineSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("recursiveIndex: anchors at 100, chain stays positive") {
    val rows = Relational.recursiveIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.head.getAs[Double]("chained_index") - 100.0) <
      1e-9)
    assert(rows.map(_.getAs[Long]("quarter_index")).toSeq ==
      (0L until rows.length).toSeq)
    rows.foreach(r => assert(r.getAs[Double]("chained_index") > 0.0))
  }

  test("mapFuncs: 5 regions, doubled total is exactly 2x") {
    val rows = graft.functions.ScalarSuites.mapFuncs(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prios") == 5L)
      assert(r.getAs[Long]("doubled_total") ==
        2L * r.getAs[Long]("total_orders"))
      val keys = r.getAs[String]("keys_str").split(",")
      assert(keys.length == 5 && keys.sameElements(keys.sorted))
      val big = r.getAs[String]("big_keys")
      assert(big.isEmpty || big.split(",").forall(keys.contains))
    }
  }

  test("featureHash: sparse signed features, buckets in range") {
    val rows = TextAnalysis.featureHash(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b < 64L)
      assert(r.getAs[Long]("feat") != 0L)
      assert(r.getAs[Long]("doc_id") < 30L)
    }
  }

  test("eccentricity: agrees with the closeness BFS on reached sets") {
    val ecc = Graph.eccentricity(spark, dir).collect()
      .map(r => r.getAs[Long]("seed_custkey") ->
        (r.getAs[Long]("n_reached"), r.getAs[Long]("eccentricity")))
      .toMap
    val clo = Graph.closenessCentrality(spark, dir).collect()
      .map(r => r.getAs[Long]("seed_custkey") -> r.getAs[Long]("n_reached"))
      .toMap
    assert(ecc.keySet == clo.keySet)
    ecc.foreach { case (k, (n, e)) =>
      assert(n == clo(k))
      assert(e >= 1L && e <= 4L)
    }
  }

  test("nullFuncs: three-valued logic columns are mutually consistent") {
    val rows = graft.functions.ScalarSuites.nullFuncs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val missing = r.getAs[Boolean]("value_missing")
      assert(missing == (r.getAs[String]("presence") == "missing"))
      if (missing) {
        assert(r.getAs[Double]("v_filled") == -1.0)
        assert(!r.getAs[Boolean]("ns_eq_zero"))
      }
      assert(r.getAs[String]("type_or_filtered") != "view")
    }
  }

  test("tokenFertility: fertility >= 1 (subwords never fewer than words)") {
    val rows = graft.operators.TextAnalysis.tokenFertility(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Double]("avg_doc_words") > 0.0)
    }
  }

  test("windowFrames: RANGE >= ROWS cumulative; trailing 7d <= cumulative") {
    val rows = graft.operators.Relational.windowFrames(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // RANGE includes all date peers, ROWS stops at the current row
      assert(r.getAs[Long]("cum_range") >= r.getAs[Long]("cum_rows"))
      assert(r.getAs[Long]("trail7d") <= r.getAs[Long]("cum_range"))
      assert(r.getAs[Long]("trail7d") > 0L)
    }
  }
}
