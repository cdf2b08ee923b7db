package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolution

/** Masked-variant blocking must equal the brute-force Hamming-1 scan
  * (equal-length Levenshtein 1 ⟺ one substitution). */
class EntityResolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("customerNameDedup equals brute-force Hamming-1 over all pairs") {
    val got = EntityResolution.customerNameDedup(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getAs[Long]("custkey_a"), r.getAs[Long]("custkey_b"),
        r.getAs[Int]("dist")))
    assert(got.nonEmpty)
    assert(got.forall(_._3 == 1), "distinct names at distance <= 1 are distance 1")
    val names = Tables.customer(spark, TestSpark.sfDir)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_name"))
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val want = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && hamming(na, nb) == 1
    } yield (ka, kb, 1)).toSet
    assert(got.toSet === want)
    // the blocking's bound: no variant posting list can exceed the
    // masked alphabet (10 digits), so blocks cannot go hot
    assert(want.nonEmpty)
  }
}
