package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.StrSim

/** Pins JaroWinklerSim / DamerauLevenshteinDist to the de-facto
  * standard semantics the DuckDB oracle implements. The expected
  * values below were produced by DuckDB itself
  * (jaro_winkler_similarity / damerau_levenshtein) on this exact
  * vector — including the two discriminating cases:
  *  - ("AB","ACDEFG"): jaro = 0.5556 ≤ 0.7, so NO Winkler boost
  *    (an unconditional-boost implementation returns 0.60);
  *  - ("CA","ABC"): full DL = 2 (restricted OSA would return 3).
  */
class StringSimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val vector = Seq(
    // (a, b, duckdb_jw, duckdb_dl)
    ("MARTHA", "MARHTA", 0.961111, 1),
    ("DIXON", "DICKSONX", 0.813333, 4),
    ("DWAYNE", "DUANE", 0.840000, 2),
    ("CA", "ABC", 0.000000, 2),
    ("AB", "ACDEFG", 0.555556, 5),
    ("Supplier#000000001", "Supplier#000000010", 0.988889, 1),
    ("abcdef", "fedcba", 0.388889, 5),
    ("a", "b", 0.000000, 1),
    ("same", "same", 1.000000, 0),
    ("x", "", 0.000000, 1),
    ("JELLYFISH", "SMELLYFISH", 0.896296, 2),
    ("kitten", "sitting", 0.746032, 3),
    ("ZYXWV", "AZYXW", 0.866667, 2),
    ("aabbcc", "ccbbaa", 0.555556, 4),
    ("thequickbrown", "quickthebrown", 0.897436, 6))

  test("StrSim kernels match the DuckDB-pinned vector") {
    vector.foreach { case (a, b, jw, dl) =>
      val u = UTF8String.fromString(a); val v = UTF8String.fromString(b)
      assert(math.abs(StrSim.jaroWinkler(u, v) - jw) < 1e-6,
        s"jw($a,$b)")
      assert(StrSim.damerauLevenshtein(u, v) == dl, s"dl($a,$b)")
      // symmetry
      assert(StrSim.damerauLevenshtein(v, u) == dl, s"dl($b,$a)")
      assert(math.abs(StrSim.jaroWinkler(v, u) -
        StrSim.jaroWinkler(u, v)) < 1e-12, s"jw sym ($a,$b)")
    }
  }

  test("expressions evaluate through codegen and handle nulls") {
    import graft.functions.StringSimilarity._
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      vector.map { case (a, b, _, _) => (a, b) })
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"),
        damerauLevenshtein(col("a"), col("b")).as("dl"))
    val rows = df.collect()
    rows.zip(vector).foreach { case (r, (a, b, jw, dl)) =>
      assert(math.abs(r.getDouble(0) - jw) < 1e-6, s"codegen jw($a,$b)")
      assert(r.getInt(1) == dl, s"codegen dl($a,$b)")
    }
    val nulls = spark.sql(
      "SELECT CAST(NULL AS STRING) AS a, 'x' AS b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"),
        damerauLevenshtein(col("a"), col("b")).as("dl"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("fuzzyPartPairs top score dominates and blocks are respected") {
    val got = graft.operators.EntityResolution
      .fuzzyPartPairs(spark, TestSpark.sfDir, k = 5,
        strictBlock = false).collect()
    assert(got.length == 5)
    // descending by rounded score
    val scores = got.map(_.getAs[Double]("jw"))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(scores.head >= scores.last)
    val dl = graft.operators.EntityResolution
      .typoPartPairs(spark, TestSpark.sfDir, k = 5,
        strictBlock = false).collect()
    val dists = dl.map(_.getAs[Int]("dl"))
    assert(dists.sameElements(dists.sorted))
  }

  test("default blocking is strict: pairs share p_type and are a " +
      "subset of the loose candidates") {
    // the r9 default flip (VERDICT r8 demand #1): strictBlock = true
    // is the registry default — same cap-by-default discipline as the
    // shingle/prefix df-caps. Strict candidates must be exactly the
    // loose candidates that also agree on p_type.
    val part = graft.Tables.part(spark, TestSpark.sfDir)
      .select(col("p_partkey"), col("p_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val strictPairs = graft.operators.EntityResolution
      .fuzzyPartPairs(spark, TestSpark.sfDir, k = 100).collect()
      .map(r => (r.getAs[Long]("pk_a"), r.getAs[Long]("pk_b"))).toSet
    val loosePairs = graft.operators.EntityResolution
      .fuzzyPartPairs(spark, TestSpark.sfDir, k = 100,
        strictBlock = false).collect()
      .map(r => (r.getAs[Long]("pk_a"), r.getAs[Long]("pk_b"))).toSet
    assert(strictPairs.nonEmpty)
    assert(strictPairs.forall { case (a, b) => part(a) == part(b) })
    val looseSameType =
      loosePairs.filter { case (a, b) => part(a) == part(b) }
    assert(strictPairs == looseSameType)
  }
}
