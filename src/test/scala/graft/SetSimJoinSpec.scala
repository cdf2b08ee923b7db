package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SetSimJoin

class SetSimJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("prefix-filtered join equals brute-force all-pairs on sf0.001") {
    val got = SetSimJoin.prefixFilteredJaccardJoin(spark, TestSpark.sfDir)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // brute force: exact shingle-set Jaccard over the full cross product
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val expect = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = sh(ta); sb = sh(tb)
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.9
    } yield (a, b, math.floor(j * 10000 + 0.5 + 1e-6) / 10000)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("exact-boundary pair (jaccard == t) survives the float guards") {
    // 20 distinct words -> 18 distinct shingles; b appends 2 more words
    // -> 20 shingles, superset of a's. j = 18/20 = 0.9 exactly — on the
    // threshold boundary, where an unguarded ceil(0.9*20) = 19 (double
    // arithmetic) would shorten a's prefix below the completeness bound
    // and silently drop the pair.
    val wordsA = (1 to 20).map(i => s"w$i").mkString(" ")
    val wordsB = wordsA + " w21 w22"
    val docs = Seq((1L, wordsA), (2L, wordsB)).toDF("doc_id", "text")
    val out = SetSimJoin.joinOn(docs)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0.9)))
  }

  test("prefix df cap: bites only past the cap, default never at oracle scale") {
    // a 100-doc duplicate cluster: every shared shingle has df=100, so
    // every prefix posting list is length 100
    val cluster = (1L to 100L).map(i => (i, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
    val uncapped = SetSimJoin.joinOn(cluster, maxPrefixDf = Int.MaxValue).count()
    assert(uncapped === 100L * 99 / 2, "exact variant finds all C(100,2) pairs")
    val capped = SetSimJoin.joinOn(cluster, maxPrefixDf = 64).count()
    assert(capped === 0L, "df-capped variant drops the hot posting list whole")
    // registry default == exact at gate scale (cap exceeds every df)
    val exact = SetSimJoin.prefixFilteredJaccardJoin(spark, TestSpark.sfDir,
        maxPrefixDf = Int.MaxValue)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val dflt = SetSimJoin.prefixFilteredJaccardJoin(spark, TestSpark.sfDir)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(dflt === exact)
  }

  test("tiny-vocabulary corpus stays correct (shingle space rescues selectivity)") {
    // every doc drawn from 3 words: word-level prefixes would be fully
    // unselective; shingle sets still separate the dissimilar pair
    val docs = Seq(
      (1L, "a b c a b c a b c a"),
      (2L, "a b c a b c a b c a"),  // identical to 1 -> j = 1.0
      (3L, "c b a c b a c b a c")   // same words, different shingles
    ).toDF("doc_id", "text")
    val out = SetSimJoin.joinOn(docs)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }
}
