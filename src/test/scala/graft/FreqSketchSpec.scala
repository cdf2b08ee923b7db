package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch: guarantee, merge behavior, and
  * end-to-end equality of heavyHitters with the exact GROUP BY. */
class FreqSketchSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("mg_topk guarantees items above N/(k+1) survive tiny k") {
    // 60 'hot' + 40 singletons, k=4: hot has count 60 > 100/5
    val data = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"w$i"))
    val df = data.toDF("token").repartition(7) // force partial merges
    val out = df.agg(expr("mg_topk(token, 4)").as("c"))
      .select(explode(col("c")).as("token")).as[String].collect().toSet
    assert(out.contains("hot"), s"guaranteed heavy item missing from $out")
    assert(out.size <= 4)
  }

  test("sketch handles k larger than vocabulary (exact mode)") {
    val df = Seq("a", "b", "a", "c", "a").toDF("token").repartition(3)
    val out = df.agg(expr("mg_topk(token, 100)").as("c"))
      .select(explode(col("c")).as("token")).as[String].collect().toSet
    assert(out === Set("a", "b", "c")) // nothing evicted, sorted set
  }

  test("heavyHitters equals the exact HAVING-filter wordcount") {
    val dir = TestSpark.sfDir
    val exact = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = exact.count()
    val expect = exact.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 > n)
      .select(col("token"), col("cnt"))
    val got = operators.TextAnalysis.heavyHitters(s, dir)
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture should contain at least one heavy token")
  }

  test("kmv_mins: k smallest distinct values, invariant under partitioning") {
    val vals = Seq(9L, 3L, 3L, 7L, 1L, 5L, 5L, 8L, 2L, 6L)
    def mins(parts: Int): Seq[Long] =
      vals.toDF("h").repartition(parts)
        .agg(expr("kmv_mins(h, 4)").as("m"))
        .select(explode(col("m")).as("v")).as[Long].collect().toSeq
    // ascending, distinct, exactly the 4 smallest
    assert(mins(1) === Seq(1L, 2L, 3L, 5L))
    assert(mins(7) === Seq(1L, 2L, 3L, 5L)) // merge path, same result
  }

  test("kmv_mins: exact mode when vocabulary smaller than k") {
    val out = Seq(5L, 5L, 1L).toDF("h")
      .agg(expr("kmv_mins(h, 16)").as("m"))
      .select(explode(col("m")).as("v")).as[Long].collect().toSeq
    assert(out === Seq(1L, 5L))
  }

  test("kmvDistinct estimator lands within the analytic error band") {
    val r = operators.Relational.kmvDistinct(s, TestSpark.sfDir).collect()(0)
    val exact = r.getAs[Long]("exact_ndv").toDouble
    val est = r.getAs[Double]("est_ndv")
    if (r.getAs[Long]("n_retained") < r.getAs[Long]("k"))
      assert(est === exact) // sketch not full → exact by construction
    else // 5σ at k=256 ≈ 31% — loose enough to never flake, still real
      assert(math.abs(est - exact) / exact < 0.3125, s"est $est vs $exact")
  }

  test("hash_reservoir: membership is a pure function of the input set") {
    import graft.functions.FreqSketchFunctions.hashReservoir
    val data = (1L to 1000L).map(i => (i * 2654435761L % 100003L, i * 0.5))
    def sample(parts: Int): Seq[Double] = data.toDF("h", "v")
      .repartition(parts)
      .agg(hashReservoir(col("h"), col("v"), 32).as("s"))
      .select(explode(col("s")).as("v")).as[Double].collect().toSeq
    // identical sample under 1, 3, and 17 partitions (merge-tree shapes)
    val one = sample(1)
    assert(sample(3) === one)
    assert(sample(17) === one)
    // and it IS the k-smallest-hash rule
    val want = data.sortBy(_._1).take(32).map(_._2)
    assert(one.toSet === want.toSet)
  }

  test("hash_reservoir: collision keeps the minimum value, merge-order-free") {
    import graft.functions.FreqSketchFunctions.hashReservoir
    val data = Seq((5L, 9.0), (5L, 1.0), (7L, 3.0), (5L, 4.0))
    (1 to 4).foreach { parts =>
      val out = data.toDF("h", "v").repartition(parts)
        .agg(hashReservoir(col("h"), col("v"), 8).as("s"))
        .select(explode(col("s")).as("v")).as[Double].collect().toSet
      assert(out === Set(1.0, 3.0), s"parts=$parts gave $out")
    }
  }

  test("hashSampleQuantiles: sample quantiles near exact, counts capped") {
    val out = operators.Relational.hashSampleQuantiles(s, TestSpark.sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= 128L)
      // rank error O(1/sqrt(k)); values span ~[0,500] — generous band
      assert(math.abs(r.getAs[Double]("p50_sample") -
        r.getAs[Double]("p50_exact")) <= 150.0)
    }
  }
}
