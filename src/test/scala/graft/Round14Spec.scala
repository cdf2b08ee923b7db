package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 additions: bit-identity receipts for the siegelSlope
  * kernel rewrite (r13 verdict Next #2). */
class Round14Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r14 formulation, in miniature: all ordered pairs'
    * q6-quantized slopes per day, exact lower median by rank. */
  private def referenceSiegel(pts: Seq[(Double, Double)]): (Long, Double) = {
    def q6(v: Double): Double =
      math.floor(v * 1e6 + 0.5 + 1e-6).toLong / 1e6
    val medPerDay = pts.map { case (ti, yi) =>
      val slopes = pts.collect {
        case (tj, yj) if tj != ti => q6((yi - yj) / (ti - tj))
      }.sorted
      slopes(math.ceil(slopes.size / 2.0).toInt - 1)
    }.sorted
    (pts.size.toLong, medPerDay(math.ceil(medPerDay.size / 2.0).toInt - 1))
  }

  test("SiegelDayMedianSlope kernel: bit-identity against the " +
      "theta-join formulation on 50 random series") {
    val rnd = new scala.util.Random(14)
    (1 to 50).foreach { _ =>
      val n = 3 + rnd.nextInt(38)
      val pts = (0 until n).map(i =>
        (i.toDouble, math.floor(rnd.nextDouble() * 1e4) / 1e4))
      val (nRef, slopeRef) = referenceSiegel(pts)
      val daily = pts.toDF("t", "y")
      val packed = daily.agg(collect_list(struct(col("t"), col("y"))).as("all"))
      val perDay = daily.crossJoin(broadcast(packed))
        .select(graft.functions.SeriesFunctions
          .siegelDayMedian(col("all"), col("t"), col("y")).as("med_i"))
      val out = perDay.agg(
        count(lit(1)).as("n_days"),
        element_at(array_sort(collect_list(col("med_i"))),
          ceil(count(lit(1)).cast("double") / 2.0).cast("int"))
          .as("siegel_slope")).collect().head
      assert(out.getLong(0) === nRef)
      assert(java.lang.Double.doubleToLongBits(out.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(slopeRef),
        s"kernel ${out.getDouble(1)} != reference $slopeRef on $pts")
    }
  }

  test("watsonU2 value-collapsed blocks: exact agreement with the " +
      "per-row rank formula on a TIE-HEAVY fixture") {
    // duplicate times-of-day exercise the c>1 closed form the sf
    // testdata (all-unique micros) never reaches
    val rnd = new scala.util.Random(41)
    val hours = Seq(0L, 3600L, 3600L, 3600L, 7200L, 7200L, 43200L,
      43200L, 43200L, 43200L, 80000L) ++
      (1 to 40).map(_ => (rnd.nextInt(24) * 3600).toLong)
    val rows = hours.zipWithIndex.map { case (sec, i) =>
      (i.toLong, (i % 5).toLong, "click", Double.box(1.0),
        (86400L * (i % 7) + sec) * 1000000000L) // epoch nanos
    }
    val dir = TestSpark.eventsFixture(rows)
    val out = graft.operators.Stats.watsonU2(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    // per-row reference: sorted day-fractions, U² = Σ(uᵢ−(2i−1)/2n)²
    // − n(ū−½)² + 1/12n
    val us = hours.map(_ % 86400L).map(_.toDouble / 86400.0).sorted
    val n = us.size
    val ub = us.sum / n
    val ss = us.zipWithIndex.map { case (u, i0) =>
      val d = u - (2.0 * (i0 + 1) - 1) / (2.0 * n); d * d
    }.sum
    val u2 = ss - n * (ub - 0.5) * (ub - 0.5) + 1.0 / (12.0 * n)
    assert(r.getLong(1) === n.toLong)
    assert(math.abs(r.getDouble(2) - ub) < 5e-5,
      s"mean_frac ${r.getDouble(2)} != $ub")
    assert(math.abs(r.getDouble(3) - u2) < 5e-5,
      s"u2_stat ${r.getDouble(3)} != $u2")
  }

  test("siegelSlope end-to-end: kernel plan matches the operator " +
      "output shape and is deterministic across runs") {
    val d = "/root/testdata/sf0.001"
    val a = graft.operators.Stats.siegelSlope(spark, d).collect().head
    val b = graft.operators.Stats.siegelSlope(spark, d).collect().head
    assert(a === b)
    assert(a.getLong(0) > 0 && !a.getDouble(1).isNaN)
  }
}
