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

  test("siegelSlope end-to-end: kernel plan matches the operator " +
      "output shape and is deterministic across runs") {
    val d = "/root/testdata/sf0.001"
    val a = graft.operators.Stats.siegelSlope(spark, d).collect().head
    val b = graft.operators.Stats.siegelSlope(spark, d).collect().head
    assert(a === b)
    assert(a.getLong(0) > 0 && !a.getDouble(1).isNaN)
  }
}
