package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Attribution

/** Attribution rules on a crafted journey fixture:
  *  u1: view, click, view, PURCHASE, click(trailing — no credit)
  *  u2: signup, PURCHASE
  *  u3: click, view, PURCHASE
  * Expected per-channel credit is hand-computed in each assert. */
class AttributionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ns(sec: Long) = sec * 1000000000L
  private lazy val dir = TestSpark.eventsFixture(Seq(
    (1L, 1L, "view", 0.0, ns(10)),
    (2L, 1L, "click", 0.0, ns(20)),
    (3L, 1L, "view", 0.0, ns(30)),
    (4L, 1L, "purchase", 0.0, ns(40)),
    (5L, 1L, "click", 0.0, ns(50)),
    (6L, 2L, "signup", 0.0, ns(10)),
    (7L, 2L, "purchase", 0.0, ns(20)),
    (8L, 3L, "click", 0.0, ns(10)),
    (9L, 3L, "view", 0.0, ns(20)),
    (10L, 3L, "purchase", 0.0, ns(30))))

  test("channelCredits matches the hand-computed four-rule table") {
    val got = Attribution.channelCredits(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_touches"), r.getAs[Double]("first_touch"),
          r.getAs[Double]("last_touch"), r.getAs[Double]("linear"),
          r.getAs[Double]("position_based"))).toMap
    // u1 journey (n=3): view(1st,0.4) click(mid,0.2) view(last,0.4)
    // u3 journey (n=2): click(1st,0.5) view(last,0.5)
    assert(got("click") === ((2L, 1.0, 0.0, 0.8333, 0.7)))
    assert(got("view") === ((3L, 1.0, 2.0, 1.1667, 1.3)))
    assert(got("signup") === ((1L, 1.0, 1.0, 1.0, 1.0)))
    assert(!got.contains("purchase"))
  }

  test("every rule conserves total credit = converted journeys") {
    val r = Attribution.creditConservation(spark, dir).head()
    assert(r.getAs[Double]("ft_total") === 3.0)
    assert(r.getAs[Double]("lt_total") === 3.0)
    assert(r.getAs[Double]("lin_total") === 3.0)
    assert(r.getAs[Double]("pb_total") === 3.0)
    assert(r.getAs[Long]("n_touches") === 6L)
  }

  test("shapleyAttribution: linearity gives the exact hand answer") {
    // Touch-set games on the fixture: value 2 requires {click, view}
    // (u1 and u3's converted journeys), value 1 requires {signup}
    // (u2). By Shapley linearity + symmetry: click = view = 1,
    // signup = 1, error = 0; shares 1/3, 1/3, 1/3, 0.
    val got = graft.operators.Attribution.shapleyAttribution(spark, dir)
      .collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Double]("phi"), r.getAs[Double]("share"))).toMap
    assert(got("click") === ((1.0, 0.3333)))
    assert(got("view") === ((1.0, 0.3333)))
    assert(got("signup") === ((1.0, 0.3333)))
    assert(got("error") === ((0.0, 0.0)))
  }

  test("conservation holds on the real sf0.001 events") {
    val r = Attribution.creditConservation(spark, TestSpark.sfDir).head()
    val ft = r.getAs[Double]("ft_total")
    // first/last touch totals are exact journey counts
    assert(ft === r.getAs[Double]("lt_total"))
    assert(math.abs(r.getAs[Double]("lin_total") - ft) < 0.01)
    assert(math.abs(r.getAs[Double]("pb_total") - ft) < 0.01)
  }
}
