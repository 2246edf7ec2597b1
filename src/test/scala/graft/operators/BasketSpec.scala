package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BasketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (basket, item) with a duplicated line (same item twice in basket 1)
  private val baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (4L, 10L), (4L, 30L)
  ).toDF("basket", "item")

  test("pair supports are distinct-per-basket and ordered a < b") {
    val got = Basket.pairSupports(baskets)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((10L, 20L) -> 3L, (10L, 30L) -> 2L, (20L, 30L) -> 1L),
      "duplicate lines must not inflate support; pairs are canonical a<b")
  }

  test("rule table confidence is exact ppm both directions") {
    val rules = Basket.rules(Basket.pairSupports(baskets),
        Basket.itemSupports(baskets), minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // support(10)=4, support(20)=3, support(30)=2
    val r1020 = rules((10L, 20L))
    assert(r1020._6 == 3L * 1000000 / 4) // conf(10→20) = 3/4
    assert(r1020._7 == 1000000L)         // conf(20→10) = 3/3
    assert(!rules.contains((20L, 30L)), "below min support")
  }

  test("incremental merge equals full recompute for any basket split") {
    for (mod <- Seq(2L, 3L)) {
      val a = baskets.filter($"basket" % mod === 0)
      val b = baskets.filter($"basket" % mod =!= 0)
      val pair = Basket.mergeCounters("support_pair",
        Basket.pairSupports(a), Basket.pairSupports(b))
      val item = Basket.mergeCounters("support",
        Basket.itemSupports(a), Basket.itemSupports(b))
      val inc = Basket.rules(pair, item, 2)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val full = Basket.rules(Basket.pairSupports(baskets),
          Basket.itemSupports(baskets), 2)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(inc == full, s"split mod $mod diverged")
    }
  }

  test("merging with an empty delta is the identity") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("basket", "item")
    val merged = Basket.mergeCounters("support_pair",
      Basket.pairSupports(baskets), Basket.pairSupports(empty))
      .as[(Long, Long, Long)].collect().toSet
    val direct = Basket.pairSupports(baskets)
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == direct)
  }
}
