package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R96: item-item Jaccard similarity over baskets. */
class ItemJaccardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact inclusion-exclusion Jaccard, support threshold, popularity bias") {
    // item 1 in baskets {1,2,3,4}, item 2 in {1,2,3}, item 3 in {1,2,3,4}
    // hub item 9 in all baskets but co-occurring only once with 1..3 via b5
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 9L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 9L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 9L),
      (4L, 1L), (4L, 3L), (4L, 9L),
      (5L, 9L)).toDF("basket", "item")
    val got = Basket.itemJaccard(baskets, minPairSupport = 3L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // (1,3): inter 4, union 4+4-4=4 -> 1e6
    assert(got((1L, 3L)) == ((4L, 4L, 1000000L)))
    // (1,2): inter 3, union 4+3-3=4 -> 750000
    assert(got((1L, 2L)) == ((3L, 4L, 750000L)))
    // (2,3): inter 3, union 3+4-3=4 -> 750000
    assert(got((2L, 3L)) == ((3L, 4L, 750000L)))
    // hub 9: co-occurs 4x with 1 and 3 but union 5 -> 800000, NOT top
    assert(got((1L, 9L)) == ((4L, 5L, 800000L)))
    assert(got((3L, 9L)) == ((4L, 5L, 800000L)))
    assert(got((2L, 9L)) == ((3L, 5L, 600000L)))
    assert(got.size == 6)
  }

  test("duplicate (basket, item) rows count once") {
    val baskets = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)).toDF("basket", "item")
    val got = Basket.itemJaccard(baskets, minPairSupport = 3L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 3L, 1000000L)))
  }
}
