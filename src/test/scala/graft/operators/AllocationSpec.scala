package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AllocationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def alloc(weights: Seq[(String, Long)], budget: Long): Map[String, Long] =
    Allocation.hamilton(weights.toDF("k", "w"), "k", "w", budget)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap

  test("allocation sums to exactly the budget") {
    val got = alloc(Seq("a" -> 333L, "b" -> 333L, "c" -> 334L), 10L)
    assert(got.values.sum == 10L)
  }

  test("largest remainders absorb the leftover units") {
    // quotas: a=1.4, b=1.4, c=0.2 over budget 3 -> floors 1,1,0, leftover 1
    // remainders: a=2/5, b=2/5, c=1/5 -> tie a/b broken by key: a gets it
    val got = alloc(Seq("a" -> 7L, "b" -> 7L, "c" -> 1L), 3L)
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
  }

  test("exact proportions allocate with zero leftovers") {
    val got = alloc(Seq("a" -> 1L, "b" -> 2L, "c" -> 7L), 100L)
    assert(got == Map("a" -> 10L, "b" -> 20L, "c" -> 70L))
  }

  test("zero-weight groups get nothing; allocation never exceeds budget") {
    val got = alloc(Seq("a" -> 0L, "b" -> 5L), 7L)
    assert(got("a") == 0L && got("b") == 7L)
  }

  test("budget larger than any single share still lands proportionally") {
    val got = alloc(Seq("big" -> 999999L, "small" -> 1L), 1000000L)
    assert(got.values.sum == 1000000L)
    assert(got("small") == 1L, "tiny shares must not be rounded away entirely")
  }
}
