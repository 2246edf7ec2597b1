package graft.sketches

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmJoinSizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def estimateOf(a: Seq[Long], b: Seq[Long]): Long = {
    val ca = CountMin.counters(a.toDF("k"), col("k"))
    val cb = CountMin.counters(b.toDF("k"), col("k"))
    CountMin.joinSizeEstimate(ca, cb).as[Long].collect().head
  }

  private def exactJoin(a: Seq[Long], b: Seq[Long]): Long = {
    val na = a.groupBy(identity).view.mapValues(_.size.toLong)
    val nb = b.groupBy(identity).view.mapValues(_.size.toLong)
    na.map { case (k, n) => n * nb.getOrElse(k, 0L) }.sum
  }

  test("never underestimates the true join size, and is tight at low load") {
    val rnd = new scala.util.Random(29)
    val a = Seq.fill(3000)(rnd.nextLong(200))
    val b = Seq.fill(2000)(rnd.nextLong(300))
    val est = estimateOf(a, b)
    val exact = exactJoin(a, b)
    assert(est >= exact, s"est $est under exact $exact")
    // 200-300 distinct keys in 512 buckets: collisions are rare, the
    // estimate should be within 2x
    assert(est <= exact * 2, s"est $est too loose vs $exact")
  }

  test("disjoint key domains estimate near zero") {
    val a = (1L to 1000L)
    val b = (100001L to 101000L)
    val est = estimateOf(a, b)
    val exact = exactJoin(a, b)
    assert(exact == 0L)
    // only hash collisions contribute; each side is 1000 rows over 512
    // buckets, so the collision inner product stays far below |a|*|b|
    assert(est < 20000L, s"collision-only estimate unexpectedly large: $est")
  }
}
