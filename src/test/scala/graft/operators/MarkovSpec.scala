package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MarkovSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(pairs: Seq[(String, String)], rounds: Int): Map[String, Long] =
    Markov.stationaryPpm(pairs.toDF("from_state", "to_state"), rounds)
      .as[(String, Long)].collect().toMap

  /** Driver-side replay of the exact ppm power iteration. */
  private def ref(pairs: Seq[(String, String)], rounds: Int): Map[String, Long] = {
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val outTot = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    def p(f: String, t: String): Long =
      if (!outTot.contains(f)) { if (f == t) 1000000L else 0L }
      else counts.getOrElse((f, t), 0L) * 1000000L / outTot(f)
    var pi: Map[String, Long] =
      states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to rounds) {
      pi = states.map { s =>
        s -> states.map(f => pi(f) * p(f, s)).sum / 1000000L
      }.toMap
    }
    pi
  }

  private val chain = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
    ("a", "b"), ("b", "a"))

  test("matches the integer reference at several round counts") {
    for (r <- 1 to 4)
      assert(run(chain, r) == ref(chain, r), s"rounds=$r diverged")
  }

  test("a dangling sink keeps its mass via the self-loop") {
    // b never appears as a source: everything flowing into b stays
    val pairs = Seq(("a", "b"), ("a", "b"))
    val got = run(pairs, 3)
    assert(got == ref(pairs, 3))
    assert(got("b") > got("a"))
  }

  test("a two-cycle alternates toward the uniform split") {
    val got = run(Seq(("a", "b"), ("b", "a")), 4)
    // exact floors: 500000 each, stable under the swap
    assert(got == Map("a" -> 500000L, "b" -> 500000L))
  }
}
