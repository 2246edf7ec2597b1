package graft.streaming

import graft.SparkTestSession
import graft.operators.Cohorts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (user, stage, tsu) — covers full completion, out-of-order stages,
  // same-instant ties, skipped entry, and late better stage-1 times
  private val fixture = Seq(
    (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
    (2L, 2, 5L), (2L, 1, 10L),               // click before any view
    (3L, 1, 10L), (3L, 2, 10L),              // tie is not strictly after
    (4L, 2, 10L), (4L, 3, 20L),              // never stage 1
    (5L, 1, 10L), (5L, 3, 15L), (5L, 2, 20L),// stage 3 mid-funnel
    (6L, 1, 40L), (6L, 1, 10L), (6L, 2, 20L) // earliest stage-1 wins
  )

  test("streamed chains equal the batch funnelTimes chains") {
    val rows = fixture.toDF("user", "stage", "tsu")
    val got = Streams.streamingFunnel(spark, rows, 3,
        queryName = s"sfunnel_spec_${System.nanoTime()}")
      .as[(Long, Seq[Long])].collect().toMap

    val names = Map(1 -> "a", 2 -> "b", 3 -> "c")
    val batch = Cohorts.funnelTimes(
        fixture.map { case (u, st, ts) => (u, names(st), ts) }.toDF("u", "et", "ts"),
        "u", "et", "ts", Seq("a", "b", "c"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> Seq(r._2.getOrElse(0L), r._3.getOrElse(0L), r._4.getOrElse(0L)))
      .toMap

    assert(got == batch)
    assert(got(1L) == Seq(10L, 20L, 30L))
    assert(got(2L) == Seq(10L, 0L, 0L))
    assert(got(6L) == Seq(10L, 20L, 0L))
  }
}
