package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamWelchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming Welch equals the batch operator bit-for-bit") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(4000)((if (rnd.nextBoolean()) "g1" else "g2",
        rnd.nextBoolean(), rnd.nextInt(50).toLong + 1))
      .toDF("grp", "s", "v")
    val got = Streams.streamingWelch(spark, rows,
        queryName = s"swelch_spec_${System.nanoTime()}")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    val expect = graft.operators.RankStats.welchT2(rows, col("grp"),
        col("s"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == expect)
  }

  test("a side that never arrives stays NULL, not zero") {
    val rows = Seq(("g", true, 5L), ("g", true, 9L)).toDF("grp", "s", "v")
    val got = Streams.streamingWelch(spark, rows,
        queryName = s"swelch_spec1_${System.nanoTime()}")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(("g", 2L, 0L, 14L, 0L, None, None)))
  }
}
