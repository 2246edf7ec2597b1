package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamScoreQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming Brier/ECE equals the batch operator bit-for-bit") {
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(3000) {
      val p = rnd.nextInt(1000001).toLong
      (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(3) == 0, p)
    }.toDF("grp", "y", "p")
    val got = Streams.streamingScoreQuality(spark, rows, bins = 10,
        queryName = s"squality_spec_${System.nanoTime()}")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val expect = graft.operators.Eval.scoreQuality(rows, col("grp"),
        col("y"), col("p"), bins = 10)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == expect)
  }
}
