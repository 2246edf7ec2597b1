package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamMomentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming (n, Σx, Σx²) state equals the batch aggregate bit-for-bit") {
    val rnd = new scala.util.Random(83)
    val rows = Seq.fill(5000)((if (rnd.nextBoolean()) "a" else "b",
      rnd.nextInt(100000).toLong)).toDF("key", "x")
    val got = Streams.streamingMoments(spark, rows,
        queryName = s"smoments_spec_${System.nanoTime()}")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expect = rows.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expect)
  }
}
