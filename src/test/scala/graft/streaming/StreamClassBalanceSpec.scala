package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X25: streaming class-balance monitor ≡ the batch R83 report. */
class StreamClassBalanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val labels: Seq[Long] =
    Seq.fill(50)(0L) ++ Seq.fill(30)(1L) ++ Seq.fill(15)(2L) ++ Seq.fill(5)(3L)

  private def batchReport: Seq[(Long, Long, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    labels.toDF("label").groupBy("label").agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum(col("n")).over(w))
      .withColumn("share_ppm", expr("n * 1000000 div n_total"))
      .withColumn("gini_ppm",
        expr("1000000 - sum(n * n) OVER () * 1000000 div (n_total * n_total)"))
      .select(col("label"), col("n"), col("share_ppm"), col("gini_ppm"))
      .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
  }

  test("streamed monitor equals the batch report, both state backends") {
    for (rocks <- Seq(false, true)) {
      val got = Streams.streamingClassBalance(spark, labels.toDF("label"),
          queryName = s"sclassbal_spec_$rocks", rocksDb = rocks)
        .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == batchReport, s"rocksDb=$rocks")
    }
  }
}
