package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed two-stage prefix sums ≡ the naive global window. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the single-partition global window on sparse irregular ords") {
    // irregular, gappy, unordered ords incl. bucket boundaries
    val rows = Seq((0L, 5L), (1L, 3L), (63L, 7L), (64L, 11L), (65L, 2L),
      (200L, 1L), (1000L, 9L), (1001L, 4L)).reverse
    val df = rows.toDF("ord", "v")
    val got = PrefixSum.prefixSums(df, col("ord"), Seq("v" -> col("v")),
        bucketWidth = 64L)
      .select("ord", "cum_v").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (o, v)) => (o, acc + v)
    }.tail.toMap
    assert(got == want)
  }

  test("multiple value columns and width-1 buckets") {
    val df = (1L to 100L).map(i => (i, i, 1L)).toDF("ord", "a", "b")
    val got = PrefixSum.prefixSums(df, col("ord"),
        Seq("a" -> col("a"), "b" -> col("b")), bucketWidth = 1L)
      .select("ord", "cum_a", "cum_b").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    got.foreach { case (o, ca, cb) =>
      assert(ca == o * (o + 1) / 2 && cb == o)
    }
  }

  test("plan has no data-sized unpartitioned window") {
    val df = (1L to 1000L).map(i => (i, 1L)).toDF("ord", "v")
    val out = PrefixSum.prefixSums(df, col("ord"), Seq("v" -> col("v")),
      bucketWidth = 100L)
    val plan = out.queryExecution.optimizedPlan.toString()
    // every Window over the full input must carry the bucket partition key;
    // the only orderBy-without-partition window is over the 10-row bucket
    // totals (behind the broadcast)
    val dataWindows = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(dataWindows.exists(_.contains("__bucket#")),
      s"expected the intra-bucket window to be partitioned:\n$plan")
  }
}
