package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R7's approximate half: HLL distinct counting accuracy (no DuckDB oracle
  * can hash-match a sketch, so the gate query q_distinct_counts carries the
  * exact counts and this spec bounds the sketch error).
  */
class ApproxDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within rsd bound of exact on lineitem keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx")).head()
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.06, s"exact=$exact approx=$approx")
  }

  test("approx_percentile within rank-error bound of exact quantiles") {
    // R17's approximate half: the sketch (Greenwald-Khanna) guarantees rank
    // error <= accuracy^-1; with accuracy 1000 on ~6k rows the estimate must
    // land within ±1% of the true rank neighborhood. Values are integers
    // 1..50, so compare via the exact CDF.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity").cast("double").as("q"))
    val n = li.count().toDouble
    val approx = li.agg(expr("approx_percentile(q, array(0.25, 0.5, 0.75), 1000)"))
      .head().getSeq[Double](0)
    Seq(0.25, 0.5, 0.75).zip(approx).foreach { case (p, est) =>
      val rankBelow = li.filter(col("q") < est).count() / n
      val rankAtOrBelow = li.filter(col("q") <= est).count() / n
      assert(rankBelow - 0.011 <= p && p <= rankAtOrBelow + 0.011,
        s"p=$p est=$est rankBelow=$rankBelow rankAtOrBelow=$rankAtOrBelow")
    }
  }
}
