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
}
