package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TypedTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bounded buffer keeps exactly top-k with deterministic tie-break") {
    val rows = Seq(
      (1L, TypedTopK.Entry(10.0, 100L)), (1L, TypedTopK.Entry(30.0, 101L)),
      (1L, TypedTopK.Entry(20.0, 102L)), (1L, TypedTopK.Entry(30.0, 99L)), // tie: lower id wins
      (2L, TypedTopK.Entry(5.0, 200L))).toDS()
    val got = TypedTopK.topKPerKey(rows, 2).collect().toSet
    assert(got == Set(
      (1L, 99L, 30.0, 1L), (1L, 101L, 30.0, 2L),
      (2L, 200L, 5.0, 1L)))
  }

  test("matches the window row_number formulation on real data") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .map { case (ck, ok, p) => (ck, TypedTopK.Entry(p, ok)) }
    val agg = TypedTopK.topKPerKey(rows, 3)
      .toDF("k", "id", "score", "rnk").collect().toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3).collect().toSet
    assert(agg == win)
  }
}
