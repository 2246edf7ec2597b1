package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rolling_hash matches the scala reference on codegen path") {
    val inputs = Seq("", "a", "hello world", "x" * 1000)
    val got = inputs.toDF("s")
      .select(NativeExpressions.rolling_hash(col("s"))).as[Long].collect().toSeq
    val want = inputs.map(s => RollingHash.hashBytes(s.getBytes("UTF-8")))
    assert(got == want)
    assert(got.distinct.size == inputs.size || inputs.distinct.size < inputs.size)
  }

  test("rolling_hash null in, null out") {
    val got = Seq(Option.empty[String], Some("a")).toDF("s")
      .select(NativeExpressions.rolling_hash(col("s"))).as[Option[Long]].collect()
    assert(got(0).isEmpty && got(1).nonEmpty)
  }

  test("vec_dot float arrays: bit-identical to the higher-order builtin form") {
    val df = Seq((Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f))).toDF("a", "b")
    val native = df.select(NativeExpressions.vec_dot(col("a"), col("b"))).as[Double].head()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v))
      .as[Double].head()
    assert(native == hof) // exact equality, not approx
  }

  test("vec_dot double arrays work too") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(df.select(NativeExpressions.vec_dot(col("a"), col("b"))).as[Double].head() == 11.0)
  }
}
