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

  test("sorted_intersect_count: merge scan matches array_intersect size") {
    val cases = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),    // partial overlap
      (Array(1L, 2L), Array(3L, 4L)),                     // disjoint
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),             // identical
      (Array.empty[Long], Array(1L)),                     // empty side
      (Array(-5L, 0L, 7L), Array(-5L, 7L)))               // negatives
    val df = cases.toDF("a", "b")
    val native = df.select(NativeExpressions.sorted_intersect_count(col("a"), col("b")))
      .as[Long].collect().toSeq
    val builtin = df.select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .as[Long].collect().toSeq
    assert(native == builtin)
  }

  test("sorted_intersect_count: null elements match nothing (not zero)") {
    val got = spark.sql(
      "SELECT sorted_intersect_count(array(CAST(NULL AS BIGINT), 0L), array(0L, 5L)) AS n")
      .as[Long].head()
    assert(got == 1L) // only the real 0 matches; the null is skipped
  }

  test("hyperplane_band_bits: loop codegen matches per-component reference") {
    val bands = 2; val bits = 3; val dim = 4
    val planes = Array.tabulate(bands * bits * dim)(i => math.sin(i.toDouble)) // fixed arbitrary
    val vecs = Seq(Array(0.5f, -1.0f, 2.0f, 0.25f), Array(-0.1f, -0.2f, -0.3f, -0.4f))
    val got = vecs.toDF("v")
      .select(NativeExpressions.hyperplane_band_bits(col("v"), planes, bands, bits, dim))
      .as[Seq[Int]].collect().toSeq
    val want = vecs.map { v =>
      (0 until bands).map { b =>
        (0 until bits).map { i =>
          var acc = 0.0
          (0 until dim).foreach(j => acc += v(j).toDouble * planes((b * bits + i) * dim + j))
          if (acc >= 0) 1 << i else 0
        }.sum
      }
    }
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }
}
