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

  test("cdc_landmarks: codegen path matches the SQL lambda form exactly (r10)") {
    // deterministic pseudo-text with enough length to hit landmarks
    val inputs = (1 to 20).map { seed =>
      val sb = new StringBuilder
      var x = seed.toLong
      (0 until 800).foreach { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append(('a' + math.floorMod(x >>> 33, 26L).toInt).toChar)
      }
      sb.toString
    } :+ "short" :+ ("z" * 8) // below-window and exact-window edges
    val df = inputs.toDF("text")
      .withColumn("len", length(col("text")))
    val native = df.select(
      NativeExpressions.cdc_landmarks(col("text"))).as[Seq[Int]].collect().toSeq
    // the r9 gate's SQL form, verbatim
    val pows = "array(1L, 31L, 961L, 29791L, 923521L, 28629151L, " +
      "887503681L, 27512614111L)"
    val sqlForm = df
      .withColumn("cand", when(col("len") >= 8,
        expr("sequence(8, len)")).otherwise(expr("array()")))
      .withColumn("cuts", expr(
        s"""filter(cand, i ->
           |  aggregate(transform(sequence(0, 7),
           |    k -> ascii(substring(text, i - k, 1)) * element_at($pows, k + 1)),
           |    0L, (a, x) -> a + x) % 16777216 % 64 = 0 AND i < len)"""
          .stripMargin))
      .select(col("cuts")).as[Seq[Int]].collect().toSeq
    assert(native == sqlForm)
    assert(native.flatten.nonEmpty, "fixture produced no landmarks at all")
    // short docs: no positions
    assert(native.takeRight(2).forall(_.isEmpty))
  }

  test("cdc_landmarks: null in, null out; interpreted eval agrees with codegen") {
    val got = Seq(Option.empty[String], Some("abcdefghij" * 20)).toDF("s")
      .select(NativeExpressions.cdc_landmarks(col("s")))
      .collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
    // direct interpreted eval (no codegen) vs the helper
    val s = "qwertyuiopasdfghjklzxcvbnm" * 40
    val viaEval = CdcLandmarks(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray.toSeq
    assert(viaEval == CdcLandmarks.landmarks(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toIntArray.toSeq)
  }
}
