package graft

import graft.functions.RollingHash
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rolling_hash is callable from SQL and matches the scala reference") {
    val got = spark.sql("SELECT rolling_hash('hello world') AS h")
      .head().getAs[Long]("h")
    assert(got == RollingHash.hashBytes("hello world".getBytes("UTF-8")))
  }

  test("vec_dot is callable from SQL") {
    val got = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getAs[Double]("d")
    assert(got == 11.0)
  }

  test("sorted_intersect_count is callable from SQL") {
    val got = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .head().getAs[Long]("n")
    assert(got == 2L)
  }

  test("shingle + hash functions are callable from SQL") {
    val r = spark.sql(
      """SELECT word_shingles('a b c', 2) AS ws, char_shingles('abcd', 3) AS cs,
        |  md5_prefix24('x') AS h""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) == Seq("abc", "bcd"))
    assert(r.getAs[Long]("h") >= 0 && r.getAs[Long]("h") < (1L << 24))
  }

  test("image_meta is callable from SQL") {
    val got = spark.sql(
      """SELECT image_meta(unhex('89504E470D0A1A0A0000000D49484452' ||
        |  '00000003000000020806000000')).width AS w""".stripMargin)
      .head().getAs[Int]("w")
    assert(got == 3)
  }

  test("zvalue is callable from SQL for 2 and 3 dimensions") {
    val r = spark.sql(
      "SELECT zvalue(CAST(3 AS BIGINT), CAST(0 AS BIGINT), 12) AS z2, " +
        "zvalue(CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST(6 AS BIGINT), 12) AS z3")
      .head()
    assert(r.getAs[Long]("z2") == 5L) // interleave(0b11, 0b00) = 0b0101
    assert(r.getAs[Long]("z3") == graft.layout.ZOrder.zvalueNRef(Seq(5L, 3L, 6L), 12))
  }
}
