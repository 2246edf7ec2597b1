package graft.cdc

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ColumnDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("columnDiff lists exactly the differing columns, null-safely") {
    val target = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, Option("b"), None),
      (3L, Option("c"), Option(30L)),
      (4L, None, Option(40L)),
      (5L, Option("e"), Option(50L))).toDF("k", "s", "v")
    val staged = Seq(
      (1L, Option("a"), Option(10L)),  // identical -> dropped
      (2L, Option("b"), Option(20L)),  // null -> value
      (3L, None, Option(30L)),         // value -> null
      (4L, Option("d"), Option(41L)),  // both differ
      (6L, Option("x"), Option(60L))). // key not in target -> no row
      toDF("k", "s", "v")
    val got = Cdc.columnDiff(target, staged, Seq("k"), Seq("s", "v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "v"), (3L, "s"), (4L, "s,v")))
  }

  test("composite primary keys join on every key column") {
    val target = Seq((1L, "x", 10L), (1L, "y", 11L)).toDF("k1", "k2", "v")
    val staged = Seq((1L, "x", 99L), (1L, "y", 11L)).toDF("k1", "k2", "v")
    val got = Cdc.columnDiff(target, staged, Seq("k1", "k2"), Seq("v"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "x", "v")))
  }
}
