package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("strictPrior attaches most recent strictly-earlier right row per key") {
    val left = Seq((1, 10), (1, 25), (2, 5)).toDF("k", "t")
    val right = Seq((1, 8, "r8"), (1, 20, "r20"), (1, 30, "r30"), (2, 9, "r9"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.strictPrior(left, right, "k", "t", Map("v" -> "last_v"))
      .select("k", "t", "last_v").as[(Int, Int, Option[String])].collect().toSet
    assert(got == Set(
      (1, 10, Some("r8")),   // r8 at t=8 < 10; r20 is later
      (1, 25, Some("r20")),  // r20 at 20 < 25; r30 too late
      (2, 5, None)))         // r9 at 9 is NOT before 5 → null
  }

  test("no right rows at all → all-null carry") {
    val left = Seq((1, 10)).toDF("k", "t")
    val right = Seq.empty[(Int, Int, String)].toDF("k", "t", "v")
    val got = AsOfJoin.strictPrior(left, right, "k", "t", Map("v" -> "last_v"))
      .select("last_v").as[Option[String]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("strictNext attaches the first strictly-later right row per key") {
    val left = Seq((1, 10), (1, 25), (1, 30), (2, 5)).toDF("k", "t")
    val right = Seq((1, 10, "r10"), (1, 20, "r20"), (1, 30, "r30"), (2, 3, "r3"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.strictNext(left, right, "k", "t", Map("v" -> "next_v"))
      .select("k", "t", "next_v").as[(Int, Int, Option[String])].collect().toSet
    assert(got == Set(
      (1, 10, Some("r20")), // r10 at t=10 is NOT strictly after 10
      (1, 25, Some("r30")),
      (1, 30, None),        // r30 ties; nothing strictly later
      (2, 5, None)))        // r3 is earlier
  }

  test("strictNext with no right rows → all-null carry") {
    val left = Seq((1, 10)).toDF("k", "t")
    val right = Seq.empty[(Int, Int, String)].toDF("k", "t", "v")
    val got = AsOfJoin.strictNext(left, right, "k", "t", Map("v" -> "next_v"))
      .select("next_v").as[Option[String]].collect()
    assert(got.toSeq == Seq(None))
  }
}
