package graft.plans

import graft.SparkTestSession
import graft.operators.AsOfJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native as-of join matches the union+window formulation on real data") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    val nat = AsOfJoin.strictPriorNative(purchases, clicks,
        "user_id", "event_id", "event_id", "last_click_id")
      .orderBy("event_id")
      .as[(Long, Long, Option[Long])].collect().toSeq
    val ref = AsOfJoin.strictPrior(purchases, clicks, "user_id", "event_id",
        Map("event_id" -> "last_click_id"))
      .orderBy("event_id")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(nat.nonEmpty && nat == ref)
  }

  test("native operator handles strictness, missing priors, and string carry") {
    val left = Seq((1L, 10L), (1L, 25L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 8L, "r8"), (1L, 20L, "r20"), (1L, 30L, "r30"), (2L, 9L, "r9"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.strictPriorNative(left, right, "k", "t", "v", "last_v")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 10L, Some("r8")), (1L, 25L, Some("r20")), (2L, 5L, None)))
  }

  test("the physical plan is the custom exec with one exchange+sort per side") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 8L, 99L)).toDF("k", "t", "v")
    val df = AsOfJoin.strictPriorNative(left, right, "k", "t", "v", "last_v")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips the Exec suffix
    assert(plan.contains("Exchange hashpartitioning(k"), plan)
    assert(plan.contains("Sort [k"), plan)
  }
}
