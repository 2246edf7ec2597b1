package graft.plans

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GroupedTopKPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native grouped top-k matches the window formulation on real data") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val nat = GroupedTopK.topK(o, Seq("o_custkey"),
        col("o_totalprice"), col("o_orderkey"), k = 3, rankName = "rnk")
      .select("o_custkey", "o_orderkey", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = o.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(nat.nonEmpty && nat == ref)
  }

  test("rank is 1-based, deterministic under ties via the tie-breaker") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0),
      (2L, 20L, 1.0)).toDF("g", "id", "s")
    val got = GroupedTopK.topK(df, Seq("g"), col("s"), col("id"), 3, "r")
      .select("g", "id", "r").as[(Long, Long, Long)].collect().toSet
    // g=1: 9.0 first, then the 5.0s by ascending id; only 3 survive
    assert(got == Set((1L, 13L, 1L), (1L, 10L, 2L), (1L, 11L, 3L), (2L, 20L, 1L)))
  }

  test("plan shape: prune stage caps pre-shuffle rows at k per group per partition") {
    val df = spark.range(100000)
      .select((col("id") % 10).as("g"), col("id").as("id"),
        (col("id") % 997).cast("double").as("s"))
      .repartition(8)
    val topk = GroupedTopK.topK(df, Seq("g"), col("s"), col("id"), 5, "r")
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPrune") && plan.contains("TopKFinal"),
      s"expected native top-k stages in:\n$plan")
    // the exchange must sit BETWEEN prune and final (prune is map-side)
    assert(plan.indexOf("TopKFinal") < plan.indexOf("Exchange hashpartitioning") &&
      plan.indexOf("Exchange hashpartitioning") < plan.indexOf("TopKPrune"),
      s"prune must run before the shuffle:\n$plan")
    // 10 groups × 5 rows final output
    assert(topk.count() == 50)
  }

  test("TopKBuffer property: random insert order equals sort-take-k (500 trials)") {
    val rnd = new scala.util.Random(81)
    (1 to 500).foreach { trial =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(40)
      // duplicate scores likely (small range) — ties broken by unique id
      val rows = Seq.tabulate(n)(i => (rnd.nextInt(6).toDouble, i.toLong))
      val buf = new TopKBuffer(k)
      val dummy = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(0)
      rnd.shuffle(rows).foreach { case (s, t) => buf.insert(s, t, dummy) }
      val expect = rows.sortBy { case (s, t) => (-s, t) }.take(k)
      val got = (0 until buf.size).map(i => (buf.scoreAt(i), buf.tieAt(i)))
      assert(got == expect, s"trial $trial k=$k n=$n")
    }
  }

  test("a NULL score fails loudly instead of silently diverging from the window form") {
    val df = Seq((1L, 1L, Some(2.0)), (1L, 2L, None), (1L, 3L, Some(1.0)))
      .toDF("g", "id", "s")
    val e = intercept[org.apache.spark.SparkException] {
      GroupedTopK.topK(df, Seq("g"), col("s"), col("id"), 2, "r").count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(causes)
    assert(causes(e).exists(_.getMessage.contains("score and tie must be non-null")))
  }
}
