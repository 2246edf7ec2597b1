package graft

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant checks for the r6bb inline gates (the hash-exact value
  * checks live in the DuckDB oracle compare).
  */
class QueriesR15Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("group split is leak-free: every user sits in exactly one split") {
    val events = graft.sources.Tables.load(spark, dir, "events")
    val perUser = events
      .withColumn("__h", graft.sketches.Kmv.hash48(col("user_id")))
      .withColumn("__b",
        expr(s"(__h * 10) div ${graft.sketches.Kmv.HashRange}"))
      .select(col("user_id"),
        when(col("__b") < 8, "train").when(col("__b") === 8, "val")
          .otherwise("test").as("split"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(perUser.filter(col("n_splits") =!= 1).isEmpty)
    // and the report's totals reconcile with the raw table
    val rep = QueriesR15.qGroupSplit(spark, dir)
      .agg(sum(col("n_events"))).as[Long].head()
    assert(rep == events.count())
  }

  test("target encoding shrinks every class toward the global prior") {
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
    val prior = o.agg(expr("sum(v) div count(1)")).as[Long].head()
    val raw = o.groupBy(col("grp")).agg(expr("sum(v) div count(1)").as("m"))
      .as[(String, Long)].collect().toMap
    val enc = QueriesR15.qTargetEncode(spark, dir)
      .select(col("grp"), col("enc_cents")).as[(String, Long)]
      .collect().toMap
    enc.foreach { case (g, e) =>
      val lo = math.min(raw(g), prior) - 1   // floor slack
      val hi = math.max(raw(g), prior) + 1
      assert(e >= lo && e <= hi, s"$g: enc $e outside [$lo, $hi]")
    }
  }

  test("changepoint hierarchy keeps each half's split inside its half") {
    val top = graft.operators.Changepoint.binarySegment(
        graft.sources.Tables.load(spark, dir, "orders")
          .groupBy(col("o_orderpriority").as("grp"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("day"))
          .agg(count(lit(1)).as("x")),
        col("grp"), col("day"), col("x"))
      .select(col("key").as("grp"), col("split_pos").as("top_split"))
      .as[(String, Long)].collect().toMap
    val multi = QueriesR15.qChangepointMulti(spark, dir)
      .select(col("grp"), col("seg"), col("split_pos"))
      .as[(String, String, Long)].collect()
    assert(multi.nonEmpty)
    multi.foreach { case (g, seg, sp) =>
      if (seg == "L") assert(sp <= top(g), s"$g L split $sp beyond top")
      else assert(sp > top(g), s"$g R split $sp not beyond top")
    }
  }

  test("embedding drift is nonnegative and covers every label") {
    val got = QueriesR15.embedDrift(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.forall(_ >= 0L))
  }

  test("feature hashing conserves token mass per panel doc") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 97 === 0)
    val want = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val got = QueriesR15.textFeatureHash(spark, dir)
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }
}
