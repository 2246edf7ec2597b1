package graft.operators

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's co-location claim, demonstrated: two tables bucketed on the
  * join key join WITHOUT a shuffle exchange on either side. At 100 TB this
  * is the difference between a merge of pre-sorted buckets and re-shuffling
  * both fact tables on every join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed-by-key tables join with zero Exchange nodes") {
    // warehouse dir is a static conf, set tmp-side by GraftSession
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bkt_l")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bkt_r")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}
