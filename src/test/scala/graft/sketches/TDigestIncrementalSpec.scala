package graft.sketches

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TDigestIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("persisted digest states merge into the same rank accuracy as one pass") {
    val rnd = new scala.util.Random(59)
    val rows = Seq.fill(20000)(("k" + rnd.nextInt(3), rnd.nextDouble() * 1000))
      .toDF("key", "v")
    val store = java.nio.file.Files.createTempDirectory("td_inc_spec").toString

    def states(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("key").agg(TDigest.digestState(col("v")).as("sk"))

    // "day 1" persisted, "day 2" merged in without re-reading day 1 rows
    val Array(day1, day2) = rows.randomSplit(Array(0.5, 0.5), seed = 7)
    states(day1).write.mode("overwrite").parquet(store)
    val est = spark.read.parquet(store).unionByName(states(day2))
      .groupBy("key")
      .agg(TDigest.mergeQuantiles(col("sk"), Seq(0.1, 0.5, 0.9)).as("qs"))
      .as[(String, Seq[Double])].collect().toMap

    val all = rows.as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for ((key, qs) <- est; (q, target) <- qs.zip(Seq(0.1, 0.5, 0.9))) {
      val vs = all(key)
      val rank = vs.count(_ <= q).toDouble / vs.length
      assert(math.abs(rank - target) < 0.02,
        s"$key: estimate $q ranks at $rank, target $target")
    }
  }

  test("state round-trips parquet unchanged (struct schema is the contract)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("key", "v")
    val st = df.groupBy("key").agg(TDigest.digestState(col("v")).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("td_rt_spec").toString
    st.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val merged = back.groupBy("key")
      .agg(TDigest.mergeQuantiles(col("sk"), Seq(0.5)).as("qs"))
      .as[(String, Seq[Double])].collect().toMap
    assert(merged("a").head >= 1.0 && merged("a").head <= 2.0)
    assert(merged("b").head == 3.0)
  }
}
