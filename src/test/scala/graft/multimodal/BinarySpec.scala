package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("extractMeta decodes in one codegen'd projection with typed schema") {
    val df = Seq((1L, "abc"), (2L, "x" * 700)).toDF("id", "t")
      .select(col("id"), encode(col("t"), "UTF-8").as("payload"))
    val meta = Binary.extractMeta(df, "id", "payload")
    val got = meta.orderBy("id").as[(Long, Long, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 4, 4, 3),        // 3 bytes → width 3%640+1, height 3%480+1
      (2L, 700L, 61, 221, 3)))  // 700%640+1=61, 700%480+1=221
    // the decode is an expression inside the scan stage — no RDD
    // round-trip (Scan ExistingRDD) and no object (de)serialization
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("DeserializeToObject"),
      s"decode must stay columnar/codegen:\n$plan")
  }

  test("sampleFrames strides the payload with a frame cap") {
    val df = Seq((1L, "a" * 200)).toDF("id", "t")
      .select(col("id"), encode(col("t"), "UTF-8").as("payload"))
    val frames = Binary.sampleFrames(df, "payload", stride = 64, maxFrames = 4)
      .select("frame_idx", "frame_offset").as[(Int, Int)].collect().toSeq
    assert(frames == Seq((0, 0), (1, 64), (2, 128), (3, 192))) // ceil(200/64)=4
  }
}
