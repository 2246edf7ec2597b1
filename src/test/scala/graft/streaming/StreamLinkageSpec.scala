package graft.streaming

import graft.SparkTestSession
import graft.operators.Linkage
import graft.operators.Linkage.FieldCmp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** X28: streaming linkage scoring ≡ the batch D16 pass. */
class StreamLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed decisions equal the batch scoring, no duplicate pairs") {
    val recs = Seq((1L, "A", 10L), (2L, "A", 12L), (3L, "A", 900L),
      (4L, "B", 10L), (5L, "B", 11L))
      .toDF("id", "blk", "v")
    val a = recs.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = recs.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    val fields = Seq(FieldCmp("close", abs(col("v_a") - col("v_b")) <= 5L,
      3000L, -1000L))
    def stage(pairs: org.apache.spark.sql.DataFrame) =
      Linkage.score(pairs.filter(col("id_a") < col("id_b")), fields,
          matchMilli = 3000L, possibleMilli = 0L)
        .select(col("id_a"), col("id_b"), col("match_score"), col("decision"))
    val batch = stage(a.join(b, Seq("blk")))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, String)].collect().toSeq
    val stream = Streams.streamingLinkage(spark, b, a, "blk", stage,
        queryName = "slinkage_spec")
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(stream == batch)
    assert(stream.map(r => (r._1, r._2)).distinct.size == stream.size,
      "each unordered pair decided exactly once")
    assert(stream.exists(_._4 == "match"), "fixture produces matches")
  }
}
