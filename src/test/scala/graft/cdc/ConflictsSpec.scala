package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C33: multi-master conflict detection + deterministic LWW resolution. */
class ConflictsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (pk, ts, seq, source)
  private def detect(rows: Seq[(Long, Long, Long, String)]) =
    Cdc.detectConflicts(rows.toDF("pk", "ts", "seq", "src"),
        col("pk"), col("ts"), col("seq"), col("src"), bucketSec = 100L)
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("conflict only when both sources hit the same key and bucket") {
    val got = detect(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),   // same bucket: conflict
      (2L, 10L, 3L, "a"), (2L, 150L, 4L, "b"),  // different buckets
      (3L, 30L, 5L, "a"), (3L, 40L, 6L, "a"))) // same source twice
    assert(got((1L, 0L)) == ((1L, 1L, true, 2L)))
    assert(got((2L, 0L)) == ((1L, 0L, false, 3L)))
    assert(got((2L, 1L)) == ((0L, 1L, false, 4L)))
    assert(got((3L, 0L)) == ((2L, 0L, false, 6L)))
  }

  test("last-writer-wins on ts; seq breaks exact-timestamp ties") {
    val got = detect(Seq(
      (1L, 50L, 9L, "a"), (1L, 60L, 3L, "b"),   // later ts wins despite lower seq
      (2L, 70L, 5L, "a"), (2L, 70L, 8L, "b"))) // tie on ts -> higher seq wins
    assert(got((1L, 0L)) == ((1L, 1L, true, 3L)))
    assert(got((2L, 0L)) == ((1L, 1L, true, 8L)))
  }

  test("replay order never changes the winner (order-free aggregate)") {
    val rows = Seq((1L, 10L, 1L, "a"), (1L, 99L, 2L, "b"), (1L, 50L, 3L, "a"))
    assert(detect(rows) == detect(rows.reverse))
  }

  test("out-of-domain (ts, seq) fails loudly instead of aliasing the winner") {
    // epoch-millisecond timestamp (~1.7e12 > 9.2e10 guard)
    val millis = intercept[Exception](
      detect(Seq((1L, 1700000000000L, 1L, "a"))))
    assert(millis.getMessage.contains("exact-packing domain"))
    // seq at 1e8 would collide with the next ts unit
    val bigSeq = intercept[Exception](
      detect(Seq((1L, 10L, 100000000L, "a"))))
    assert(bigSeq.getMessage.contains("exact-packing domain"))
  }
}
