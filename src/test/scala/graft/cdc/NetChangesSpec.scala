package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C35 batch squash + X36 streaming twin. */
class NetChangesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val chains = Seq(
    // key 1: I -> U -> D inside the window = NOOP
    (1L, 10L, "I", 100L), (1L, 11L, "U", 110L), (1L, 12L, "D", 0L),
    // key 2: I -> U -> U = INSERT with the LAST payload
    (2L, 20L, "I", 200L), (2L, 21L, "U", 210L), (2L, 22L, "U", 220L),
    // key 3: U -> D = DELETE, payload null
    (3L, 30L, "U", 300L), (3L, 31L, "D", 0L),
    // key 4: U -> U = UPDATE with the last payload
    (4L, 40L, "U", 400L), (4L, 41L, "U", 410L),
    // key 5: lone delete
    (5L, 50L, "D", 0L))

  private def runBatch(rows: Seq[(Long, Long, String, Long)]) =
    Cdc.netChanges(rows.toDF("key", "seq", "op", "payload"),
        col("key"), col("seq"), col("op"), col("payload"))
      .as[(Long, Long, String, String, String, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._5, r._6))).toMap

  test("squash: the four net rules with last-payload semantics") {
    val got = runBatch(chains)
    assert(got(1L) == ((3L, "NOOP", None)))
    assert(got(2L) == ((3L, "INSERT", Some(220L))))
    assert(got(3L) == ((2L, "DELETE", None)))
    assert(got(4L) == ((2L, "UPDATE", Some(410L))))
    assert(got(5L) == ((1L, "DELETE", None)))
  }

  test("squash: decision depends on sequence order, not arrival order") {
    val shuffled = new scala.util.Random(7).shuffle(chains)
    assert(runBatch(shuffled) == runBatch(chains))
  }

  test("streaming squash equals batch bit-for-bit on shuffled arrivals") {
    val shuffled = new scala.util.Random(11).shuffle(chains)
    val got = graft.streaming.Streams.streamingNetChanges(spark,
        shuffled.toDF("key", "seq", "op", "payload"),
        queryName = s"snetchg_spec_${System.nanoTime()}")
      .as[(Long, Long, String, String, String, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._5, r._6))).toMap
    assert(got == runBatch(chains))
  }
}
