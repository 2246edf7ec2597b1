package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamFreqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming Misra-Gries honors the MG guarantees per key after the replay drains") {
    val k = 8
    // two keys with different hot sets; long tail of singletons
    val rows = (1L to 4000L).flatMap { i =>
      val key = if (i % 2 == 0) "even" else "odd"
      val item = if (i % 5 != 0) (i % 3) + (if (key == "even") 0L else 100L)
                 else 1000L + i // tail
      Seq((key, item))
    }
    val df = rows.toDF("key", "item")
    val out = Streams.streamingFreqItems(spark, df, k,
        queryName = s"sfreq_spec_${System.nanoTime()}")
      .as[(String, Map[Long, Long], Long)].collect()
      .map { case (key, sk, n) => key -> ((sk, n)) }.toMap

    for ((key, (sk, nSeen)) <- out) {
      val mine = rows.filter(_._1 == key)
      assert(nSeen == mine.size, s"$key absorbed $nSeen of ${mine.size}")
      val exact = mine.groupBy(_._2).map { case (it, xs) => it -> xs.size.toLong }
      val n = mine.size.toLong
      exact.foreach { case (item, cnt) =>
        if (cnt * k > n)
          assert(sk.contains(item), s"$key: heavy item $item (freq $cnt) missing")
        sk.get(item).foreach { est =>
          assert(est <= cnt && est * k >= cnt * k - n,
            s"$key: estimate $est outside [${cnt - n / k}, $cnt] for $item")
        }
      }
      assert(sk.size <= k - 1, s"$key: ${sk.size} counters exceed k-1")
    }
  }
}
