package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinhashAgreementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("identical docs agree on every component; near-dups agree high; unrelated low") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val other = "completely different words about spark shuffles and parquet readers here"
    val docs = Seq((1L, base), (2L, base), (3L, near), (4L, other),
      (5L, other + " slightly changed tail")).toDF("doc_id", "text")
    val got = Dedup.minhashAgreement(docs, col("doc_id"), col("text"),
        shingleWords = 3, k = 12, bands = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, k) => (a, b) -> ((n, k)) }.toMap

    val (n12, k12) = got((1L, 2L))
    assert(n12 == k12, "identical docs must agree on all components")
    got.get((1L, 3L)).foreach { case (n, k) =>
      assert(n >= k / 2, s"near-dup agreement $n/$k unexpectedly low")
    }
    // unrelated docs should not even be LSH candidates of the base pair
    assert(!got.contains((1L, 4L)) && !got.contains((2L, 4L)))
  }

  test("agreement count is symmetric in pair construction (id_a < id_b canonical)") {
    val docs = Seq((10L, "alpha beta gamma delta epsilon zeta eta"),
      (20L, "alpha beta gamma delta epsilon zeta theta")).toDF("doc_id", "text")
    val rows = Dedup.minhashAgreement(docs, col("doc_id"), col("text"), 3, 12, 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall { case (a, b, _, _) => a < b })
  }
}
