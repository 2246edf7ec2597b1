package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** T24: training-mixture materialization. */
class MixtureSelectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def select(rows: Seq[(String, Long, Long)],
                     budgets: Map[String, Long]): Seq[(String, Long, Long)] = {
    val df = rows.toDF("source", "doc_id", "n_tokens")
      .withColumn("budget",
        coalesce(budgets.foldLeft(lit(null).cast("long")) {
          case (acc, (s, b)) => when(col("source") === s, b).otherwise(acc)
        }, lit(0L)))
    Sampling.mixtureSelect(df, col("source"), col("doc_id"),
        col("n_tokens"), col("budget"))
      .select(col("source"), col("doc_id"), col("cum_before"))
      .orderBy("source", "cum_before")
      .as[(String, Long, Long)].collect().toSeq
  }

  test("budget is met: the crossing document is included, the next is not") {
    // one source, 4 docs of 100 tokens, budget 250 -> exactly 3 selected
    // (0, 100, 200 cumulative; the doc starting at 200 crosses 250)
    val rows = (1L to 4L).map(i => ("a", i, 100L))
    val got = select(rows, Map("a" -> 250L))
    assert(got.size == 3)
    assert(got.map(_._3) == Seq(0L, 100L, 200L))
  }

  test("zero budget selects nothing; oversized budget selects everything") {
    val rows = Seq(("a", 1L, 50L), ("a", 2L, 50L), ("b", 3L, 50L))
    assert(select(rows, Map("a" -> 0L, "b" -> 0L)).isEmpty)
    assert(select(rows, Map("a" -> 9999L, "b" -> 9999L)).size == 3)
  }

  test("selection order is md5(id), not id: stable but hash-shuffled") {
    // budget of 1 token picks exactly ONE doc per source — the md5-least
    // id, which for ids 1..5 is not id 1 (md5('1') doesn't sort first)
    val rows = (1L to 5L).map(i => ("a", i, 100L))
    val got = select(rows, Map("a" -> 1L))
    assert(got.size == 1)
    val md5First = (1L to 5L).minBy { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got.head._2 == md5First)
  }

  test("sources fill independently") {
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 100L),
      ("b", 3L, 100L), ("b", 4L, 100L))
    val got = select(rows, Map("a" -> 150L, "b" -> 50L))
    assert(got.count(_._1 == "a") == 2 && got.count(_._1 == "b") == 1)
  }
}
