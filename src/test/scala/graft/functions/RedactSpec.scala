package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(s: String): (String, Long, Long) =
    Seq(s).toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiEmailCount(col("t")).as("ne"),
        TextFunctions.piiPhoneCount(col("t")).as("np"))
      .as[(String, Long, Long)].collect().head

  test("emails and phone fragments are replaced with typed placeholders") {
    val (r, ne, np) = redactOne("contact bob.smith+x@sub.example.co or 555-0142 now")
    assert(r == "contact <EMAIL> or <PHONE> now")
    assert(ne == 1L && np == 1L)
  }

  test("multiple occurrences are all replaced (global, not first-match)") {
    val (r, ne, np) = redactOne("a@b.com c@d.org 111-2222 333-4444")
    assert(r == "<EMAIL> <EMAIL> <PHONE> <PHONE>")
    assert(ne == 2L && np == 2L)
  }

  test("plain prose and near-misses survive untouched") {
    val cases = Seq(
      "no pii here at all",
      "version 1.2-3456 is not a phone", // boundary: digits-dash-digits but 1.2 prefix
      "at sign alone @ stays",
      "ranges like 10-20 stay")
    cases.foreach { s =>
      val (r, ne, np) = redactOne(s)
      assert(r == s, s"mangled: '$s' -> '$r'")
      assert(ne == 0L && np == 0L)
    }
  }

  test("word boundaries keep longer digit runs out of the phone pattern") {
    // 1234-5678: \b...{3}-{4}\b does not match inside a 4-digit prefix
    val (r, _, np) = redactOne("serial 1234-5678 stays")
    assert(r == "serial 1234-5678 stays" && np == 0L)
  }
}
