package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T38 (r12): PII scrubbing — pattern edges (what must and must NOT
  * match) and the progressive-count contract.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(s: String): (String, Long, Long, Long) = {
    val r = Seq(s).toDF("t").select(
      Pii.redact(col("t")).as("red"),
      Pii.countEmails(col("t")).cast("long"),
      Pii.countIps(col("t")).cast("long"),
      Pii.countPhones(col("t")).cast("long")).head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("each class redacts and counts") {
    assert(run("mail a.b+c@sub.ex.org now") ==
      (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(run("host 192.168.0.1 up") == (("host <IP> up", 0L, 1L, 0L)))
    assert(run("call 415-555-0199.") == (("call <PHONE>.", 0L, 0L, 1L)))
    assert(run("x@y.io and u@v.co 10.0.0.7 415-555-0000") ==
      (("<EMAIL> and <EMAIL> <IP> <PHONE>", 2L, 1L, 1L)))
  }

  test("non-PII lookalikes survive") {
    // version strings: no 4-octet \b match inside 1.2.3.4.5? The first
    // four octets DO match with \b at '1' and after '4' — that is the
    // stated (and industry-standard) over-approximation; but a 3-part
    // version must NOT match
    assert(run("v1.2.3 released") == (("v1.2.3 released", 0L, 0L, 0L)))
    // no TLD, no match
    assert(run("user@localhost only") == (("user@localhost only", 0L, 0L, 0L)))
    // digits glued to more digits fail \b phone shape
    assert(run("id 1415-555-01999") == (("id 1415-555-01999", 0L, 0L, 0L)))
  }

  test("progressive counts: an email's IP-shaped host is one email, zero IPs") {
    // host 10.1.2.3.io satisfies the email pattern (letter TLD) AND
    // contains an IP-shaped run — progressive counting must attribute
    // it to the email alone; the bare IP later still counts
    val (red, ne, ni, np) = run("u@10.1.2.3.io pinged 10.1.2.3")
    assert(red == "<EMAIL> pinged <IP>")
    assert((ne, ni, np) == ((1L, 1L, 0L)),
      "the host inside the email must not double-count as an IP")
    // a digit-TLD "email" is NOT an email by the pattern — its IP run
    // redacts as an IP instead (the stated contract)
    assert(run("root@10.1.2.3 up") == (("root@<IP> up", 0L, 1L, 0L)))
  }

  test("placeholders never re-match later passes") {
    val (red, _, _, _) = run("a@b.io 1.2.3.4 111-222-3333")
    assert(red == "<EMAIL> <IP> <PHONE>")
  }
}
