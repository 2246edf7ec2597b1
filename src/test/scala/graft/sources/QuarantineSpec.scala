package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** F12: permissive ingest with corrupt-record quarantine. */
class QuarantineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", LongType),
    StructField("name", StringType)))

  test("csv: torn and mistyped lines quarantine with their raw text") {
    val dir = java.nio.file.Files.createTempDirectory("quar_csv").toFile
    val f = new java.io.File(dir, "part.csv")
    java.nio.file.Files.writeString(f.toPath,
      """id,qty,name
        |1,10,alpha
        |2,notanumber,beta
        |3,30,gamma
        |""".stripMargin)
    val (clean, quar) = Sink.readQuarantine(spark, f.getPath, "csv", schema)
    assert(clean.orderBy("id").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 10L, "alpha"), (3L, 30L, "gamma")))
    val bad = quar.as[String].collect().toSeq
    assert(bad == Seq("2,notanumber,beta"),
      "quarantine keeps the RAW line for repair-and-replay")
  }

  test("json: malformed documents quarantine; valid ones flow through") {
    val dir = java.nio.file.Files.createTempDirectory("quar_json").toFile
    val f = new java.io.File(dir, "part.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"id": 1, "qty": 10, "name": "alpha"}
        |{"id": 2, "qty": BROKEN
        |{"id": 3, "qty": 30, "name": "gamma"}
        |""".stripMargin)
    val (clean, quar) = Sink.readQuarantine(spark, f.getPath, "json", schema)
    assert(clean.orderBy("id").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 10L, "alpha"), (3L, 30L, "gamma")))
    assert(quar.as[String].collect().toSeq == Seq("""{"id": 2, "qty": BROKEN"""))
  }

  test("a fully clean file quarantines nothing") {
    val dir = java.nio.file.Files.createTempDirectory("quar_ok").toFile
    val f = new java.io.File(dir, "part.csv")
    java.nio.file.Files.writeString(f.toPath, "id,qty,name\n7,70,eta\n")
    val (clean, quar) = Sink.readQuarantine(spark, f.getPath, "csv", schema)
    assert(clean.count() == 1 && quar.count() == 0)
  }

  test("columnar formats are rejected (quarantine is a row-format seam)") {
    intercept[IllegalArgumentException] {
      Sink.readQuarantine(spark, "/tmp/nope", "parquet", schema)
    }
  }
}
