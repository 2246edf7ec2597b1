package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Real JDBC round-trip against embedded Derby (in /opt/spark/jars) — the
  * closest in-container stand-in for the reference's Oracle source/sink.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val conn = Jdbc.Conn(
    url = s"jdbc:derby:memory:graftdb;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("write then read round-trips rows (batched sink, fetchsize source)") {
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    Jdbc.write(df, conn, "t_roundtrip", batchSize = 2)
    val back = Jdbc.read(spark, conn, "t_roundtrip", fetchSize = 2)
    assert(back.count() == 3)
    assert(back.select("id", "name", "amount").as[(Long, String, Double)]
      .collect().toSet == Set((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 30.0)))
  }

  test("partitioned parallel read splits the key range") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Jdbc.write(df, conn, "t_part")
    val back = Jdbc.readPartitioned(spark, conn, "t_part",
      partitionColumn = "id", lowerBound = 1, upperBound = 101, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
  }

  test("filters push down into the database query, not a post-scan filter") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("id", "amount")
    Jdbc.write(df, conn, "t_push")
    val q = Jdbc.read(spark, conn, "t_push").filter(col("id") > 40)
    // JDBCRelation reports its pushed predicates in the scan node — the
    // WHERE clause ships to the database (Oracle at the reference; Derby
    // here) instead of filtering 100 TB post-transfer
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("id"),
      s"expected id predicate in PushedFilters: ${scan.metadata}")
    assert(q.count() == 10)
  }
}
