package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Database-side staging + MERGE against embedded Derby — the reference's
  * Oracle-target flow end-to-end on a real JDBC database.
  */
class JdbcMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val conn = Jdbc.Conn(
    url = "jdbc:derby:memory:graftmerge;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("stage + MERGE applies update, insert, and soft delete in-database") {
    JdbcMerge.execute(conn,
      "CREATE TABLE T_CUST (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), IS_DELETED CHAR(1))")
    JdbcMerge.execute(conn,
      "CREATE TABLE STG_CUST (ID BIGINT, NAME VARCHAR(64), IS_DELETED CHAR(1))")
    JdbcMerge.execute(conn, "INSERT INTO T_CUST VALUES (1, 'alice', 'N'), (2, 'bob', 'N')")

    val delta = Seq(
      (2L, "bob2", "N"),   // update
      (3L, "carol", "N"),  // insert
      (4L, "dave", "Y"),   // deleted before ever seen → NOT inserted
      (1L, "alice", "Y"))  // soft delete in place
      .toDF("ID", "NAME", "IS_DELETED")

    val affected = JdbcMerge.stageAndMerge(delta, conn, "T_CUST", "STG_CUST", pk = Seq("ID"))
    assert(affected == 3) // 2 updates + 1 insert; dave filtered by the guard

    val back = Jdbc.read(spark, conn, "T_CUST")
      .orderBy("ID").as[(Long, String, String)].collect().toSeq
    assert(back == Seq((1L, "alice", "Y"), (2L, "bob2", "N"), (3L, "carol", "N")))
  }

  test("oracle dialect emits the reference's insert-guard form") {
    val sql = JdbcMerge.mergeSoftDeleteSql("T", "S", Seq("ID"),
      Seq("ID", "V", "IS_DELETED"), dialect = JdbcMerge.OracleDialect)
    assert(sql.contains("WHEN NOT MATCHED THEN"))
    assert(sql.contains("WHERE s.IS_DELETED = 'N'"))
    assert(sql.contains("USING (SELECT * FROM S) s"))
  }
}
