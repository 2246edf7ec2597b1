package graft.cdc

import graft.SparkTestSession
import graft.sources.{Jdbc, JdbcMerge}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's full architecture end-to-end on real JDBC databases:
  * Derby "source" with CDC columns → watermark delta → staging table in
  * the Derby "target" → DB-side MERGE with soft delete → watermark
  * advance, FK-ordered, target tables cloned from source schema on first
  * contact. Two incremental runs, exactly like scripts/01→02→03.
  */
class JdbcPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val src = Jdbc.Conn(url = "jdbc:derby:memory:graftpipe_src;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")
  val tgt = Jdbc.Conn(url = "jdbc:derby:memory:graftpipe_tgt;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def ts(s: String) = s"TIMESTAMP('$s')"

  test("Derby-to-Derby: clone, full load, incremental merge, watermark advance") {
    // 01_prepare_cdc_columns: source tables carry CREATED_AT/UPDATED_AT/IS_DELETED
    JdbcMerge.execute(src,
      """CREATE TABLE CUSTOMER (ID BIGINT PRIMARY KEY, NAME VARCHAR(64),
        | CREATED_AT TIMESTAMP, UPDATED_AT TIMESTAMP, IS_DELETED CHAR(1))""".stripMargin)
    JdbcMerge.execute(src,
      """CREATE TABLE ORDERS (ID BIGINT PRIMARY KEY, CUST_ID BIGINT, AMT BIGINT,
        | CREATED_AT TIMESTAMP, UPDATED_AT TIMESTAMP, IS_DELETED CHAR(1))""".stripMargin)
    JdbcMerge.execute(src, s"INSERT INTO CUSTOMER VALUES " +
      s"(1, 'alice', ${ts("2024-01-01 10:00:00")}, NULL, 'N'), " +
      s"(2, 'bob',   ${ts("2024-01-01 11:00:00")}, NULL, 'N')")
    JdbcMerge.execute(src, s"INSERT INTO ORDERS VALUES " +
      s"(10, 1, 100, ${ts("2024-01-01 12:00:00")}, NULL, 'N'), " +
      s"(11, 2, 250, ${ts("2024-01-01 13:00:00")}, NULL, 'N')")

    val tables = Seq(
      Pipeline.TableSpec("CUSTOMER", Seq("ID")),
      Pipeline.TableSpec("ORDERS", Seq("ID")))
    val fk = Seq("CUSTOMER" -> "ORDERS") // parent → child

    // run 1: no watermarks = full load; target tables cloned on the fly
    val (r1, wm1) = Pipeline.replicateJdbc(spark, tables, fk, src, tgt, Map.empty)
    assert(r1.failed == 0 && r1.processed == 2,
      r1.results.map(x => s"${x.table}: ${x.error}").mkString("; "))
    assert(Jdbc.read(spark, tgt, "CUSTOMER").count() == 2)
    assert(Jdbc.read(spark, tgt, "ORDERS").count() == 2)
    assert(wm1.keySet == Set("CUSTOMER", "ORDERS"))

    // source mutations after the watermark: update, insert, soft delete
    JdbcMerge.execute(src,
      s"UPDATE CUSTOMER SET NAME = 'bob2', UPDATED_AT = ${ts("2024-01-02 09:00:00")} WHERE ID = 2")
    JdbcMerge.execute(src, s"INSERT INTO CUSTOMER VALUES " +
      s"(3, 'carol', ${ts("2024-01-02 10:00:00")}, NULL, 'N')")
    JdbcMerge.execute(src,
      s"UPDATE ORDERS SET IS_DELETED = 'Y', UPDATED_AT = ${ts("2024-01-02 11:00:00")} WHERE ID = 10")
    JdbcMerge.execute(src, s"INSERT INTO ORDERS VALUES " +
      s"(12, 3, 75, ${ts("2024-01-02 12:00:00")}, NULL, 'N')")

    // run 2: only the delta moves; merge applies update/insert/soft-delete
    val (r2, wm2) = Pipeline.replicateJdbc(spark, tables, fk, src, tgt, wm1)
    assert(r2.failed == 0, r2.summary)
    assert(r2.totalRows == 4, s"delta should be 2 customers + 2 orders: ${r2.summary}")

    import spark.implicits._
    val cust = Jdbc.read(spark, tgt, "CUSTOMER")
      .select("ID", "NAME", "IS_DELETED").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(cust == Seq((1L, "alice", "N"), (2L, "bob2", "N"), (3L, "carol", "N")))
    val ords = Jdbc.read(spark, tgt, "ORDERS")
      .select("ID", "IS_DELETED").as[(Long, String)].collect().sortBy(_._1).toSeq
    // order 10 soft-deleted IN PLACE (flag flips, row retained); 12 inserted
    assert(ords == Seq((10L, "Y"), (11L, "N"), (12L, "N")))
    assert(wm2("CUSTOMER").after(wm1("CUSTOMER")) && wm2("ORDERS").after(wm1("ORDERS")))

    // run 3: nothing changed → no_changes everywhere, watermarks stable
    val (r3, wm3) = Pipeline.replicateJdbc(spark, tables, fk, src, tgt, wm2)
    assert(r3.noChanges == 2 && r3.processed == 0, r3.summary)
    assert(wm3 == wm2)
  }

  test("zero-config: discover tables/PKs/FKs from metadata, prep CDC columns, replicate") {
    val dsrc = Jdbc.Conn(url = "jdbc:derby:memory:graftdisc_src;create=true",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val dtgt = Jdbc.Conn(url = "jdbc:derby:memory:graftdisc_tgt;create=true",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    // bare business tables with real FK constraints, NO CDC columns yet
    JdbcMerge.execute(dsrc,
      "CREATE TABLE DEPT (ID BIGINT PRIMARY KEY, NAME VARCHAR(32))")
    JdbcMerge.execute(dsrc,
      """CREATE TABLE EMP (ID BIGINT PRIMARY KEY, DEPT_ID BIGINT,
        | CONSTRAINT FK_EMP_DEPT FOREIGN KEY (DEPT_ID) REFERENCES DEPT(ID))""".stripMargin)

    // 01_prepare_cdc_columns: metadata-driven ALTERs, idempotent
    assert(Jdbc.ensureCdcColumns(dsrc, "DEPT") ==
      Seq("CREATED_AT", "UPDATED_AT", "IS_DELETED"))
    assert(Jdbc.ensureCdcColumns(dsrc, "DEPT").isEmpty, "second run adds nothing")
    Jdbc.ensureCdcColumns(dsrc, "EMP")
    // defaults fill CREATED_AT / IS_DELETED on insert, like the reference's DDL
    JdbcMerge.execute(dsrc, "INSERT INTO DEPT (ID, NAME) VALUES (1, 'eng')")
    JdbcMerge.execute(dsrc, "INSERT INTO EMP (ID, DEPT_ID) VALUES (7, 1)")

    // discovery: tables, PKs, FK edges straight from JDBC metadata
    assert(Jdbc.listTables(dsrc, "APP") == Seq("DEPT", "EMP"))
    assert(Jdbc.primaryKeys(dsrc, "EMP") == Seq("ID"))
    assert(Jdbc.foreignKeys(dsrc, Seq("DEPT", "EMP")) == Seq(("DEPT", "EMP")))

    // the reference's whole main(): two connections in, replica out
    val (rep, wm) = Pipeline.discoverAndReplicate(spark, dsrc, dtgt, Map.empty,
      schema = "APP")
    assert(rep.failed == 0 && rep.processed == 2, rep.summary)
    assert(rep.results.map(_.table) == Seq("DEPT", "EMP"), "parent before child")
    assert(Jdbc.read(spark, dtgt, "DEPT").count() == 1)
    assert(Jdbc.read(spark, dtgt, "EMP").count() == 1)
    assert(wm.keySet == Set("DEPT", "EMP"))
  }

  test("ensureJdbcTable honors credentials and a driver-manager-registered URL") {
    // empty driver string (JDBC 4 SPI autoload) + user/password: the DDL
    // path must use the same credentialed connection helper as discovery —
    // pre-fix it threw ClassNotFoundException("") and ignored credentials.
    val cred = Jdbc.Conn(url = "jdbc:derby:memory:graftcred;create=true",
      user = "APP", password = "any")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ID",
        org.apache.spark.sql.types.LongType, nullable = false)))
    Pipeline.ensureJdbcTable(cred, "CRED_T", schema, Seq("ID"))
    Pipeline.ensureJdbcTable(cred, "CRED_T", schema, Seq("ID")) // idempotent
    assert(Jdbc.read(spark, cred, "CRED_T").count() == 0)
  }
}
