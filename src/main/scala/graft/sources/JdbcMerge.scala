package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame

/** Database-side CDC apply: stage the delta with a batched JDBC write, then
  * run a single set-based MERGE inside the target database — the
  * reference's exact flow (scripts/03_cdc_etl.py:98-172) for targets that
  * are themselves RDBMSes. Complements [[graft.cdc.Cdc.mergeSoftDelete]]
  * (the in-Spark merge for lakehouse targets).
  *
  * The MERGE text is dialect-aware: Oracle guards the insert with
  * `WHERE s.IS_DELETED = 'N'` after VALUES (reference :153-156), Derby
  * (and the SQL standard) guard with `WHEN NOT MATCHED AND cond`.
  */
object JdbcMerge {
  sealed trait Dialect
  case object OracleDialect extends Dialect
  case object StandardDialect extends Dialect // Derby, Postgres 15+, ANSI

  /** The reference's MERGE with soft delete (03_cdc_etl.py:129-157):
    * matched rows take all staged non-PK values including the delete flag;
    * unmatched staged rows insert only when not soft-deleted.
    */
  def mergeSoftDeleteSql(target: String, staging: String, pk: Seq[String],
                         cols: Seq[String], isDeletedCol: String = "IS_DELETED",
                         dialect: Dialect = StandardDialect): String = {
    val onClause = pk.map(c => s"t.$c = s.$c").mkString(" AND ")
    val nonPk = cols.filterNot(pk.contains)
    val setList = nonPk.map(c => s"t.$c = s.$c").mkString(", ")
    val colsCsv = cols.mkString(", ")
    val valsCsv = cols.map(c => s"s.$c").mkString(", ")
    dialect match {
      case OracleDialect =>
        s"""MERGE INTO $target t
           |USING (SELECT * FROM $staging) s
           |  ON ($onClause)
           |WHEN MATCHED THEN
           |  UPDATE SET $setList
           |WHEN NOT MATCHED THEN
           |  INSERT ($colsCsv) VALUES ($valsCsv)
           |  WHERE s.$isDeletedCol = 'N'""".stripMargin
      case StandardDialect =>
        s"""MERGE INTO $target t
           |USING $staging s
           |  ON $onClause
           |WHEN MATCHED THEN
           |  UPDATE SET $setList
           |WHEN NOT MATCHED AND s.$isDeletedCol = 'N' THEN
           |  INSERT ($colsCsv) VALUES ($valsCsv)""".stripMargin
    }
  }

  /** Stage a delta DataFrame into `staging` (truncate-then-batch-append,
    * reference :98-120) and merge it into `target` database-side.
    * Returns rows affected by the MERGE.
    */
  def stageAndMerge(delta: DataFrame, conn: Jdbc.Conn, target: String, staging: String,
                    pk: Seq[String], batchSize: Int = 5000,
                    dialect: Dialect = StandardDialect): Int = {
    val cols = delta.columns.toSeq
    execute(conn, s"DELETE FROM $staging") // TRUNCATE needs no-txn in some DBs
    Jdbc.write(delta, conn, staging, batchSize)
    executeUpdate(conn, mergeSoftDeleteSql(target, staging, pk, cols, dialect = dialect))
  }

  def execute(c: Jdbc.Conn, sql: String): Unit = { executeUpdate(c, sql); () }

  def executeUpdate(c: Jdbc.Conn, sql: String): Int = {
    if (c.driver.nonEmpty) Class.forName(c.driver)
    val conn =
      if (c.user.nonEmpty) DriverManager.getConnection(c.url, c.user, c.password)
      else DriverManager.getConnection(c.url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }
}
