package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the Spark-native form of the reference's Oracle
  * reads/writes (scripts/03_cdc_etl.py:227-232 fetchsize read, :309-319
  * batchsize staging write).
  *
  * Scale posture: a plain JDBC read is a single connection; `readPartitioned`
  * splits the table into `numPartitions` range predicates on a numeric key so
  * 1000 executors pull in parallel, and Catalyst pushes filters/projections
  * into the generated SQL. Writes go per-partition with JDBC batch inserts.
  */
object Jdbc {
  final case class Conn(url: String, user: String = "", password: String = "",
                        driver: String = "")

  private def base(spark: SparkSession, c: Conn) = {
    var r = spark.read.format("jdbc").option("url", c.url)
    if (c.user.nonEmpty) r = r.option("user", c.user).option("password", c.password)
    if (c.driver.nonEmpty) r = r.option("driver", c.driver)
    r
  }

  /** Single-stream read with cursor fetchsize (reference READ_FETCHSIZE). */
  def read(spark: SparkSession, c: Conn, table: String, fetchSize: Int = 10000): DataFrame =
    base(spark, c).option("dbtable", table).option("fetchsize", fetchSize.toString).load()

  /** Range-partitioned parallel read over a numeric column — the 100 TB
    * path: each executor issues its own bounded query.
    */
  def readPartitioned(spark: SparkSession, c: Conn, table: String, partitionColumn: String,
                      lowerBound: Long, upperBound: Long, numPartitions: Int,
                      fetchSize: Int = 10000): DataFrame =
    base(spark, c).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", fetchSize.toString)
      .load()

  /** Batched append write (reference WRITE_BATCHSIZE staging load). */
  def write(df: DataFrame, c: Conn, table: String, batchSize: Int = 5000,
            mode: SaveMode = SaveMode.Append): Unit = {
    var w = df.write.format("jdbc").option("url", c.url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
    if (c.user.nonEmpty) w = w.option("user", c.user).option("password", c.password)
    if (c.driver.nonEmpty) w = w.option("driver", c.driver)
    w.mode(mode).save()
  }

  // ── schema discovery (reference utils/database.py) via DatabaseMetaData ──

  /** Raw connection with the Conn's credentials and an optional driver
    * class (driver-manager-registered URLs need none). Shared with
    * Pipeline's DDL path so every code path honors user/password.
    */
  private[graft] def withConnection[T](c: Conn)(f: java.sql.Connection => T): T = {
    if (c.driver.nonEmpty) Class.forName(c.driver)
    val conn =
      if (c.user.nonEmpty) java.sql.DriverManager.getConnection(c.url, c.user, c.password)
      else java.sql.DriverManager.getConnection(c.url)
    try f(conn) finally conn.close()
  }

  /** User tables of the connection's default schema — `list_tables`
    * (utils/database.py:17-30). Excluded like the reference: staging
    * tables, Oracle recycle-bin entries (`BIN$...` — dropped tables that
    * still appear in metadata), and temporary tables where the driver
    * reports the distinction (Derby/most RDBMS surface them under a
    * separate JDBC table type, so requesting only "TABLE" covers it).
    */
  def listTables(c: Conn, schema: String = null): Seq[String] =
    withConnection(c) { conn =>
      val rs = conn.getMetaData.getTables(null, schema, "%", Array("TABLE"))
      val out = scala.collection.mutable.ListBuffer[String]()
      while (rs.next()) out += rs.getString("TABLE_NAME")
      rs.close()
      out.toSeq
        .filterNot(_.toUpperCase.startsWith("STG_"))
        .filterNot(_.startsWith("BIN$"))
        .sorted
    }

  /** Primary-key columns in key order — `get_pk_columns`
    * (utils/database.py:57-72).
    */
  def primaryKeys(c: Conn, table: String): Seq[String] =
    withConnection(c) { conn =>
      val rs = conn.getMetaData.getPrimaryKeys(null, null, table.toUpperCase)
      val out = scala.collection.mutable.ListBuffer[(Short, String)]()
      while (rs.next()) out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
      rs.close()
      out.sortBy(_._1).map(_._2).toSeq
    }

  /** FK edges (parentTable, childTable) among `tables` —
    * `get_fk_relationships` (utils/database.py:86-109), the input to the
    * topological load order.
    */
  def foreignKeys(c: Conn, tables: Seq[String]): Seq[(String, String)] =
    withConnection(c) { conn =>
      val tset = tables.map(_.toUpperCase).toSet
      val out = scala.collection.mutable.ListBuffer[(String, String)]()
      tables.foreach { t =>
        val rs = conn.getMetaData.getImportedKeys(null, null, t.toUpperCase)
        while (rs.next()) {
          val parent = rs.getString("PKTABLE_NAME")
          if (tset.contains(parent.toUpperCase)) out += ((parent, t))
        }
        rs.close()
      }
      out.distinct.toSeq.sorted
    }

  /** Add any missing CDC tracking columns in-database — the
    * 01_prepare_cdc_columns script (ALTER TABLE ADD per missing column,
    * CREATED_AT defaulted, IS_DELETED defaulted 'N').
    */
  def ensureCdcColumns(c: Conn, table: String): Seq[String] =
    withConnection(c) { conn =>
      val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, "%")
      val have = scala.collection.mutable.Set[String]()
      while (rs.next()) have += rs.getString("COLUMN_NAME").toUpperCase
      rs.close()
      val wanted = Seq(
        "CREATED_AT" -> "TIMESTAMP DEFAULT CURRENT_TIMESTAMP",
        "UPDATED_AT" -> "TIMESTAMP",
        "IS_DELETED" -> "CHAR(1) DEFAULT 'N'")
      val added = wanted.filterNot { case (n, _) => have.contains(n) }
      added.foreach { case (n, ddl) =>
        val st = conn.createStatement()
        try st.executeUpdate(s"ALTER TABLE $table ADD COLUMN $n $ddl")
        finally st.close()
      }
      added.map(_._1)
    }
}
