package graft.cdc

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end incremental replication — the reference's operational loop
  * (scripts/03_cdc_etl.py:203-379) re-expressed as one declarative pass per
  * table:
  *
  *   discover → topo-order (parents first) → per table:
  *     read delta (watermark predicate pushed into the scan)
  *     → dedup to latest-per-key (the staging step, minus the staging table:
  *       Spark's shuffle IS the stage)
  *     → full-outer merge with soft-delete semantics
  *     → advance watermark to MAX(change_ts)
  *     → record stats
  *
  * Storage is abstracted behind reader/writer functions so the same run
  * drives a parquet lakehouse replica, a JDBC target, or a test fixture.
  * Failure isolation matches the reference: a failing table is recorded and
  * the run continues (:348-352).
  */
object Pipeline {
  /** One replicated table: PK for the merge + how to derive CDC columns. */
  final case class TableSpec(
      name: String,
      pk: Seq[String],
      createdAt: String = Cdc.CreatedAt,
      updatedAt: String = Cdc.UpdatedAt)

  /** Per-table outcome, mirroring the reference's table_stats. */
  final case class TableResult(
      table: String,
      status: String, // "processed" | "no_changes" | "failed"
      rowsProcessed: Long,
      newWatermark: Option[Timestamp],
      error: Option[String] = None)

  /** Run summary, mirroring the reference's final report (:357-371). */
  final case class RunReport(results: Seq[TableResult]) {
    def processed: Int = results.count(_.status == "processed")
    def noChanges: Int = results.count(_.status == "no_changes")
    def failed: Int = results.count(_.status == "failed")
    def totalRows: Long = results.map(_.rowsProcessed).sum
    def summary: String =
      s"processed=$processed no_changes=$noChanges failed=$failed rows=$totalRows"
  }

  /** Persist a run report as a timestamped artifact — the reference logs
    * every run to `cdc_etl_<ts>.log` (03_cdc_etl.py:19-27); this is the
    * structured form: one JSON line per table plus a summary line,
    * written atomically (temp + rename). The name carries the instant's
    * NANOSECOND field so concurrent or same-second runs land in distinct
    * files (and distinct temp files) instead of clobbering each other.
    * Returns the file written.
    */
  def writeRunReport(report: RunReport, dir: String,
                     runAt: java.time.Instant = java.time.Instant.now()): java.io.File = {
    // full JSON string escaping: quotes, backslash, and EVERY control
    // character (driver error messages carry \r\n\t) — a torn escape
    // makes the artifact unparseable for whoever reads it
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(runAt)
    val d = new java.io.File(dir)
    d.mkdirs()
    val f = new java.io.File(d, f"cdc_run_${stamp}_${runAt.getNano}%09d.jsonl")
    val lines = report.results.map { r =>
      s"""{"table":"${esc(r.table)}","status":"${r.status}",""" +
        s""""rows":${r.rowsProcessed},"watermark":${r.newWatermark
          .map(t => "\"" + t.toString + "\"").getOrElse("null")},""" +
        s""""error":${r.error.map(e => "\"" + esc(e) + "\"").getOrElse("null")}}"""
    } :+ (s"""{"summary":{"processed":${report.processed},""" +
      s""""no_changes":${report.noChanges},"failed":${report.failed},""" +
      s""""rows":${report.totalRows},"run_at":"$runAt"}}""")
    graft.sources.Sink.writeLinesAtomic(f, lines)
    f
  }

  /** Incremental replication of all tables, parents before children.
    *
    * @param readSource   source table by name (CDC columns present)
    * @param readTarget   current replica state, None if not yet created
    * @param writeTarget  persist the merged replica state
    * @param watermarks   last watermark per table (absent = initial full load)
    * @return             report + the advanced watermark map
    */
  def replicate(
      tables: Seq[TableSpec],
      fkEdges: Seq[(String, String)],
      readSource: String => DataFrame,
      readTarget: String => Option[DataFrame],
      writeTarget: (String, DataFrame) => Unit,
      watermarks: Map[String, Timestamp]): (RunReport, Map[String, Timestamp]) = {

    val byName = tables.map(t => t.name -> t).toMap
    val order = TopoSort.order(tables.map(_.name), fkEdges)
    val results = order.flatMap(byName.get).map(spec =>
      replicateTable(spec, readSource, readTarget, writeTarget, watermarks))
    (RunReport(results), advanceMap(watermarks, results))
  }

  /** Level-parallel replication: tables with no FK path between them sit
    * in the same topological level and replicate CONCURRENTLY (the
    * reference loads strictly serially, :203-379). On a cluster each
    * table is an independent chain of Spark jobs, so in-level parallelism
    * hides source latency and fills executor slack; the level barrier
    * still guarantees parents land before children. Identical results and
    * watermark semantics to [[replicate]].
    */
  def replicateParallel(
      tables: Seq[TableSpec],
      fkEdges: Seq[(String, String)],
      readSource: String => DataFrame,
      readTarget: String => Option[DataFrame],
      writeTarget: (String, DataFrame) => Unit,
      watermarks: Map[String, Timestamp],
      parallelism: Int = 4): (RunReport, Map[String, Timestamp]) = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val byName = tables.map(t => t.name -> t).toMap
    val byLevel = TopoSort.levels(tables.map(_.name), fkEdges)
      .groupBy(_._2).toSeq.sortBy(_._1)
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val results = byLevel.flatMap { case (_, names) =>
        val fs = names.flatMap(n => byName.get(n._1)).map(spec =>
          Future(replicateTable(spec, readSource, readTarget, writeTarget, watermarks)))
        fs.map(Await.result(_, Duration.Inf)) // level barrier
      }
      (RunReport(results), advanceMap(watermarks, results))
    } finally pool.shutdown()
  }

  private def advanceMap(watermarks: Map[String, Timestamp],
                         results: Seq[TableResult]): Map[String, Timestamp] =
    results.foldLeft(watermarks) { (acc, r) =>
      r.newWatermark match {
        case Some(ts) if r.status == "processed" => acc + (r.table -> ts)
        case _ => acc
      }
    }

  private def replicateTable(
      spec: TableSpec,
      readSource: String => DataFrame,
      readTarget: String => Option[DataFrame],
      writeTarget: (String, DataFrame) => Unit,
      watermarks: Map[String, Timestamp]): TableResult =
    try {
      val src = readSource(spec.name)
      val chg = Cdc.changeTs(col(spec.createdAt), col(spec.updatedAt))
      val wmCol: Option[Column] = watermarks.get(spec.name).map(ts => lit(ts))
      val delta = Cdc.deltaSince(src, chg, wmCol)
        .withColumn("__change_ts", chg)

      // one pass computes the batch size and max change-ts (vs. the
      // reference's separate COUNT + MAX queries, :296/:325)
      val head = delta.agg(count(lit(1)).as("n"), max(col("__change_ts")).as("m")).head()
      val deltaCount = head.getAs[Long]("n")
      if (deltaCount == 0) {
        TableResult(spec.name, "no_changes", 0, watermarks.get(spec.name))
      } else {
        val staged = Cdc.latestPerKey(delta, spec.pk, Seq(col("__change_ts")))
          .drop("__change_ts")
        val merged = readTarget(spec.name) match {
          case Some(target) =>
            val (t2, s2) = alignSchemas(target, staged)
            Cdc.mergeSoftDelete(t2, s2, spec.pk)
          case None => staged.filter(col(Cdc.IsDeleted) === "N")
        }
        writeTarget(spec.name, merged)
        TableResult(spec.name, "processed", deltaCount,
          Option(head.getAs[Timestamp]("m")))
      }
    } catch {
      case e: Exception =>
        TableResult(spec.name, "failed", 0, watermarks.get(spec.name),
          error = Some(e.getMessage))
    }

  /** Database-to-database replication — the reference's exact architecture
    * (JDBC source → Spark transform → JDBC staging table → DB-side MERGE →
    * watermark advance), with missing target/staging tables created from
    * the source schema (the 02_clone_schema_structure.py step, inline).
    * Unlike [[replicate]] the merge runs INSIDE the target database: only
    * the delta crosses the wire, the replica never round-trips through
    * Spark — the right trade when the target is an operational RDBMS
    * rather than a lakehouse.
    */
  def replicateJdbc(
      spark: SparkSession,
      tables: Seq[TableSpec],
      fkEdges: Seq[(String, String)],
      source: graft.sources.Jdbc.Conn,
      target: graft.sources.Jdbc.Conn,
      watermarks: Map[String, Timestamp],
      dialect: graft.sources.JdbcMerge.Dialect = graft.sources.JdbcMerge.StandardDialect)
      : (RunReport, Map[String, Timestamp]) = {
    import graft.sources.{Jdbc, JdbcMerge}
    val byName = tables.map(t => t.name -> t).toMap
    val order = TopoSort.order(tables.map(_.name), fkEdges)
    var newWatermarks = watermarks
    val results = order.flatMap(byName.get).map { spec =>
      try {
        val src = Jdbc.read(spark, source, spec.name)
        val chg = Cdc.changeTs(col(spec.createdAt), col(spec.updatedAt))
        val delta = Cdc.deltaSince(src, chg, watermarks.get(spec.name).map(ts => lit(ts)))
          .withColumn("__change_ts", chg)
        val head = delta.agg(count(lit(1)).as("n"), max(col("__change_ts")).as("m")).head()
        val deltaCount = head.getAs[Long]("n")
        if (deltaCount == 0) {
          TableResult(spec.name, "no_changes", 0, watermarks.get(spec.name))
        } else {
          val staged = Cdc.latestPerKey(delta, spec.pk, Seq(col("__change_ts")))
            .drop("__change_ts")
          val staging = s"STG_${spec.name}"
          ensureJdbcTable(target, spec.name, staged.schema, spec.pk)
          ensureJdbcTable(target, staging, staged.schema, Nil)
          JdbcMerge.stageAndMerge(staged, target, spec.name, staging, spec.pk,
            dialect = dialect)
          val wm = Option(head.getAs[Timestamp]("m"))
          wm.foreach(ts => newWatermarks += spec.name -> ts)
          TableResult(spec.name, "processed", deltaCount, wm)
        }
      } catch {
        case e: Exception =>
          TableResult(spec.name, "failed", 0, watermarks.get(spec.name),
            error = Some(e.getMessage))
      }
    }
    (RunReport(results), newWatermarks)
  }

  /** Replication into DELTA-format lake tables (r13 — the reference's
    * exact loop, scripts/03_cdc_etl.py:203-379, pointed at the table
    * format the engine already reads, compacts, restores, and
    * vacuums): per table, the watermark delta stages to
    * latest-per-key and MERGES into `targetDir/<table>` via
    * [[graft.sources.DeltaWrite.merge]] — matched keys update in
    * place (soft deletes flip `is_deleted`, recorded as update
    * pre/post images in the change feed), new live keys insert,
    * tombstones for absent keys are dropped by the insert guard. A
    * missing table bootstraps with [[graft.sources.DeltaWrite.create]]
    * (live rows only — the initial full load), CDF enabled so every
    * later merge records its images.
    *
    * Unlike [[replicate]]'s read-modify-write parquet target, the
    * merge rewrites ONLY the files holding matched keys — steady-state
    * incremental runs cost O(changed data), and downstream consumers
    * get the recorded change feed for free.
    */
  def replicateDelta(
      spark: SparkSession,
      tables: Seq[TableSpec],
      fkEdges: Seq[(String, String)],
      readSource: String => DataFrame,
      targetDir: String,
      watermarks: Map[String, Timestamp]): (RunReport, Map[String, Timestamp]) = {
    import graft.sources.DeltaWrite
    val byName = tables.map(t => t.name -> t).toMap
    val order = TopoSort.order(tables.map(_.name), fkEdges)
    val results = order.flatMap(byName.get).map { spec =>
      try {
        val src = readSource(spec.name)
        val chg = Cdc.changeTs(col(spec.createdAt), col(spec.updatedAt))
        val delta = Cdc.deltaSince(src, chg,
          watermarks.get(spec.name).map(ts => lit(ts)))
          .withColumn("__change_ts", chg)
        val head = delta.agg(count(lit(1)).as("n"),
          max(col("__change_ts")).as("m")).head()
        val deltaCount = head.getAs[Long]("n")
        if (deltaCount == 0) {
          TableResult(spec.name, "no_changes", 0, watermarks.get(spec.name))
        } else {
          val staged = Cdc.latestPerKey(delta, spec.pk, Seq(col("__change_ts")))
            .drop("__change_ts")
          val path = s"$targetDir/${spec.name}"
          if (!java.nio.file.Files.isDirectory(
              java.nio.file.Paths.get(path, "_delta_log")))
            DeltaWrite.create(spark, path,
              staged.filter(col(Cdc.IsDeleted) === "N"),
              configuration = Map("delta.enableChangeDataFeed" -> "true"))
          else
            DeltaWrite.merge(spark, path, staged, spec.pk,
              insertFilter = Some(col(Cdc.IsDeleted) === "N"))
          TableResult(spec.name, "processed", deltaCount,
            Option(head.getAs[Timestamp]("m")))
        }
      } catch {
        case e: Exception =>
          TableResult(spec.name, "failed", 0, watermarks.get(spec.name),
            error = Some(e.getMessage))
      }
    }
    (RunReport(results), advanceMap(watermarks, results))
  }

  /** Zero-config replication — the reference's ENTIRE main() needing only
    * two connections: discover tables, primary keys, and FK edges from the
    * source's JDBC metadata (utils/database.py), then run the incremental
    * DB-to-DB loop. Tables without a primary key are skipped (the
    * reference requires PKs for its MERGE, :262-266).
    */
  def discoverAndReplicate(
      spark: SparkSession,
      source: graft.sources.Jdbc.Conn,
      target: graft.sources.Jdbc.Conn,
      watermarks: Map[String, Timestamp],
      schema: String = null,
      dialect: graft.sources.JdbcMerge.Dialect = graft.sources.JdbcMerge.StandardDialect)
      : (RunReport, Map[String, Timestamp]) = {
    import graft.sources.Jdbc
    val tables = Jdbc.listTables(source, schema)
    val specs = tables
      .map(t => t -> Jdbc.primaryKeys(source, t))
      .filter(_._2.nonEmpty)
      .map { case (t, pk) => TableSpec(t, pk) }
    val fk = Jdbc.foreignKeys(source, specs.map(_.name))
    replicateJdbc(spark, specs, fk, source, target, watermarks, dialect)
  }

  /** Create `table` in the target database from a Spark schema if it does
    * not exist (DatabaseMetaData probe + SchemaClone DDL) — the reference's
    * clone-missing-tables step.
    */
  def ensureJdbcTable(c: graft.sources.Jdbc.Conn, table: String,
                      schema: org.apache.spark.sql.types.StructType,
                      pk: Seq[String]): Unit =
    graft.sources.Jdbc.withConnection(c) { conn =>
      val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      val exists = try rs.next() finally rs.close()
      if (!exists) {
        // existence was just probed, and not every RDBMS (Derby, Oracle
        // < 23c) accepts IF NOT EXISTS
        val st = conn.createStatement()
        try st.executeUpdate(SchemaClone.createTableDdl(table, schema, pk,
          ifNotExists = false, stringType = "VARCHAR(4000)"))
        finally st.close()
      }
    }

  /** Schema evolution between runs (the incremental form of the reference's
    * schema clone, 02_clone_schema_structure.py): a column added on the
    * source appears on the target as NULL for pre-existing rows; a column
    * dropped from the source is RETAINED on the target (replicas never lose
    * data silently) and staged rows carry NULL for it.
    */
  def alignSchemas(target: DataFrame, staged: DataFrame): (DataFrame, DataFrame) = {
    val tCols = target.columns.toSeq
    val sByName = staged.schema.fields.map(f => f.name -> f).toMap
    val tByName = target.schema.fields.map(f => f.name -> f).toMap
    val newCols = staged.columns.toSeq.filterNot(tByName.contains)
    val droppedCols = tCols.filterNot(sByName.contains)
    val t2 = newCols.foldLeft(target)((d, c) =>
      d.withColumn(c, lit(null).cast(sByName(c).dataType)))
    val s2 = droppedCols.foldLeft(staged)((d, c) =>
      d.withColumn(c, lit(null).cast(tByName(c).dataType)))
    (t2, s2.select(t2.columns.map(col): _*))
  }

  /** The DDL a SQL target (the reference's Oracle schema) would need before
    * [[alignSchemas]]-shaped data lands: ADD for source-added columns,
    * nothing for source-dropped columns (replicas retain them). Types come
    * from [[SchemaClone.sqlType]] — the same mapping the full clone uses.
    */
  def migrationDdl(target: DataFrame, staged: DataFrame, table: String): Seq[String] = {
    val tCols = target.schema.fieldNames.toSet
    staged.schema.fields.toSeq.filterNot(f => tCols.contains(f.name)).map { f =>
      s"ALTER TABLE $table ADD ${f.name} ${SchemaClone.sqlType(f.dataType)}"
    }
  }

  /** Parquet-directory replica store: each table a subdirectory. The local
    * stand-in for "target Oracle schema" — at scale this is the lakehouse
    * path and writes are partitioned.
    */
  final class ParquetTarget(spark: SparkSession, dir: String) {
    def read(name: String): Option[DataFrame] = {
      val p = new java.io.File(s"$dir/$name")
      if (p.exists()) Some(spark.read.parquet(p.toString)) else None
    }
    def write(name: String, df: DataFrame): Unit = {
      // read-modify-write on the same path needs a materialized source
      val tmp = s"$dir/.tmp_$name"
      df.write.mode("overwrite").parquet(tmp)
      val dest = new java.io.File(s"$dir/$name")
      if (dest.exists()) {
        val bak = new java.io.File(s"$dir/.bak_$name")
        if (bak.exists()) delete(bak)
        dest.renameTo(bak)
      }
      new java.io.File(tmp).renameTo(dest)
      delete(new java.io.File(s"$dir/.bak_$name"))
    }
    private def delete(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(delete)
      f.delete()
    }
  }
}
