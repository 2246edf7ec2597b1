package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** F14: Delta Lake table reader — open-table-format interop from the
  * PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md: a table
  * is a directory of parquet data files plus `_delta_log/` holding
  * ordered JSON commit files `%020d.json`, optionally compacted into
  * `%020d.checkpoint.parquet` files). Lakehouse users arrive with Delta
  * tables (the r6 verdict's interop gap); this reads them with zero
  * extra dependencies — the log is JSON (parsed by Spark's own json
  * reader) and the checkpoint is parquet.
  *
  * Protocol subset honored (the read path):
  *  - `metaData`: schemaString (Spark JSON schema) + partitionColumns;
  *    the LAST metaData wins (schema evolution).
  *  - `add`: data file path + partitionValues; `remove`: the path
  *    leaves the live set. Replay order = version order; the protocol
  *    guarantees a path is not both added and removed in one commit.
  *  - checkpoint: a parquet file of the same actions pre-folded;
  *    replay starts from the newest checkpoint ≤ the requested version
  *    and applies only later JSON commits (how real readers bound log
  *    replay). Tombstones in the checkpoint fold as removes — a no-op
  *    on the live set, kept only for protocol fidelity.
  *  - `versionAsOf`: time travel by stopping the replay early.
  *
  * Scale shape: the log (file METADATA) is driver-side — bounded by
  * file count like the house manifest ([[graft.layout.FileManifest]],
  * stated bound ~10⁶ files), never by data size. Data reading is one
  * `spark.read.schema(...).parquet(files*)` per partition-value GROUP
  * (partition columns live in the log, not the files — they re-enter
  * as typed literals, Spark's own partitioned-read shape), so scans
  * stay parallel, pruned, and pushdown-capable; `partitionFilter`
  * drops file groups BEFORE any scan is planned — the log IS the
  * partition index.
  */
object DeltaLog {

  /** JSON string-body escape for hand-built commit lines: backslash and
    * double-quote (the two structural escapes), plus control chars as
    * `\u00XX` — a partition VALUE holding a quote must not corrupt the
    * `_delta_log` line it rides in.
    */
  private[sources] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** List a staging dir's parquet part files with the directory stream
    * CLOSED (an unclosed `Files.list`/`Files.walk` leaks a handle per
    * commit), recursing into partition subdirectories.
    */
  private[graft] def listParquet(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = Files.walk(dir)
    try st.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    finally st.close()
  }

  /** Remove a commit's staging directory once its parts have moved —
    * temp dirs must not accumulate across commits.
    */
  private[graft] def deleteTmp(dir: java.nio.file.Path): Unit = {
    val st = Files.walk(dir)
    val all = try st.iterator().asScala.toSeq finally st.close()
    all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  private[sources] def pvJsonOf(pvals: Map[String, String]): String =
    pvals.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${jsonEscape(k)}":${if (v == null) "null" else "\"" + jsonEscape(v) + "\""}"""
    }.mkString("{", ",", "}")

  /** One live data file after log replay. `stats` is the raw `add.stats`
    * JSON (numRecords/minValues/maxValues) when the writer recorded it —
    * decoded lazily by [[filesInRange]] for min/max file skipping.
    */
  final case class LiveFile(path: String, partitionValues: Map[String, String],
                            stats: Option[String] = None,
                            deletionVector: Option[String] = None)

  /** Replayed table state at a version. `configuration` is the last
    * metaData action's table configuration (columnMapping mode lives
    * there); `minReaderVersion`/`readerFeatures` are the last protocol
    * action's reader requirements (validated in [[state]] — a reader
    * MUST refuse a table whose protocol it does not fully understand
    * rather than silently misread it).
    */
  final case class State(version: Long, schema: StructType,
                         partitionColumns: Seq[String], files: Seq[LiveFile],
                         configuration: Map[String, String] = Map.empty,
                         minReaderVersion: Int = 1,
                         readerFeatures: Seq[String] = Seq.empty,
                         minWriterVersion: Int = 1,
                         writerFeatures: Seq[String] = Seq.empty) {
    def columnMappingMode: String =
      configuration.getOrElse("delta.columnMapping.mode", "none")
  }

  /** Reader features this subset actually implements — the allowlist the
    * protocol guard checks `readerFeatures` against. `v2Checkpoint` is
    * absent on purpose (this reader replays classic checkpoints only);
    * an unknown feature rejects LOUDLY instead of misreading.
    */
  private val SupportedReaderFeatures =
    Set("columnMapping", "deletionVectors", "timestampNtz")

  /** Writer features this subset's WRITERS honor — the allowlist
    * [[writerGuard]] checks `writerFeatures` against before any commit
    * (r12, closing the r11 gap: the READ side was guarded but the
    * engine could still corrupt a table whose writer contract it
    * ignores — e.g. `invariants` it wouldn't enforce or `rowTracking`
    * rows it wouldn't stamp). `changeDataFeed` is honored for real:
    * data-changing commits record their cdc actions ([[deleteWithDv]],
    * [[DeltaWrite.merge]]); `inCommitTimestamp` writes are stamped by
    * [[writeCommit]] (r13).
    */
  private val SupportedWriterFeatures =
    Set("columnMapping", "deletionVectors", "timestampNtz",
      "changeDataFeed", "inCommitTimestamp")

  /** The writer features a LEGACY protocol version (2..6) IMPLIES
    * without listing them — `writerFeatures` only exists at v7, but
    * the contract the versions carry is the same (PROTOCOL.md's
    * version-to-feature table). r13, closing the r12 advice gap: a
    * minWriterVersion=2 (append-only/invariants) table used to pass
    * the guard unexamined.
    */
  private val LegacyWriterFeatures: Seq[(Int, String)] = Seq(
    2 -> "appendOnly", 2 -> "invariants",
    3 -> "checkConstraints",
    4 -> "changeDataFeed", 4 -> "generatedColumns",
    5 -> "columnMapping",
    6 -> "identityColumns")

  /** Top-level keys of a Spark field-metadata blob (the Metadata class
    * exposes only point lookups; the feature-activation checks need a
    * prefix scan for `delta.identity.*`).
    */
  private def metadataKeys(m: org.apache.spark.sql.types.Metadata): Set[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(m.json) match {
      case JObject(fs) => fs.map(_._1).toSet
      case _ => Set.empty
    }
  }

  /** Does any field (at any nesting level) carry a metadata key
    * matching `pred`? Invariants / generated / identity columns all
    * announce themselves this way in the schemaString.
    */
  private def schemaHasMetaKey(dt: DataType, pred: String => Boolean): Boolean =
    dt match {
      case st: StructType => st.fields.exists(f =>
        metadataKeys(f.metadata).exists(pred) ||
          schemaHasMetaKey(f.dataType, pred))
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        schemaHasMetaKey(et, pred)
      case org.apache.spark.sql.types.MapType(k, v, _) =>
        schemaHasMetaKey(k, pred) || schemaHasMetaKey(v, pred)
      case _ => false
    }

  /** Is a writer feature outside the allowlist actually ACTIVE on this
    * table — i.e. would a writer that ignores it corrupt something?
    * A v3 table with no CHECK constraints defined carries the
    * `checkConstraints` contract vacuously; refusing it would lock
    * this writer out of every legacy table for no protection.
    * `opDeletesData` feeds the appendOnly check: OPTIMIZE/checkpoint/
    * vacuum never delete rows, so appendOnly permits them.
    */
  private def featureActive(st: State, feature: String,
                            opDeletesData: Boolean): Boolean = feature match {
    case "appendOnly" =>
      opDeletesData &&
        st.configuration.getOrElse("delta.appendOnly", "false") == "true"
    case "invariants" =>
      schemaHasMetaKey(st.schema, _ == "delta.invariants")
    case "checkConstraints" =>
      st.configuration.keys.exists(_.startsWith("delta.constraints."))
    case "generatedColumns" =>
      schemaHasMetaKey(st.schema, _ == "delta.generationExpression")
    case "identityColumns" =>
      schemaHasMetaKey(st.schema, _.startsWith("delta.identity."))
    case _ => true // an unknown listed feature is always binding
  }

  /** The ops whose commits DELETE data rows — what `delta.appendOnly`
    * forbids (OPTIMIZE's dataChange=false rewrites and checkpoints are
    * allowed on append-only tables; row deletion is not).
    */
  private val DataDeletingOps = Set("deleteWithDv", "restore", "merge")

  /** Refuse to WRITE (commit/compact/DV-delete/restore/vacuum/
    * checkpoint/merge) a table whose writer requirements this subset
    * does not fully implement — the write-side twin of the reader's
    * protocol guard. Legacy versions 2..6 check their IMPLIED feature
    * sets through the same allowlist (r13); an implied-but-inactive
    * feature (no invariants defined, appendOnly unset) does not block,
    * because ignoring it cannot corrupt anything.
    */
  private[sources] def writerGuard(st: State, table: String, op: String): Unit = {
    require(st.minWriterVersion <= 7,
      s"delta protocol minWriterVersion=${st.minWriterVersion} exceeds 7 " +
        s"(the newest this writer implements); refusing to $op: $table")
    val declared =
      if (st.minWriterVersion >= 7) st.writerFeatures
      else LegacyWriterFeatures.collect {
        case (v, f) if st.minWriterVersion >= v => f
      }
    val deletes = DataDeletingOps.contains(op)
    val blocking = declared.filterNot(SupportedWriterFeatures.contains)
      .filter(featureActive(st, _, deletes))
    require(blocking.isEmpty,
      s"delta writer features ${blocking.mkString(",")} (minWriterVersion=" +
        s"${st.minWriterVersion}) not implemented by this writer " +
        s"(supported: ${SupportedWriterFeatures.toSeq.sorted.mkString(",")});" +
        s" a $op ignoring them could corrupt the table: $table")
    // the appendOnly CONFIG can be set on any protocol version (even
    // v1, where no feature carries it) — honoring it is free
    if (deletes)
      require(st.configuration.getOrElse("delta.appendOnly", "false") != "true",
        s"delta.appendOnly=true forbids $op (it deletes data rows): $table")
  }

  /** Fold one batch of action rows (a JSON commit or a checkpoint) into
    * the live-file map + metadata slot. JSON infers `partitionValues`
    * as a struct, checkpoints may store a map — `from_json(to_json(…))`
    * canonicalizes both to map&lt;string,string&gt;.
    */
  private def fold(df: DataFrame,
                   live: collection.mutable.LinkedHashMap[String, (Map[String, String], Option[String], Option[String])],
                   meta: Array[Option[(StructType, Seq[String], Map[String, String])]],
                   proto: Array[Option[(Int, Seq[String], Int, Seq[String])]]): Unit = {
    val roots = df.columns.toSet
    def sub(root: String, path: String) =
      if (roots.contains(root)) expr(path) else lit(null).cast("string")
    val addFields =
      if (roots.contains("add"))
        df.select("add.*").columns.toSet else Set.empty[String]
    val metaFields =
      if (roots.contains("metaData"))
        df.select("metaData.*").columns.toSet else Set.empty[String]
    val protoFields =
      if (roots.contains("protocol"))
        df.select("protocol.*").columns.toSet else Set.empty[String]
    // an unpartitioned table writes `"partitionValues":{}` — Spark's
    // JSON inference prunes the empty struct, so guard on the field
    val pv =
      if (addFields.contains("partitionValues"))
        expr("from_json(to_json(add.partitionValues), 'map<string,string>')")
      else lit(null).cast("map<string,string>")
    val pc =
      if (roots.contains("metaData"))
        expr("metaData.partitionColumns")
      else lit(null).cast("array<string>")
    val stats =
      if (addFields.contains("stats")) expr("add.stats")
      else lit(null).cast("string")
    val dv =
      if (addFields.contains("deletionVector"))
        expr("to_json(add.deletionVector)")
      else lit(null).cast("string")
    val conf =
      if (metaFields.contains("configuration"))
        expr("from_json(to_json(metaData.configuration), 'map<string,string>')")
      else lit(null).cast("map<string,string>")
    val mrv =
      if (protoFields.contains("minReaderVersion"))
        expr("protocol.minReaderVersion").cast("int")
      else lit(null).cast("int")
    val rfeat =
      if (protoFields.contains("readerFeatures"))
        expr("protocol.readerFeatures").cast("array<string>")
      else lit(null).cast("array<string>")
    val mwv =
      if (protoFields.contains("minWriterVersion"))
        expr("protocol.minWriterVersion").cast("int")
      else lit(null).cast("int")
    val wfeat =
      if (protoFields.contains("writerFeatures"))
        expr("protocol.writerFeatures").cast("array<string>")
      else lit(null).cast("array<string>")
    df.select(sub("add", "add.path"), pv, sub("remove", "remove.path"),
        sub("metaData", "metaData.schemaString"), pc, stats, dv,
        conf, mrv, rfeat, mwv, wfeat)
      .collect().foreach { r =>
        if (!r.isNullAt(3)) {
          val sch = DataType.fromJson(r.getString(3)).asInstanceOf[StructType]
          val cols = if (r.isNullAt(4)) Seq.empty[String] else r.getSeq[String](4)
          val cfg = if (r.isNullAt(7)) Map.empty[String, String]
                    else r.getMap[String, String](7).toMap
          meta(0) = Some((sch, cols, cfg))
        }
        if (!r.isNullAt(8)) {
          val feats = if (r.isNullAt(9)) Seq.empty[String] else r.getSeq[String](9)
          val mwv0 = if (r.isNullAt(10)) 1 else r.getInt(10)
          val wfeats = if (r.isNullAt(11)) Seq.empty[String] else r.getSeq[String](11)
          proto(0) = Some((r.getInt(8), feats, mwv0, wfeats))
        }
        if (!r.isNullAt(2)) live.remove(r.getString(2))
        if (!r.isNullAt(0)) {
          val m = if (r.isNullAt(1)) Map.empty[String, String]
                  else r.getMap[String, String](1).toMap
          live.put(r.getString(0), (m,
            if (r.isNullAt(5)) None else Some(r.getString(5)),
            if (r.isNullAt(6)) None else Some(r.getString(6))))
        }
      }
  }

  /** Replay the log to `versionAsOf` (or the latest commit).
    *
    * Checkpoint handling (r8, the reject-loudly posture of the Iceberg
    * reader): classic single-part (`V.checkpoint.parquet`) and
    * multi-part (`V.checkpoint.P.N.parquet`, all N parts required)
    * checkpoints are both replay starting points; `_last_checkpoint` is
    * honored as the newest-checkpoint hint when present and must point
    * at an existing checkpoint. After the starting point is chosen, the
    * JSON commit versions must be CONTIGUOUS up to the target version —
    * a retention-trimmed log whose checkpoint this subset failed to
    * recognize previously replayed from version 0 with holes and
    * silently returned an incomplete live set; now it throws.
    */
  def state(spark: SparkSession, table: String,
            versionAsOf: Option[Long] = None): State = {
    import spark.implicits._
    val dir = Paths.get(table, "_delta_log")
    require(Files.isDirectory(dir), s"not a delta table: $table")
    val entries = {
      val st = Files.list(dir)
      try st.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally st.close()
    }
    val commits = entries.filter(_.matches("\\d{20}\\.json"))
      .map(n => n.take(20).toLong -> n)
    val singleCkpts = entries.filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(n => n.take(20).toLong -> Seq(n))
    // multi-part: V.checkpoint.P.N.parquet — usable only when all N
    // parts are present (a partial copy must not half-replay)
    val multiCkpts = entries
      .filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
      .groupBy(_.take(20).toLong).toSeq
      .flatMap { case (v, parts) =>
        val n = parts.head.split('.')(3).toInt
        if (parts.size == n) Some(v -> parts.sorted)
        else throw new IllegalArgumentException(
          s"multi-part checkpoint $v has ${parts.size} of $n parts: $table")
      }
    val checkpoints = (singleCkpts ++ multiCkpts).sortBy(_._1)
    // _last_checkpoint (the driver-maintained pointer): when present it
    // must reference a recognizable checkpoint — if this subset cannot
    // see it, replay would silently start too early, so fail loudly.
    val lastCkptFile = dir.resolve("_last_checkpoint")
    if (Files.exists(lastCkptFile)) {
      val txt = Files.readString(lastCkptFile)
      val v = "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(throw new IllegalArgumentException(
          s"unparseable _last_checkpoint: $table"))
      require(checkpoints.exists(_._1 == v),
        s"_last_checkpoint points at version $v but no usable checkpoint " +
          s"files exist for it: $table")
    }
    val upTo = versionAsOf.getOrElse(
      (commits.map(_._1) ++ checkpoints.map(_._1)).maxOption.getOrElse(
        throw new IllegalArgumentException(s"empty delta log: $table")))
    val live = collection.mutable.LinkedHashMap[String, (Map[String, String], Option[String], Option[String])]()
    val meta = Array[Option[(StructType, Seq[String], Map[String, String])]](None)
    val proto = Array[Option[(Int, Seq[String], Int, Seq[String])]](None)
    val ckpt = checkpoints.filter(_._1 <= upTo).maxByOption(_._1)
    ckpt.foreach { case (_, parts) =>
      fold(spark.read.parquet(parts.map(n => dir.resolve(n).toString): _*),
        live, meta, proto)
    }
    val fromV = ckpt.map(_._1 + 1).getOrElse(0L)
    val haveV = commits.map(_._1).toSet
    val missing = (fromV to upTo).filterNot(haveV.contains)
    require(missing.isEmpty,
      s"delta log not contiguous: versions ${missing.take(5).mkString(",")}" +
        s"${if (missing.size > 5) ",..." else ""} missing between " +
        s"checkpoint $fromV and $upTo (retention-trimmed log with an " +
        s"unrecognized checkpoint?): $table")
    commits.filter { case (v, _) => v >= fromV && v <= upTo }
      .sortBy(_._1)
      .foreach { case (_, name) =>
        val lines = Files.readAllLines(dir.resolve(name)).asScala.toSeq
          .filter(_.nonEmpty)
        if (lines.nonEmpty) fold(spark.read.json(lines.toDS), live, meta, proto)
      }
    val (schema, partCols, config) = meta(0).getOrElse(
      throw new IllegalArgumentException(s"no metaData action in log: $table"))
    // PROTOCOL GUARD: refuse a table whose reader requirements this
    // subset does not fully implement — silently misreading a
    // column-mapped or feature-gated table is the one failure mode the
    // protocol action exists to prevent.
    val (mrv, feats, mwv, wfeats) =
      proto(0).getOrElse((1, Seq.empty[String], 1, Seq.empty[String]))
    require(mrv <= 3,
      s"delta protocol minReaderVersion=$mrv exceeds 3 (the newest this " +
        s"reader implements): $table")
    val unknown = feats.filterNot(SupportedReaderFeatures.contains)
    require(unknown.isEmpty,
      s"delta readerFeatures ${unknown.mkString(",")} not implemented by " +
        s"this reader (supported: ${SupportedReaderFeatures.toSeq.sorted.mkString(",")}): $table")
    val cmMode = config.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name",
      s"delta.columnMapping.mode=$cmMode not supported (this reader " +
        s"implements none|name; id-mode needs parquet field-id matching): $table")
    State(upTo, schema, partCols,
      live.toSeq.map { case (p, (m, st, dv)) => LiveFile(p, m, st, dv) },
      config, mrv, feats, mwv, wfeats)
  }

  /** PHYSICAL name of a schema field under columnMapping=name: the
    * `delta.columnMapping.physicalName` metadata key stamped at
    * rename-guarding time by the writer; a field without one keeps its
    * logical name (the pre-mapping columns of an upgraded table).
    */
  private[sources] def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The schema as WRITTEN in the parquet data files under
    * columnMapping=name: every field (at every nesting level) renamed
    * to its physical name; types unchanged.
    */
  private[sources] def physicalType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
    case org.apache.spark.sql.types.ArrayType(et, n) =>
      org.apache.spark.sql.types.ArrayType(physicalType(et), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(physicalType(k), physicalType(v), n)
    case other => other
  }

  /** The live files surviving min/max range pruning on `add.stats` —
    * the house [[graft.layout.FileManifest]] box-intersection rule
    * sourced from the transaction log's own per-file statistics. Files
    * without stats (or without the ranged column in them) always
    * survive: no false negatives.
    */
  def filesInRange(files: Seq[LiveFile],
                   ranges: Map[String, (Long, Long)]): Seq[LiveFile] = {
    if (ranges.isEmpty) return files
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def bound(j: JValue): Option[Long] = j match {
      case JInt(v) => Some(v.toLong)
      case JLong(v) => Some(v)
      case JDouble(v) => Some(v.toLong)
      case JDecimal(v) => Some(v.toLong)
      case _ => None
    }
    files.filter { f =>
      f.stats.forall { raw =>
        val js = try JsonMethods.parse(raw) catch { case _: Exception => JNothing }
        ranges.forall { case (c, (lo, hi)) =>
          (bound(js \ "minValues" \ c), bound(js \ "maxValues" \ c)) match {
            case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
            case _ => true
          }
        }
      }
    }
  }

  /** Read the live table (optionally at an old version / with partition
    * pruning). `partitionFilter` sees each live file's partition values
    * as strings — file groups it drops are never scanned; `ranges`
    * additionally skips files whose `add.stats` min/max box misses a
    * range predicate (the exact predicate re-applies as a residual).
    */
  def read(spark: SparkSession, table: String,
           versionAsOf: Option[Long] = None,
           partitionFilter: Map[String, String] => Boolean = _ => true,
           ranges: Map[String, (Long, Long)] = Map.empty)
      : DataFrame =
    readInternal(spark, table, state(spark, table, versionAsOf),
      partitionFilter, ranges, tagRel = false)

  /** [[read]] over an already-replayed state; `tagRel = true` keeps a
    * `__graft_rel` column holding each row's table-relative data-file
    * path (the `add.path` it came from) — what [[DeltaWrite.merge]]
    * needs to know WHICH files a key match touches. The tag is an
    * expression over `_metadata.file_path` (the DV join's own
    * anchoring rule), not a per-file scan — one plan per partition
    * group regardless of file count.
    */
  private[sources] def readInternal(spark: SparkSession, table: String,
                                    st: State,
                                    partitionFilter: Map[String, String] => Boolean,
                                    ranges: Map[String, (Long, Long)],
                                    tagRel: Boolean): DataFrame = {
    // columnMapping=name: data files store PHYSICAL names (from field
    // metadata), and add.partitionValues keys are physical too — scan
    // under the physical schema, then cast each column back to its
    // logical field (struct casts rename nested fields positionally).
    val mapped = st.columnMappingMode == "name"
    val dataFields = st.schema.fields
      .filterNot(f => st.partitionColumns.contains(f.name)).toSeq
    val dataSchema =
      if (mapped) StructType(dataFields.map(f =>
        f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
      else StructType(dataFields)
    val liveFiles = filesInRange(
      st.files.filter(f => partitionFilter(f.partitionValues)), ranges)
    val groups = liveFiles
      .groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
    val outSchema =
      if (!tagRel) st.schema
      else StructType(st.schema.fields :+
        org.apache.spark.sql.types.StructField("__graft_rel",
          org.apache.spark.sql.types.StringType))
    if (groups.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    // deletion vectors (F14c): when any live file carries one, tag rows
    // with their file + row index and anti-join the decoded positions —
    // the Iceberg positional-delete shape. DVs decode in EXECUTORS (one
    // task per DV-bearing file); the driver holds only descriptors.
    val hasDv = liveFiles.exists(_.deletionVector.isDefined)
    val needMeta = hasDv || tagRel
    val metaCols =
      if (needMeta) Seq(col("_metadata.file_path").as("__fp"),
        col("_metadata.row_index").as("__pos"))
      else Seq.empty
    val keep = st.schema.fieldNames.toSeq ++
      (if (needMeta) Seq("__fp", "__pos") else Nil)
    val parts = groups.map { case (pvals, files) =>
      val base0 = spark.read.schema(dataSchema)
        .parquet(files.map(f => Paths.get(table, f.path).toString): _*)
      val dataCols: Seq[org.apache.spark.sql.Column] =
        if (mapped) dataFields.map(f =>
          col(physicalName(f)).cast(f.dataType).as(f.name))
        else base0.columns.map(col).toSeq
      val base = base0.select(dataCols ++ metaCols: _*)
      st.partitionColumns.foldLeft(base) { (df, c0) =>
        val f = st.schema.fields.find(_.name == c0).getOrElse(
          throw new IllegalArgumentException(s"partition column $c0 not in schema"))
        val pvKey = if (mapped) physicalName(f) else c0
        df.withColumn(c0, lit(pvals.getOrElse(pvKey, null)).cast(f.dataType))
      }.select(keep.map(col): _*)
    }
    var df = parts.reduce(_ unionByName _)
    // the path tail under the table dir (the Iceberg relocation-safe
    // anchoring rule) — shared by the DV join and the __graft_rel tag
    val anchor = Paths.get(table).toAbsolutePath.getFileName.toString
    if (hasDv) {
      import spark.implicits._
      val descriptors = liveFiles.flatMap(f =>
        f.deletionVector.map(dvJson => (f.path, dvJson)))
      val positions = spark.createDataset(descriptors)
        .repartition(math.max(1, descriptors.size))
        .flatMap { case (relPath, dvJson) =>
          decodeDvPositions(table, dvJson).map(pos => (relPath, pos))
        }.toDF("__dvp", "__dvpos")
      df = df.join(positions,
        substring_index(col("__fp"), "/" + anchor + "/", -1) === col("__dvp") &&
          col("__pos") === col("__dvpos"), "left_anti")
        .select(keep.map(col): _*)
    }
    if (tagRel)
      df = df.withColumn("__graft_rel",
        substring_index(col("__fp"), "/" + anchor + "/", -1))
    df = df.select(outSchema.fieldNames.map(col).toSeq: _*)
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    }.reduceOption(_ && _).getOrElse(lit(true))
    df.filter(residual)
  }

  /** Positions of one `deletionVector` descriptor: `u` (z85 UUID →
    * `deletion_vector_<uuid>.bin` under the table root, an optional
    * random prefix honored), `p` (absolute path), `i` (inline).
    */
  private[sources] def decodeDvPositions(table: String,
                                         dvJson: String): Array[Long] = {
    def field(name: String): Option[String] =
      ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(dvJson).map(_.group(1))
    def num(name: String): Option[Long] =
      ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r
        .findFirstMatchIn(dvJson).map(_.group(1).toLong)
    val storage = field("storageType").getOrElse(
      throw new IllegalArgumentException(s"deletionVector missing storageType: $dvJson"))
    val payload = field("pathOrInlineDv").getOrElse(
      throw new IllegalArgumentException(s"deletionVector missing pathOrInlineDv: $dvJson"))
    val size = num("sizeInBytes").getOrElse(
      throw new IllegalArgumentException(s"deletionVector missing sizeInBytes: $dvJson")).toInt
    storage match {
      case "i" =>
        val data = DeletionVectors.z85Decode(payload)
        require(data.length >= size, s"inline DV shorter than sizeInBytes")
        DeletionVectors.decodeData(java.util.Arrays.copyOf(data, size))
      case "u" =>
        // optional random prefix before the 20-char z85 uuid
        val (prefix, uuidPart) = payload.splitAt(payload.length - 20)
        val uuid = DeletionVectors.z85Uuid(uuidPart)
        val rel =
          (if (prefix.nonEmpty) prefix.stripSuffix("/") + "/" else "") +
            s"deletion_vector_$uuid.bin"
        val bytes = Files.readAllBytes(Paths.get(table, rel))
        DeletionVectors.decodeAt(bytes, num("offset").getOrElse(1L).toInt, size)
      case "p" =>
        val bytes = Files.readAllBytes(Paths.get(payload))
        DeletionVectors.decodeAt(bytes, num("offset").getOrElse(1L).toInt, size)
      case other =>
        throw new IllegalArgumentException(s"deletionVector storageType '$other' unsupported")
    }
  }

  /** Write a classic single-part CHECKPOINT of the CURRENT state (r10
    * — the write half of the r8 checkpoint reader): one
    * `V.checkpoint.parquet` holding the metaData row plus one `add`
    * row per live file (partitionValues as a map, stats and
    * deletionVector descriptors carried through), and
    * `_last_checkpoint` updated to point at it. After this, JSON
    * commits ≤ V can be retention-trimmed and the log still replays —
    * the reason checkpoints exist; the round-trip gate deletes them
    * to prove it. Returns the checkpointed version.
    *
    * Scale shape: the checkpoint is one row per live FILE (not per
    * data row) — the same driver-held state the log replay already
    * materializes.
    */
  def writeCheckpoint(spark: SparkSession, table: String): Long =
    writeCheckpoint(spark, table, parts = 1)

  /** Multi-part form (r10): the state's rows split round-robin over
    * `parts` files named `V.checkpoint.P.N.parquet` — how large tables
    * checkpoint so no single file carries millions of add rows; the
    * reader requires ALL N parts present (its r8 contract). Part 1
    * carries the metaData row.
    */
  def writeCheckpoint(spark: SparkSession, table: String, parts: Int): Long = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = state(spark, table)
    writerGuard(st, table, "checkpoint")
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", LongType),
      StructField("sizeInBytes", LongType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", dvType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("minWriterVersion", IntegerType),
      StructField("writerFeatures", ArrayType(StringType))))
    val ckSchema = StructType(Seq(
      StructField("metaData", metaType, nullable = true),
      StructField("protocol", protoType, nullable = true),
      StructField("add", addType, nullable = true)))
    def dvStruct(json: Option[String]): Row = json match {
      case None => null
      case Some(j) =>
        def f(n: String) = ("\"" + n + "\"\\s*:\\s*\"([^\"]*)\"").r
          .findFirstMatchIn(j).map(_.group(1)).orNull
        def num(n: String) = ("\"" + n + "\"\\s*:\\s*(-?\\d+)").r
          .findFirstMatchIn(j).map(_.group(1).toLong)
          .map(java.lang.Long.valueOf).orNull
        Row(f("storageType"), f("pathOrInlineDv"),
          num("offset"), num("sizeInBytes"), num("cardinality"))
    }
    // the checkpoint must carry the FULL protocol action — dropping the
    // writer half would let a post-checkpoint replay under-guard writes
    val protoRow: Option[Row] =
      if (st.minReaderVersion > 1 || st.readerFeatures.nonEmpty ||
          st.minWriterVersion > 1 || st.writerFeatures.nonEmpty)
        Some(Row(null, Row(st.minReaderVersion,
          if (st.readerFeatures.isEmpty) null else st.readerFeatures,
          st.minWriterVersion,
          if (st.writerFeatures.isEmpty) null else st.writerFeatures), null))
      else None
    val rows =
      (Row(Row("graft-ck", st.schema.json, st.partitionColumns,
        st.configuration), null, null) +: protoRow.toSeq) ++
        st.files.map(f => Row(null, null,
          Row(f.path, f.partitionValues, true, f.stats.orNull,
            dvStruct(f.deletionVector))))
    import scala.jdk.CollectionConverters._
    def writeOne(slice: Seq[Row], target: java.nio.file.Path): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(slice, 1), ckSchema)
      val tmp = Files.createTempDirectory("delta_ck")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = listParquet(tmp).headOption.get
      Files.move(part, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      deleteTmp(tmp)
    }
    val logDir = Paths.get(table, "_delta_log")
    if (parts == 1)
      writeOne(rows, logDir.resolve(f"${st.version}%020d.checkpoint.parquet"))
    else
      (1 to parts).foreach { p =>
        // round-robin: part p (1-based) takes rows p-1, p-1+parts, ...
        writeOne(rows.zipWithIndex.collect {
          case (r, i) if i % parts == p - 1 => r
        }, logDir.resolve(
          f"${st.version}%020d.checkpoint.$p%010d.$parts%010d.parquet"))
      }
    Files.writeString(logDir.resolve("_last_checkpoint"),
      if (parts == 1) s"""{"version":${st.version},"size":${rows.size}}"""
      else s"""{"version":${st.version},"size":${rows.size},"parts":$parts}""")
    st.version
  }

  /** OPTIMIZE — bin-packing compaction (r10b): rewrite every partition
    * group holding more than one live file OR any deletion vector into
    * fresh compacted file(s); DVs FOLD INTO the rewrite (dead rows
    * materialize away, the descriptor disappears), and the whole table
    * compacts in ONE atomic commit of paired remove+add actions with
    * `dataChange: false` — the OPTIMIZE contract (downstream CDC/
    * streaming consumers know no data changed). New files carry
    * numRecords + long-column min/max in `add.stats`, so
    * [[filesInRange]] skipping keeps working after the rewrite;
    * `maxRecordsPerFile > 0` bin-packs a large group into several
    * files. Untouched groups stay byte-identical, and time travel to
    * the pre-compaction version still sees the old layout. Returns the
    * new version.
    *
    * Scale shape: one distributed read+write per partition group (the
    * group's files scan in parallel, DV anti-joins run in executors);
    * the commit itself is file METADATA, driver-side like every log
    * operation.
    */
  def compact(spark: SparkSession, table: String,
              maxRecordsPerFile: Long = 0L): Long = {
    import org.apache.spark.sql.types.{LongType, StructType => SType}
    import spark.implicits._
    val st = state(spark, table)
    writerGuard(st, table, "compact")
    // columnMapping=name WRITE path (r12): data files — the ones read
    // AND the ones written — live under PHYSICAL names at every
    // nesting level; partitionValues keys are already physical in the
    // replayed state (the spec stores them physically), so grouping
    // and the emitted add actions carry them through unchanged.
    val mapped = st.columnMappingMode == "name"
    val dataFields =
      st.schema.fields.filterNot(f => st.partitionColumns.contains(f.name))
    val dataSchema =
      if (mapped) SType(dataFields.map(f =>
        f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
      else SType(dataFields)
    val groups = st.files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .filter { case (_, fs) =>
        fs.size > 1 || fs.exists(_.deletionVector.isDefined)
      }
    require(groups.nonEmpty,
      "nothing to compact: every partition group is a single DV-free file")
    val next = st.version + 1
    val anchor = Paths.get(table).toAbsolutePath.getFileName.toString
    val removes = Seq.newBuilder[String]
    val newRels = Seq.newBuilder[(String, String)] // (relPath, pvJson)
    groups.zipWithIndex.foreach { case ((pvals, files), gi) =>
      val base0 = spark.read.schema(dataSchema)
        .parquet(files.map(f => Paths.get(table, f.path).toString): _*)
      val hasDv = files.exists(_.deletionVector.isDefined)
      val df =
        if (!hasDv) base0
        else {
          val tagged = base0.select(base0.columns.map(col).toSeq :+
            col("_metadata.file_path").as("__fp") :+
            col("_metadata.row_index").as("__pos"): _*)
          val descriptors = files.flatMap(f =>
            f.deletionVector.map(dv => (f.path, dv)))
          val positions = spark.createDataset(descriptors)
            .flatMap { case (rel, dvJson) =>
              decodeDvPositions(table, dvJson).map(p => (rel, p))
            }.toDF("__dvp", "__dvpos")
          tagged.join(positions,
            substring_index(col("__fp"), "/" + anchor + "/", -1) === col("__dvp") &&
              col("__pos") === col("__dvpos"), "left_anti")
            .select(dataSchema.fieldNames.map(col).toSeq: _*)
        }
      val tmp = Files.createTempDirectory("delta_opt")
      val writer = df.coalesce(1).write.mode("overwrite")
      (if (maxRecordsPerFile > 0)
        writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer).parquet(tmp.toString)
      val parts = listParquet(tmp)
      val pvJson = pvJsonOf(pvals)
      parts.zipWithIndex.foreach { case (p, k) =>
        val rel = s"compact-$next-$gi-$k.parquet"
        Files.move(p, Paths.get(table, rel))
        newRels += ((rel, pvJson))
      }
      deleteTmp(tmp)
      files.foreach(f =>
        removes += s"""{"remove":{"path":"${f.path}","dataChange":false}}""")
    }
    // per-new-file stats (numRecords + long min/max) in ONE grouped scan
    val rels = newRels.result()
    val longCols = dataSchema.fields
      .filter(_.dataType == LongType).map(_.name).toSeq
    val statsByName: Map[String, String] = {
      val df = spark.read.schema(dataSchema)
        .parquet(rels.map(r => Paths.get(table, r._1).toString): _*)
      val aggs = count(lit(1)).as("__n") +: longCols.flatMap(c =>
        Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
      df.groupBy(col("_metadata.file_path").as("__fp"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          val name = r.getString(0).split("/").last
          def kv(pre: String): String = longCols.flatMap { c =>
            Option(r.getAs[Any](s"__${pre}_$c")).map(v => s""""$c":$v""")
          }.mkString(",")
          name -> (s"""{"numRecords":${r.getAs[Long]("__n")},""" +
            s""""minValues":{${kv("lo")}},"maxValues":{${kv("hi")}}}""")
        }.toMap
    }
    val adds = rels.map { case (rel, pvJson) =>
      val stats = statsByName.getOrElse(rel, """{"numRecords":0}""")
      s"""{"add":{"path":"$rel","partitionValues":$pvJson,""" +
        s""""dataChange":false,"stats":"${jsonEscape(stats)}"}}"""
    }
    writeCommit(table, st, next, removes.result() ++ adds)
    next
  }

  /** VACUUM (r11, F14h — the maintenance half of the Delta write
    * story, the sibling of Iceberg's expireSnapshots): physically
    * delete data files and DV files referenced by NO version in the
    * retained window [current − retainLast + 1, current] — the
    * superseded pre-OPTIMIZE / pre-replace files time travel was
    * holding hostage. Reference counting replays each retained
    * version's state (metadata-sized by contract); a file any retained
    * version can read survives, as does every referenced
    * `deletion_vector_*.bin`. Time travel below the window becomes
    * unreadable — exactly the real VACUUM contract. Returns
    * (retained version floor, deleted file count).
    */
  def vacuum(spark: SparkSession, table: String,
             retainLast: Int): (Long, Int) = {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    val curState = state(spark, table)
    writerGuard(curState, table, "vacuum")
    val cur = curState.version
    // a checkpoint-trimmed log cannot replay versions below its newest
    // checkpoint — those versions are already unreadable, so the
    // retention window floors at the oldest REPLAYABLE version
    val replayFloor = {
      val dir = Paths.get(table, "_delta_log")
      val entries = {
        val st = Files.list(dir)
        try st.iterator().asScala.map(_.getFileName.toString).toSeq
        finally st.close()
      }
      val commitVs = entries.filter(_.matches("\\d{20}\\.json"))
        .map(_.take(20).toLong).toSet
      val ckptVs = entries
        .filter(n => n.matches("\\d{20}\\.checkpoint\\.parquet") ||
          n.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
        .map(_.take(20).toLong)
      // v replays iff a checkpoint ≤ v exists with contiguous commits
      // after it (or commits are contiguous from 0) — state()'s rule
      def replayable(v: Long): Boolean =
        ckptVs.filter(_ <= v).maxOption match {
          case Some(c) => ((c + 1) to v).forall(commitVs.contains)
          case None => (0L to v).forall(commitVs.contains)
        }
      (0L to cur).find(replayable).getOrElse(cur)
    }
    val fromV = math.max(replayFloor, cur - retainLast + 1)
    val referenced = (fromV to cur).flatMap { v =>
      val st = state(spark, table, Some(v))
      st.files.flatMap { f =>
        // 'u'-storage resolves table-relative; 'p' (absolute) can still
        // land under the table root — a retained version READS it
        // (decodeDvPositions supports 'p'), so it must survive vacuum
        val dvFiles = f.deletionVector.toSeq.flatMap(dvBinPath(table, _))
        Paths.get(table, f.path).toAbsolutePath.normalize +: dvFiles
      }
    } .toSet ++
      // `_change_data` files of RETAINED commits stay (F14n): a CDF read
      // over the retained window replays them; below-window commits are
      // unreadable anyway, so their cdc files are fair game. A retained
      // version whose json was checkpoint-trimmed has no cdc to keep.
      (fromV to cur)
        .filter(v => Files.exists(
          Paths.get(table, "_delta_log", f"$v%020d.json")))
        .flatMap { v =>
          commitActions(table, v).filter(_.kind == "cdc")
            .map(a => Paths.get(table, a.path).toAbsolutePath.normalize)
        }
    val root = Paths.get(table).toAbsolutePath.normalize
    val walk = Files.walk(root)
    val all = try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.startsWith(root.resolve("_delta_log")) &&
        (p.getFileName.toString.endsWith(".parquet") ||
          p.getFileName.toString.startsWith("deletion_vector_")))
      .toSeq
    finally walk.close()
    var deleted = 0
    all.filterNot(p => referenced.contains(p.normalize))
      .sortBy(_.toString).foreach { p =>
        if (Files.deleteIfExists(p)) deleted += 1
      }
    (fromV, deleted)
  }

  /** Row-level CHANGES between two versions (r11, F14i — the change
    * feed every downstream CDC consumer wants from a lake table):
    * `_change_type = insert` rows are in `toV` but not `fromV`,
    * `delete` rows the reverse — multiset semantics via exceptAll, so
    * duplicate rows count correctly; an UPDATE surfaces as its
    * delete + insert pair (full-row CDF; the reference's key-based
    * merge consumes exactly this shape). Distributed set difference —
    * two snapshot scans and two anti-semijoins, never a driver diff.
    * Schema drift between the versions rejects loudly (full-row diff
    * needs one row shape).
    */
  def tableChanges(spark: SparkSession, table: String,
                   fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"tableChanges wants fromV < toV, got $fromV..$toV")
    val before = read(spark, table, Some(fromV))
    val after = read(spark, table, Some(toV))
    require(before.schema.fieldNames.sameElements(after.schema.fieldNames),
      s"schema changed between v$fromV and v$toV " +
        s"(${before.schema.fieldNames.mkString(",")} vs " +
        s"${after.schema.fieldNames.mkString(",")}): full-row diff needs " +
        "one row shape")
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** RESTORE the table to an old version (r11, F14j — the undo button:
    * a bad write rolls back WITHOUT rewriting history): one new commit
    * whose removes drop every live file the target version does not
    * hold and whose adds re-instate the target's files (partition
    * values, stats, and DV descriptors carried through verbatim), so
    * time travel still sees the bad interval while the head state is
    * the old one — exactly Delta's own RESTORE semantics. Requires
    * every re-added file to still exist (a vacuumed target rejects
    * loudly). Returns the new version.
    */
  /** Is the inCommitTimestamp feature ON for this state (the config
    * key the protocol gates behind the v7 `inCommitTimestamp` writer
    * feature)?
    */
  private[sources] def ictEnabled(st: State): Boolean =
    st.configuration.getOrElse(
      "delta.enableInCommitTimestamps", "false") == "true"

  /** The `commitInfo.inCommitTimestamp` of commit `v`, if the commit
    * recorded one — driver-side regex over one json commit
    * (metadata-sized); None for legacy commits and trimmed logs.
    */
  private[graft] def ictOf(table: String, v: Long): Option[Long] = {
    val p = Paths.get(table, "_delta_log", f"$v%020d.json")
    if (!Files.exists(p)) None
    else {
      val txt = Files.readString(p)
      if (!txt.contains("\"commitInfo\"")) None
      else "\"inCommitTimestamp\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toLong)
    }
  }

  /** Write commit `next`'s json, stamping a `commitInfo` action with
    * `inCommitTimestamp` when the feature is enabled (r13, task 4:
    * mtimes don't survive log copy/restore; the in-commit form is the
    * durable one). The stamp is forced monotonic past the previous
    * commit's — the protocol's own clock-skew rule. `nowMs < 0` uses
    * the wall clock (the normal path); fixtures pass a pinned instant.
    */
  private[sources] def writeCommit(table: String, st: State, next: Long,
                                   lines: Seq[String],
                                   nowMs: Long = -1L): Unit = {
    val all =
      if (!ictEnabled(st)) lines
      else {
        val prev = if (next == 0L) None else ictOf(table, next - 1)
        val base = if (nowMs >= 0) nowMs else System.currentTimeMillis()
        val ts = math.max(base, prev.map(_ + 1).getOrElse(Long.MinValue))
        s"""{"commitInfo":{"inCommitTimestamp":$ts}}""" +: lines
      }
    Files.writeString(
      Paths.get(table, "_delta_log", f"$next%020d.json"),
      all.mkString("\n"))
  }

  /** TIME TRAVEL BY TIMESTAMP (r12, the r11 verdict's #3 gap: "users
    * ask for 'the table as of yesterday', not 'version 47'"): resolve
    * a wall-clock instant to the LAST commit at or before it. Commit
    * time = the commit's `commitInfo.inCommitTimestamp` when recorded
    * (r13 — the durable form: it survives log copy/restore, which
    * mtimes do not), else the log file's modification time (the
    * classic resolution for legacy commits — a MIXED log resolves
    * per-commit); both adjusted to be monotonic in version order
    * exactly as the reference implementation does (a clock-skewed
    * later commit inherits its predecessor's time). Rejects an
    * instant before the first commit — there is no table to read
    * there.
    */
  def versionAtTimestamp(table: String, tsMillis: Long): Long = {
    val dir = Paths.get(table, "_delta_log")
    require(Files.isDirectory(dir), s"not a delta table: $table")
    val commits = {
      val st = Files.list(dir)
      try st.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .map { p =>
          val v = p.getFileName.toString.take(20).toLong
          (v, ictOf(table, v).getOrElse(
            Files.getLastModifiedTime(p).toMillis))
        }
        .toSeq.sortBy(_._1)
      finally st.close()
    }
    require(commits.nonEmpty, s"no commits in delta log: $table")
    var runningMax = Long.MinValue
    val adjusted = commits.map { case (v, t) =>
      runningMax = math.max(runningMax, t); (v, runningMax)
    }
    require(adjusted.head._2 <= tsMillis,
      s"timestampAsOf $tsMillis is before the first commit " +
        s"(${adjusted.head._2}): $table")
    adjusted.takeWhile(_._2 <= tsMillis).last._1
  }

  /** [[read]] pinned to the snapshot a wall-clock instant saw —
    * `timestampAsOf` resolved through [[versionAtTimestamp]].
    */
  def readAsOfTimestamp(spark: SparkSession, table: String,
                        tsMillis: Long): DataFrame =
    read(spark, table, versionAsOf = Some(versionAtTimestamp(table, tsMillis)))

  /** Resolve a DV descriptor's on-disk `.bin` path (absolute,
    * normalized): 'u' storage is table-relative (optional prefix +
    * z85 uuid), 'p' is an absolute path; inline ('i') has no file.
    * Used by [[vacuum]]'s referenced set and [[restore]]'s
    * exists-before-re-add check so both agree on resolution.
    */
  private[sources] def dvBinPath(table: String,
                                 dvJson: String): Option[java.nio.file.Path] = {
    def fld(n: String) = ("\"" + n + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(dvJson).map(_.group(1))
    fld("storageType") match {
      case Some("u") => fld("pathOrInlineDv").map { payload =>
        val (prefix, uuidPart) = payload.splitAt(payload.length - 20)
        val uuid = DeletionVectors.z85Uuid(uuidPart)
        val rel = (if (prefix.nonEmpty) prefix.stripSuffix("/") + "/" else "") +
          s"deletion_vector_$uuid.bin"
        Paths.get(table, rel).toAbsolutePath.normalize
      }
      case Some("p") =>
        fld("pathOrInlineDv").map(Paths.get(_).toAbsolutePath.normalize)
      case _ => None // inline: nothing on disk
    }
  }

  def restore(spark: SparkSession, table: String, toVersion: Long): Long = {
    val cur = state(spark, table)
    writerGuard(cur, table, "restore")
    require(toVersion < cur.version,
      s"restore target v$toVersion is not below current v${cur.version}")
    val tgt = state(spark, table, Some(toVersion))
    require(tgt.schema == cur.schema,
      s"schema changed since v$toVersion: restore across schema " +
        "evolution is not in the stated subset")
    val curByPath = cur.files.map(f => f.path -> f).toMap
    val tgtByPath = tgt.files.map(f => f.path -> f).toMap
    val removes = cur.files.filterNot(f => tgtByPath.get(f.path).contains(f))
    val adds = tgt.files.filterNot(f => curByPath.get(f.path).contains(f))
    require(removes.nonEmpty || adds.nonEmpty,
      s"restore to v$toVersion is a no-op: states identical")
    adds.foreach { f =>
      require(Files.exists(Paths.get(table, f.path)),
        s"cannot restore v$toVersion: ${f.path} no longer exists (vacuumed?)")
      // a re-added descriptor may carry a DV — the .bin must also have
      // survived vacuum, else the restore succeeds and the READ fails
      f.deletionVector.flatMap(dvBinPath(table, _)).foreach(dv =>
        require(Files.exists(dv),
          s"cannot restore v$toVersion: DV $dv no longer exists (vacuumed?)"))
    }
    val lines =
      removes.map(f =>
        s"""{"remove":{"path":"${jsonEscape(f.path)}","dataChange":true}}""") ++
      adds.map { f =>
        val stats = f.stats.map(s =>
          s""","stats":"${jsonEscape(s)}"""").getOrElse("")
        val dv = f.deletionVector.map(d =>
          s""","deletionVector":$d""").getOrElse("")
        s"""{"add":{"path":"${jsonEscape(f.path)}","partitionValues":${pvJsonOf(f.partitionValues)},"dataChange":true$stats$dv}}"""
      }
    val next = cur.version + 1
    writeCommit(table, cur, next, lines)
    next
  }

  /** [[tableChanges]] with per-VERSION attribution (r11): one
    * delete/insert diff per commit step in (fromV, toV], each row
    * stamped with the `_commit_version` that produced it — the full
    * CDF shape (a consumer replaying history needs to know WHICH
    * commit changed a row, not just the endpoint diff). Version count
    * bounds the scan count; each step is the same distributed
    * exceptAll pair.
    */
  def tableChangesByVersion(spark: SparkSession, table: String,
                            fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"tableChangesByVersion wants fromV < toV, got $fromV..$toV")
    (fromV until toV).map { v =>
      tableChanges(spark, table, v, v + 1)
        .withColumn("_commit_version", lit(v + 1))
    }.reduce(_ unionByName _)
  }

  /** One parsed file action of a single commit (F14n). */
  private final case class CommitAction(kind: String, path: String,
                                        pv: Map[String, String],
                                        dataChange: Boolean,
                                        dv: Option[String])

  /** The file actions of commit `v` — driver-side parse of ONE json
    * commit (metadata-sized by contract).
    */
  private def commitActions(table: String, v: Long): Seq[CommitAction] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val p = Paths.get(table, "_delta_log", f"$v%020d.json")
    require(Files.exists(p), s"commit v$v missing: $table")
    Files.readAllLines(p).asScala.filter(_.nonEmpty).toSeq.flatMap { line =>
      val j = JsonMethods.parse(line)
      Seq("cdc", "add", "remove").flatMap { k =>
        (j \ k) match {
          case JNothing => None
          case a =>
            val path = (a \ "path") match {
              case JString(s) => s
              case _ => throw new IllegalArgumentException(
                s"$k action without path in v$v: $table")
            }
            val pv = (a \ "partitionValues") match {
              case JObject(fs) =>
                fs.collect { case (n, JString(s)) => n -> s }.toMap
              case _ => Map.empty[String, String]
            }
            val dc = (a \ "dataChange") match {
              case JBool(b) => b
              case _ => true
            }
            val dvj = (a \ "deletionVector") match {
              case JNothing => None
              case d => Some(JsonMethods.compact(JsonMethods.render(d)))
            }
            Some(CommitAction(k, path, pv, dc, dvj))
        }
      }
    }
  }

  /** F14n (r12): the RECORDED change feed — per-commit changes exactly
    * as the Delta CDF contract defines them. A commit with `cdc`
    * actions reads its `_change_data` files verbatim (this is where
    * UPDATE pre/post images live — `update_preimage`/
    * `update_postimage`, which no snapshot diff can reconstruct); a
    * commit WITHOUT cdc actions derives per the spec's allowed
    * omissions: add-only commits are pure inserts of the added files,
    * remove-only commits pure deletes of the removed files' LIVE rows
    * (the prior version's deletion vector applied — already-deleted
    * rows are not deleted again); a mixed commit without cdc cannot be
    * derived exactly and rejects loudly. `fromV = -1` starts at the
    * first commit (version 0's inserts included); the range is
    * otherwise (fromV, toV] like [[tableChangesByVersion]], with
    * `_commit_version` stamped per row.
    */
  def tableChangesCdf(spark: SparkSession, table: String,
                      fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType => SType}
    require(fromV >= -1 && fromV < toV,
      s"tableChangesCdf wants -1 <= fromV < toV, got $fromV..$toV")
    val st = state(spark, table, Some(toV))
    require(st.columnMappingMode == "none",
      s"CDF read on a column-mapped table is not in the stated subset: $table")
    // the recorded feed is only complete when the WRITERS were
    // recording — real Delta errors on a CDF read over a range where
    // delta.enableChangeDataFeed was off, and so does this (r13; the
    // check is against the range-end state, the stated subset)
    require(st.configuration.getOrElse(
        "delta.enableChangeDataFeed", "false") == "true",
      s"delta.enableChangeDataFeed is not set on $table: the recorded " +
        "change feed would be silently incomplete (use tableChanges/" +
        "tableChangesByVersion for the snapshot diff)")
    val dataSchema = SType(
      st.schema.fields.filterNot(f => st.partitionColumns.contains(f.name)))
    val cdcSchema = SType(dataSchema.fields :+
      StructField("_change_type", StringType, nullable = false))
    def attachPv(df: DataFrame, pv: Map[String, String]): DataFrame =
      st.partitionColumns.foldLeft(df) { (d, c) =>
        val f = st.schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(s"partition column $c not in schema"))
        d.withColumn(c, lit(pv.get(c).orNull).cast(f.dataType))
      }
    def ordered(df: DataFrame): DataFrame =
      df.select((st.schema.fieldNames.toSeq :+ "_change_type").map(col): _*)
    def minusDv(df: DataFrame, dvJson: Option[String]): DataFrame = dvJson match {
      case None => df.drop("__pos")
      case Some(d) =>
        import spark.implicits._
        val pos = spark.createDataset(decodeDvPositions(table, d).toSeq)
          .toDF("__pos")
        df.join(pos, Seq("__pos"), "left_anti").drop("__pos")
    }
    val perVersion = (math.max(fromV + 1, 0L) to toV).flatMap { v =>
      val acts = commitActions(table, v)
      val cdc = acts.filter(_.kind == "cdc")
      val adds = acts.filter(a => a.kind == "add" && a.dataChange)
      val removes = acts.filter(a => a.kind == "remove" && a.dataChange)
      val changes: Option[DataFrame] =
        if (cdc.nonEmpty) Some(cdc.map { a =>
          val df = spark.read.schema(cdcSchema)
            .parquet(Paths.get(table, a.path).toString)
          ordered(attachPv(df, a.pv))
        }.reduce(_ unionAll _))
        else if (adds.nonEmpty && removes.isEmpty) {
          require(adds.forall(_.dv.isEmpty),
            s"add-only commit v$v carries a deletion vector: the CDF " +
              s"derivation for that shape is not in the stated subset: $table")
          Some(adds.map { a =>
            val df = spark.read.schema(dataSchema)
              .parquet(Paths.get(table, a.path).toString)
            ordered(attachPv(df, a.pv)
              .withColumn("_change_type", lit("insert")))
          }.reduce(_ unionAll _))
        } else if (removes.nonEmpty && adds.isEmpty) {
          val prior = state(spark, table, Some(v - 1))
          Some(removes.map { a =>
            val priorFile = prior.files.find(_.path == a.path)
            val priorDv = priorFile.flatMap(_.deletionVector)
            // remove actions routinely OMIT partitionValues (this
            // repo's own compact/restore removes do) — the prior
            // version's live entry is the authoritative source (r13;
            // a.pv is the fallback for foreign logs that carry it)
            val pv = priorFile.map(_.partitionValues).getOrElse(a.pv)
            val df = spark.read.schema(dataSchema)
              .parquet(Paths.get(table, a.path).toString)
              .select(col("_metadata.row_index").as("__pos"), col("*"))
            ordered(attachPv(minusDv(df, priorDv), pv)
              .withColumn("_change_type", lit("delete")))
          }.reduce(_ unionAll _))
        } else if (adds.isEmpty && removes.isEmpty) {
          // a commit whose only action is a dataChange=false re-add
          // with a GROWN deletion vector (a foreign writer's DV delete
          // that did not record cdc) still deletes rows — derive them
          // exactly from the DV position delta instead of yielding a
          // silently empty feed (r13). No growth (metadata-only bump,
          // pure re-delete) = genuinely empty, not an error.
          val dvAdds = acts.filter(a =>
            a.kind == "add" && !a.dataChange && a.dv.isDefined)
          lazy val prior = state(spark, table, Some(v - 1))
          val grown = dvAdds.flatMap { a =>
            val priorFile = prior.files.find(_.path == a.path)
            val newPos = decodeDvPositions(table, a.dv.get).toSet
            val oldPos = priorFile.flatMap(_.deletionVector)
              .map(d => decodeDvPositions(table, d).toSet)
              .getOrElse(Set.empty[Long])
            val delta = newPos -- oldPos
            if (delta.isEmpty) None
            else Some((a, priorFile.map(_.partitionValues).getOrElse(a.pv),
              delta))
          }
          if (grown.isEmpty) None
          else {
            import spark.implicits._
            Some(grown.map { case (a, pv, delta) =>
              val pos = spark.createDataset(delta.toSeq).toDF("__pos")
              val df = spark.read.schema(dataSchema)
                .parquet(Paths.get(table, a.path).toString)
                .select(col("_metadata.row_index").as("__pos"), col("*"))
                .join(pos, Seq("__pos"), "left_semi").drop("__pos")
              ordered(attachPv(df, pv)
                .withColumn("_change_type", lit("delete")))
            }.reduce(_ unionAll _))
          }
        }
        else throw new IllegalArgumentException(
          s"commit v$v mixes adds and removes without recorded cdc " +
            s"actions — the change feed cannot be derived exactly: $table")
      changes.map(_.withColumn("_commit_version", lit(v)))
    }
    if (perVersion.isEmpty) {
      // a range of no-op commits (e.g. a DV re-add with nothing newly
      // deleted) is an EMPTY feed, not an error — the streaming source
      // hits this shape on any metadata-only version bump
      val outSchema = SType(st.schema.fields.toSeq ++ Seq(
        StructField("_change_type", StringType, nullable = false),
        StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    } else perVersion.reduce(_ unionByName _)
  }

  /** DELETE rows from one live data file via a DELETION VECTOR (r10 —
    * the modern Delta delete: emit a Roaring DV instead of rewriting
    * the file). Reads `relPath` with parquet row indexes, evaluates
    * `predicate` over the data columns, encodes the matching positions
    * as a portable RoaringBitmapArray ([[DeletionVectors
    * .encodePortable64]] — house encoder, canonical-library-pinned in
    * the spec), writes `deletion_vector_<uuid>.bin` under the table
    * root, and appends a commit re-adding the file with `dataChange:
    * false` and the `u`-storage descriptor. Returns the new version.
    *
    * Re-delete on a file that ALREADY carries a DV (r11): the existing
    * bitmap decodes and UNIONS with the new positions — what real
    * engines do on a hot file — so the re-added descriptor covers both
    * generations of deletes; the earlier DV file stays on disk for
    * time travel.
    *
    * Scale shape: the position set is per-FILE (Delta's own DV writer
    * materializes one bitmap per file too) — bounded by one file's
    * row count, collected once on the driver, never the table's.
    */
  def deleteWithDv(spark: SparkSession, table: String, relPath: String,
                   predicate: org.apache.spark.sql.Column,
                   uuid: java.util.UUID = java.util.UUID.randomUUID()): Long = {
    val st = state(spark, table)
    writerGuard(st, table, "deleteWithDv")
    val target = st.files.find(_.path == relPath).getOrElse(
      throw new IllegalArgumentException(s"$relPath is not a live file of $table"))
    // columnMapping=name (r12): the file stores PHYSICAL names but the
    // caller's predicate speaks LOGICAL ones — alias back (the read
    // path's mapping) before evaluating; positions are name-agnostic.
    val raw = spark.read
      .parquet(Paths.get(table, relPath).toString)
      .select(col("_metadata.row_index").as("__pos"),
        col("*"))
    val forPredicate =
      if (st.columnMappingMode != "name") raw
      else raw.select(col("__pos") +:
        st.schema.fields.filterNot(f => st.partitionColumns.contains(f.name))
          .toSeq.map(f => col(physicalName(f)).cast(f.dataType).as(f.name)): _*)
    val fresh = forPredicate
      .filter(predicate)
      .select("__pos").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    require(fresh.nonEmpty, "predicate deleted no rows: refuse a no-op DV")
    // F14n (r12): a CDF-enabled table RECORDS its deletes — the newly
    // deleted rows (this commit's positions only, never re-deletes)
    // land as a `_change_data` file + cdc action in the same commit,
    // which is what makes update/delete commits exactly replayable
    // downstream (the spec's contract; snapshot diffs cannot tell an
    // update apart). Column-mapped + CDF stays out of subset, loud.
    val cdfEnabled =
      st.configuration.getOrElse("delta.enableChangeDataFeed", "false") == "true"
    require(!cdfEnabled || st.columnMappingMode == "none",
      s"deleteWithDv with changeDataFeed on a column-mapped table is " +
        s"not in the stated subset: $table")
    val existing = target.deletionVector.toSeq
      .flatMap(dvJson => decodeDvPositions(table, dvJson)).toSet
    // the CDF records NEWLY deleted rows only — a predicate re-matching
    // an already-deleted row deletes nothing (exactly-once feed)
    val newly = fresh.toSet -- existing
    val positions = (fresh.toSet ++ existing).toArray.sorted
    val bitmap = DeletionVectors.encodePortable64(positions)
    val (dvFile, dvOff, dvSize) = DeletionVectors.dvFileBytes(bitmap)
    Files.write(Paths.get(table, s"deletion_vector_$uuid.bin"), dvFile)
    val ub = java.nio.ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val z85 = DeletionVectors.z85Encode(ub.array())
    val pvJson = pvJsonOf(target.partitionValues)
    val cdcLine: Option[String] =
      if (!cdfEnabled || newly.isEmpty) None
      else {
        import spark.implicits._
        val posDf = spark.createDataset(newly.toSeq).toDF("__pos")
        val deletedRows = raw.join(posDf, Seq("__pos"), "left_semi")
          .drop("__pos")
          .withColumn("_change_type", lit("delete"))
        val rel = s"_change_data/cdc-$uuid.parquet"
        val tmp = Files.createTempDirectory("delta_cdc")
        deletedRows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = listParquet(tmp).headOption.getOrElse(
          throw new IllegalStateException("cdc write produced no parquet"))
        Files.createDirectories(Paths.get(table, "_change_data"))
        Files.move(part, Paths.get(table, rel))
        deleteTmp(tmp)
        val size = Files.size(Paths.get(table, rel))
        Some(s"""{"cdc":{"path":"$rel","partitionValues":$pvJson,""" +
          s""""size":$size,"dataChange":false}}""")
      }
    val commit =
      s"""{"add":{"path":"$relPath","partitionValues":$pvJson,""" +
        s""""dataChange":false,"deletionVector":{"storageType":"u",""" +
        s""""pathOrInlineDv":"$z85","offset":$dvOff,"sizeInBytes":$dvSize,""" +
        s""""cardinality":${positions.length}}}}"""
    val next = st.version + 1
    writeCommit(table, st, next, commit +: cdcLine.toSeq)
    next
  }
}
