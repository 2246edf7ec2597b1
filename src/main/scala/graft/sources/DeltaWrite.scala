package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** F14o (r13): the Delta WRITE side beyond maintenance — CREATE,
  * APPEND, and the key-based MERGE/upsert that points the reference's
  * own replication loop (scripts/03_cdc_etl.py:203-379: per-table
  * delta → MERGE → watermark) at the lake format the engine already
  * reads, compacts, restores, and vacuums. This is also the only
  * writer that produces UPDATE pre/post images in the RECORDED change
  * feed (`_change_data` + cdc actions) — the one CDF shape no snapshot
  * diff can reconstruct ([[DeltaLog.tableChangesCdf]]).
  *
  * Merge semantics are [[graft.cdc.Cdc.mergeSoftDelete]]'s, re-expressed
  * as a transaction-log commit:
  *  - matched keys take ALL staged column values (a soft delete flips
  *    `is_deleted` in place — an UPDATE, recorded as pre/post images);
  *  - unmatched staged rows insert only when they pass `insertFilter`
  *    (the reference MERGE's `WHERE s.IS_DELETED = 'N'` guard);
  *  - unmatched target rows pass through untouched — files holding no
  *    matched key are NEVER rewritten.
  *
  * Scale shape: the classic lake MERGE plan — one distributed
  * semi-join finds the TOUCHED files (driver holds only their paths,
  * bounded by file count), only those files rewrite (survivors
  * anti-join + updated rows + inserts, one distributed write), and the
  * commit itself is metadata. Untouched files stay byte-identical, so
  * steady-state incremental merges cost O(touched data), not O(table).
  */
object DeltaWrite {

  /** CREATE a new Delta table at `path` from `df` — v0: data files,
    * the metaData action (schema, partition columns, configuration),
    * and an optional protocol action when the configuration enables
    * feature-gated behavior (inCommitTimestamps ⇒ v7 writer feature).
    * Partition column types are bounded to string/int/long (the
    * stated subset: their string form round-trips the
    * `partitionValues` map losslessly). Returns version 0.
    */
  def create(spark: SparkSession, path: String, df: DataFrame,
             partitionColumns: Seq[String] = Seq.empty,
             configuration: Map[String, String] = Map.empty,
             nowMs: Long = -1L): Long = {
    require(!Files.exists(Paths.get(path, "_delta_log")),
      s"delta table already exists: $path")
    val schema = df.schema
    partitionColumns.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"partition column $c not in schema"))
      require(Seq("string", "integer", "long").contains(f.dataType.typeName),
        s"partition column $c has type ${f.dataType.typeName}: the " +
          "stated subset partitions on string/int/long only")
    }
    Files.createDirectories(Paths.get(path, "_delta_log"))
    val st = DeltaLog.State(0L, schema, partitionColumns,
      Seq.empty, configuration)
    val written = writeDataFiles(spark, path, st, df, "part-0")
    val confJson = configuration.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${DeltaLog.jsonEscape(k)}":"${DeltaLog.jsonEscape(v)}""""
    }.mkString("{", ",", "}")
    val meta =
      s"""{"metaData":{"id":"graft-${path.split('/').last}",""" +
        s""""schemaString":"${DeltaLog.jsonEscape(schema.json)}",""" +
        s""""partitionColumns":[${partitionColumns.map(c =>
          "\"" + DeltaLog.jsonEscape(c) + "\"").mkString(",")}],""" +
        s""""configuration":$confJson}}"""
    val proto =
      if (configuration.getOrElse("delta.enableInCommitTimestamps",
          "false") == "true")
        Seq(s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          s""""writerFeatures":["inCommitTimestamp"]}}""")
      else Seq.empty
    val adds = addLines(spark, path, st, written, dataChange = true)
    DeltaLog.writeCommit(path, st, 0L, proto ++ Seq(meta) ++ adds, nowMs)
    0L
  }

  /** APPEND `df` as a new commit of pure adds (`dataChange: true`) —
    * the CDF spec's derived-insert shape, no cdc action needed.
    * Returns the new version.
    */
  def append(spark: SparkSession, table: String, df: DataFrame,
             nowMs: Long = -1L): Long = {
    val st = DeltaLog.state(spark, table)
    DeltaLog.writerGuard(st, table, "append")
    require(df.schema.fieldNames.toSet == st.schema.fieldNames.toSet,
      s"append schema mismatch: table=${st.schema.fieldNames.mkString(",")} " +
        s"df=${df.schema.fieldNames.mkString(",")}")
    val next = st.version + 1
    val written = writeDataFiles(spark, table, st,
      df.select(st.schema.fieldNames.map(col).toSeq: _*), s"part-$next")
    require(written.nonEmpty, "empty append: refuse a no-op commit")
    DeltaLog.writeCommit(table, st, next,
      addLines(spark, table, st, written, dataChange = true), nowMs)
    next
  }

  /** Key-based MERGE of `staged` into the table (soft-delete CDC
    * semantics above). `staged` must be unique per `pk` (use
    * [[graft.cdc.Cdc.latestPerKey]] first) and share the table's
    * column set. When `delta.enableChangeDataFeed` is set, the commit
    * records its cdc actions: `update_preimage`/`update_postimage`
    * for every matched key (the staged values count as the update,
    * exactly the real MERGE contract) and `insert` for the new keys;
    * the rewritten files' add/remove actions stay `dataChange: true`
    * and the recorded feed overrides their derivation. Returns the
    * new version — or the CURRENT version when the staged batch
    * matches nothing and inserts nothing (an all-tombstones-for-
    * absent-keys delta is a legitimate CDC outcome, not an error).
    */
  def merge(spark: SparkSession, table: String, staged: DataFrame,
            pk: Seq[String], insertFilter: Option[Column] = None,
            nowMs: Long = -1L): Long = {
    val st0 = DeltaLog.state(spark, table)
    DeltaLog.writerGuard(st0, table, "merge")
    // SCHEMA EVOLUTION on merge (r13): a column the source ADDED joins
    // the table schema in this commit's metaData action — existing
    // data files simply lack it, and the schema-pinned scans read the
    // missing column as NULL for pre-evolution rows (parquet's own
    // rule); a column the source DROPPED is retained (replicas never
    // lose data silently) and staged rows carry NULL for it — exactly
    // [[graft.cdc.Pipeline.alignSchemas]]'s contract, applied at the
    // transaction log. Out of the stated subset: evolving a PARTITION
    // or PK column, and type changes (same name, new type) — loud.
    val newFields = staged.schema.fields
      .filterNot(f => st0.schema.fieldNames.contains(f.name))
    staged.schema.fields.foreach { f =>
      st0.schema.fields.find(_.name == f.name).foreach { tf =>
        require(tf.dataType == f.dataType,
          s"merge column ${f.name} changes type ${tf.dataType.simpleString}" +
            s" -> ${f.dataType.simpleString}: type evolution is not in " +
            s"the stated subset: $table")
      }
    }
    require(newFields.isEmpty || st0.columnMappingMode == "none",
      s"schema evolution on a column-mapped table needs fresh physical " +
        s"names and is not in the stated subset: $table")
    val st =
      if (newFields.isEmpty) st0
      else st0.copy(schema = StructType(st0.schema.fields ++ newFields))
    val cols = st.schema.fieldNames.toSeq
    require(pk.nonEmpty && pk.forall(cols.contains),
      s"merge pk ${pk.mkString(",")} not in table columns")
    require(pk.forall(k => newFields.forall(_.name != k)),
      s"merge pk ${pk.mkString(",")} cannot be a newly added column")
    // staged rows align to the (possibly evolved) table schema:
    // retained-but-dropped columns fill NULL
    val stagedAligned = st.schema.fields
      .filterNot(f => staged.columns.contains(f.name))
      .foldLeft(staged) { (d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType))
      }
    require(stagedAligned.columns.toSet == cols.toSet,
      s"merge schema mismatch: table=${cols.mkString(",")} " +
        s"staged=${staged.columns.mkString(",")}")
    val cdfEnabled = st.configuration.getOrElse(
      "delta.enableChangeDataFeed", "false") == "true"
    require(!cdfEnabled || st.columnMappingMode == "none",
      s"merge with changeDataFeed on a column-mapped table is not in " +
        s"the stated subset: $table")
    val src = stagedAligned.select(cols.map(col): _*)
    val srcKeys = src.select(pk.map(col): _*).distinct()
    val snap = DeltaLog.readInternal(spark, table, st,
      _ => true, Map.empty, tagRel = true) // cols + __graft_rel
    // the TOUCHED files: every file holding at least one matched key —
    // one distributed semi-join, driver collects only file paths
    val affected = snap.join(srcKeys, pk, "left_semi")
      .select("__graft_rel").distinct()
      .collect().map(_.getString(0)).toSet
    val snapCols = snap.drop("__graft_rel")
    val liveKeys = snapCols.select(pk.map(col): _*).distinct()
    val preimages = snapCols.join(srcKeys, pk, "left_semi")
    val postimages = src.join(liveKeys, pk, "left_semi")
    val inserts0 = src.join(liveKeys, pk, "left_anti")
    val inserts = insertFilter.map(inserts0.filter).getOrElse(inserts0)
    if (affected.isEmpty && inserts.isEmpty) return st.version
    val survivors = snap
      .filter(col("__graft_rel").isInCollection(
        if (affected.isEmpty) Set("") else affected))
      .join(srcKeys, pk, "left_anti")
      .drop("__graft_rel")
    val next = st.version + 1
    val written = writeDataFiles(spark, table, st,
      survivors.unionByName(postimages).unionByName(inserts)
        .select(cols.map(col): _*),
      s"merge-$next")
    // the evolved schema rides the same commit as its first data —
    // readers at this version and later see the new column (NULL for
    // pre-evolution rows), time travel below it sees the old shape
    val metaLines: Seq[String] =
      if (newFields.isEmpty) Seq.empty
      else {
        val confJson = st.configuration.toSeq.sortBy(_._1).map { case (c, v) =>
          s""""${DeltaLog.jsonEscape(c)}":"${DeltaLog.jsonEscape(v)}""""
        }.mkString("{", ",", "}")
        Seq(s"""{"metaData":{"id":"graft-${table.split('/').last}",""" +
          s""""schemaString":"${DeltaLog.jsonEscape(st.schema.json)}",""" +
          s""""partitionColumns":[${st.partitionColumns.map(c =>
            "\"" + DeltaLog.jsonEscape(c) + "\"").mkString(",")}],""" +
          s""""configuration":$confJson}}""")
      }
    val removes = affected.toSeq.sorted.map { rel =>
      s"""{"remove":{"path":"${DeltaLog.jsonEscape(rel)}","dataChange":true}}"""
    }
    val adds = addLines(spark, table, st, written, dataChange = true)
    val cdcLines: Seq[String] =
      if (!cdfEnabled) Seq.empty
      else {
        val changes = preimages
          .withColumn("_change_type", lit("update_preimage"))
          .unionByName(postimages
            .withColumn("_change_type", lit("update_postimage")))
          .unionByName(inserts.withColumn("_change_type", lit("insert")))
        val dataCols = cols.filterNot(st.partitionColumns.contains)
        val cdcFiles = writeDataFiles(spark, table,
          st.copy(schema = StructType(st.schema.fields.filter(f =>
            dataCols.contains(f.name) || st.partitionColumns.contains(f.name)) :+
            org.apache.spark.sql.types.StructField("_change_type",
              org.apache.spark.sql.types.StringType))),
          changes.select((dataCols :+ "_change_type").map(col) ++
            st.partitionColumns.map(col): _*),
          s"cdc-$next", subdir = "_change_data")
        cdcFiles.map { case (rel, pv) =>
          s"""{"cdc":{"path":"${DeltaLog.jsonEscape(rel)}",""" +
            s""""partitionValues":${DeltaLog.pvJsonOf(pv)},""" +
            s""""dataChange":false}}"""
        }
      }
    DeltaLog.writeCommit(table, st, next,
      metaLines ++ removes ++ adds ++ cdcLines, nowMs)
    next
  }

  /** Write `rows` as data parquet files of the table: one distributed
    * `partitionBy` write (partition values parsed back from the `k=v`
    * directory layout, Hive-unescaped), files moved under the table
    * root (partitioned files under their `k=v/` directories — the
    * layout the fixtures use), physical names applied under
    * columnMapping=name at every nesting level. Returns
    * (relative path, partitionValues) per file — partitionValues keys
    * PHYSICAL under mapping, the spec's storage rule.
    */
  private def writeDataFiles(spark: SparkSession, table: String,
                             st: DeltaLog.State, rows: DataFrame,
                             prefix: String,
                             subdir: String = ""): Seq[(String, Map[String, String])] = {
    val mapped = st.columnMappingMode == "name"
    val fieldByName = st.schema.fields.map(f => f.name -> f).toMap
    val physByLogical: Map[String, String] =
      st.schema.fields.map(f => f.name -> DeltaLog.physicalName(f)).toMap
    val ordered = rows.select(rows.columns.map { c =>
      fieldByName.get(c) match {
        case Some(f) if mapped =>
          col(c).cast(DeltaLog.physicalType(f.dataType))
            .as(DeltaLog.physicalName(f))
        case _ => col(c) // extra columns (_change_type) pass through
      }
    }.toSeq: _*)
    val partCols = st.partitionColumns.map(c =>
      if (mapped) physByLogical(c) else c)
    val tmp = Files.createTempDirectory("delta_wr")
    if (partCols.isEmpty)
      ordered.write.mode("overwrite").parquet(tmp.toString)
    else
      ordered.write.partitionBy(partCols: _*)
        .mode("overwrite").parquet(tmp.toString)
    val written = DeltaLog.listParquet(tmp)
    val destDirBase = if (subdir.isEmpty) "" else subdir + "/"
    if (subdir.nonEmpty)
      Files.createDirectories(Paths.get(table, subdir))
    import scala.jdk.CollectionConverters._
    val moved = written.zipWithIndex.map { case (p, i) =>
      val pv = tmp.relativize(p).iterator().asScala.toSeq.dropRight(1)
        .map(_.toString.split("=", 2))
        .map(kv => kv(0) ->
          IcebergCatalog.unescapePartitionValue(kv(1))).toMap
      val pvDir = pv.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v/" }.mkString
      val rel = s"$destDirBase$pvDir$prefix-$i.parquet"
      val dst = Paths.get(table, rel)
      Files.createDirectories(dst.getParent)
      Files.move(p, dst)
      (rel, pv)
    }
    DeltaLog.deleteTmp(tmp)
    moved
  }

  /** The `add` action lines for freshly written files, carrying
    * numRecords + long-column min/max stats (one grouped scan over the
    * NEW files only — file-scoped statistics, never a table scan) so
    * [[DeltaLog.filesInRange]] skipping works on engine-written files.
    */
  private def addLines(spark: SparkSession, table: String,
                       st: DeltaLog.State,
                       written: Seq[(String, Map[String, String])],
                       dataChange: Boolean): Seq[String] = {
    if (written.isEmpty) return Seq.empty
    val mapped = st.columnMappingMode == "name"
    val dataFields = st.schema.fields
      .filterNot(f => st.partitionColumns.contains(f.name))
    val longCols = dataFields.filter(_.dataType == LongType)
      .map(f => if (mapped) DeltaLog.physicalName(f) else f.name).toSeq
    val statsByName: Map[String, String] =
      if (longCols.isEmpty)
        spark.read.parquet(written.map(w =>
            Paths.get(table, w._1).toString): _*)
          .groupBy(col("_metadata.file_path").as("__fp"))
          .agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getString(0).split("/").last ->
            s"""{"numRecords":${r.getLong(1)}}""").toMap
      else {
        val aggs = count(lit(1)).as("__n") +: longCols.flatMap(c =>
          Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
        spark.read
          .parquet(written.map(w => Paths.get(table, w._1).toString): _*)
          .groupBy(col("_metadata.file_path").as("__fp"))
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
    written.map { case (rel, pv) =>
      val stats = statsByName.getOrElse(rel.split("/").last,
        """{"numRecords":0}""")
      s"""{"add":{"path":"${DeltaLog.jsonEscape(rel)}",""" +
        s""""partitionValues":${DeltaLog.pvJsonOf(pv)},""" +
        s""""dataChange":$dataChange,""" +
        s""""stats":"${DeltaLog.jsonEscape(stats)}"}}"""
    }
  }
}
