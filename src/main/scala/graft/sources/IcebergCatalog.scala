package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** F15: Iceberg table reader — the second open-table-format interop leg
  * (Delta is F14), from the PUBLIC Apache Iceberg spec
  * (iceberg.apache.org/spec): a table directory holds a `metadata/`
  * subdirectory of `vN.metadata.json` files (table metadata: schemas,
  * partition specs, snapshots), each snapshot points at a MANIFEST
  * LIST (Avro)
  * whose rows point at MANIFEST FILES (Avro) whose `data_file` entries
  * carry the parquet paths, identity-partition values, and liveness
  * status. Zero new dependencies: metadata JSON parses with json4s
  * (on Spark's classpath) and the manifests with avro-core (shipped in
  * `/opt/spark/jars`) — both read GENERICALLY by field name, so the
  * subset works on real Iceberg files, not just fixtures.
  *
  * Subset honored (read path, v1/v2 tables):
  *  - current snapshot (or `snapshotId` time travel) → its manifest
  *    list → `manifest_path` rows → manifest entries with
  *    `status != 2` (DELETED) and `content = 0` (data, not deletes);
  *  - `schemas`/`schema` JSON → Spark schema (primitive types + the
  *    ones the house data model uses); `partition-spec` identity
  *    transforms only (stated) — partition values re-enter as typed
  *    literals per file group, the F14 shape;
  *  - positional/equality DELETE files and non-identity transforms are
  *    out of scope and REJECTED loudly, never silently misread.
  *
  * Scale shape identical to F14: metadata is file-count-bounded on the
  * driver; data scans are parallel parquet reads per partition group
  * with pushdown intact.
  */
object IcebergCatalog {

  final case class IceFile(path: String, partition: Map[String, Any])
  final case class IceState(snapshotId: Long, schema: StructType,
                            partitionFields: Seq[String], files: Seq[IceFile])

  private def icePrimitive(t: String): DataType = t match {
    case "long" => LongType
    case "int" => org.apache.spark.sql.types.IntegerType
    case "string" => StringType
    case "double" => org.apache.spark.sql.types.DoubleType
    case "float" => org.apache.spark.sql.types.FloatType
    case "boolean" => org.apache.spark.sql.types.BooleanType
    case "date" => org.apache.spark.sql.types.DateType
    case "timestamp" | "timestamptz" => org.apache.spark.sql.types.TimestampType
    case d if d.startsWith("decimal(") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",")
      org.apache.spark.sql.types.DecimalType(p.trim.toInt, s.trim.toInt)
    case other =>
      throw new IllegalArgumentException(s"iceberg type not supported: $other")
  }

  private def schemaOf(fields: JValue): StructType = StructType(
    fields.children.map { f =>
      val JString(name) = f \ "name"
      val required = (f \ "required") match {
        case JBool(b) => b; case _ => false
      }
      val tpe = (f \ "type") match {
        case JString(t) => icePrimitive(t)
        case other => throw new IllegalArgumentException(
          s"nested iceberg types not supported: $other")
      }
      StructField(name, tpe, nullable = !required)
    })

  /** Parse the newest (or explicitly versioned) metadata JSON. */
  private def loadMetadata(table: String): (JValue, Path) = {
    val mdir = Paths.get(table, "metadata")
    require(Files.isDirectory(mdir), s"not an iceberg table: $table")
    val metas = Files.list(mdir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".metadata.json"))
      .toSeq.sortBy(_.getFileName.toString)
    require(metas.nonEmpty, s"no metadata.json under $mdir")
    val p = metas.last
    (JsonMethods.parse(Files.readString(p)), p)
  }

  private def avroRows(path: Path): Seq[GenericRecord] = {
    val rd = new DataFileReader[GenericRecord](path.toFile,
      new GenericDatumReader[GenericRecord]())
    try rd.iterator().asScala.toList finally rd.close()
  }

  /** Resolve a possibly-absolute manifest location into the table dir:
    * real Iceberg writes absolute `file:`/object-store URIs — relocated
    * fixtures and copied tables keep only the tail, so anchor at the
    * table's directory name when present.
    */
  private def resolve(table: String, loc: String): Path = {
    val raw = loc.stripPrefix("file:")
    val p = Paths.get(raw)
    if (Files.exists(p)) p
    else {
      val tail = raw.split('/').dropWhile(_ != Paths.get(table).getFileName.toString)
      if (tail.nonEmpty) Paths.get(table).getParent.resolve(tail.mkString("/"))
      else Paths.get(table, raw)
    }
  }

  /** Replay metadata to the live file set at a snapshot. */
  def state(spark: SparkSession, table: String,
            snapshotId: Option[Long] = None): IceState = {
    val (md, _) = loadMetadata(table)
    val current = snapshotId.getOrElse((md \ "current-snapshot-id") match {
      case JInt(v) => v.toLong
      case _ => throw new IllegalArgumentException("no current-snapshot-id")
    })
    val snap = (md \ "snapshots").children.find(s =>
      (s \ "snapshot-id") match { case JInt(v) => v.toLong == current; case _ => false })
      .getOrElse(throw new IllegalArgumentException(s"snapshot $current not found"))
    val JString(mlist) = snap \ "manifest-list"
    // schema: v2 `schemas` + current-schema-id, v1 fallback `schema`
    val schemaJson = (md \ "schemas") match {
      case JArray(ss) if ss.nonEmpty =>
        val cur = (md \ "current-schema-id") match {
          case JInt(v) => v.toInt; case _ => 0
        }
        ss.find(s => (s \ "schema-id") match {
          case JInt(v) => v.toInt == cur; case _ => false
        }).getOrElse(ss.head)
      case _ => md \ "schema"
    }
    val schema = schemaOf(schemaJson \ "fields")
    // identity partition fields only (stated subset)
    val specFields = (md \ "partition-specs") match {
      case JArray(specs) if specs.nonEmpty => (specs.head \ "fields").children
      case _ => (md \ "partition-spec").children
    }
    val partitionFields = specFields.map { f =>
      val JString(n) = f \ "name"
      (f \ "transform") match {
        case JString("identity") | JNothing => n
        case JString(t) => throw new IllegalArgumentException(
          s"non-identity partition transform not supported: $t")
        case _ => n
      }
    }
    val manifests = avroRows(resolve(table, mlist))
      .map(_.get("manifest_path").toString)
    val files = manifests.flatMap { mp =>
      avroRows(resolve(table, mp)).flatMap { entry =>
        val status = Option(entry.get("status")).map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // DELETED
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.get("content")).map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            s"delete files (content=$content) not supported on the read path")
          val part = Option(df.get("partition"))
            .map(_.asInstanceOf[GenericRecord]) match {
            case Some(pr) =>
              // Avro strings arrive as Utf8 — keep values raw (content
              // equality holds for grouping); stringified at literal time
              pr.getSchema.getFields.asScala
                .map(f => f.name() -> pr.get(f.name())).toMap
            case None => Map.empty[String, Any]
          }
          Some(IceFile(df.get("file_path").toString, part))
        }
      }
    }
    IceState(current, schema, partitionFields, files)
  }

  // ------------------------------------------------------------------
  // Minimal writer — the fixture/export counterpart of the reader:
  // enough of the spec (Avro manifest list + manifests with STRING
  // identity partitions, metadata JSON with schemas/specs/snapshots) to
  // round-trip a table through this module and hand it to any Iceberg
  // reader. Data files are written by the caller (plain parquet).
  // ------------------------------------------------------------------

  private def manifestListSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"}]}""".stripMargin)

  private def manifestSchema(partFields: Seq[String]) = {
    val pf = partFields.map(f =>
      s"""{"name":"$f","type":"string"}""").mkString(",")
    new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |  {"name":"status","type":"int"},
         |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
         |    {"name":"file_path","type":"string"},
         |    {"name":"content","type":"int"},
         |    {"name":"partition","type":{"type":"record","name":"part_r","fields":[$pf]}},
         |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)
  }

  def writeManifestList(path: Path, manifests: Seq[Path]): Unit = {
    val s = manifestListSchema
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](s))
    w.create(s, path.toFile)
    manifests.foreach { m =>
      val r = new org.apache.avro.generic.GenericData.Record(s)
      r.put("manifest_path", m.toString); w.append(r)
    }
    w.close()
  }

  /** entries: (status 1=ADDED/0=EXISTING/2=DELETED, filePath,
    * content 0=data, partitionValues).
    */
  def writeManifest(path: Path, partFields: Seq[String],
                    entries: Seq[(Int, String, Int, Map[String, String])]): Unit = {
    val s = manifestSchema(partFields)
    val dfS = s.getField("data_file").schema()
    val pS = dfS.getField("partition").schema()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](s))
    w.create(s, path.toFile)
    entries.foreach { case (status, fp, content, pv) =>
      val pr = new org.apache.avro.generic.GenericData.Record(pS)
      partFields.foreach(f => pr.put(f, pv.getOrElse(f, null)))
      val df = new org.apache.avro.generic.GenericData.Record(dfS)
      df.put("file_path", fp); df.put("content", content)
      df.put("partition", pr); df.put("record_count", 0L)
      val e = new org.apache.avro.generic.GenericData.Record(s)
      e.put("status", status); e.put("data_file", df)
      w.append(e)
    }
    w.close()
  }

  /** One v2 metadata.json: `fields` = (name, icebergType, required),
    * `snapshots` = (snapshotId, manifestListPath), current = last.
    */
  def writeMetadataJson(path: Path, fields: Seq[(String, String, Boolean)],
                        partitionFields: Seq[String],
                        snapshots: Seq[(Long, Path)]): Unit = {
    val fs = fields.zipWithIndex.map { case ((n, t, r), i) =>
      s"""{"id": ${i + 1}, "name": "$n", "required": $r, "type": "$t"}"""
    }.mkString(",")
    val ps = partitionFields.zipWithIndex.map { case (n, i) =>
      s"""{"name": "$n", "transform": "identity", "source-id": 0, "field-id": ${1000 + i}}"""
    }.mkString(",")
    val ss = snapshots.map { case (id, ml) =>
      s"""{"snapshot-id": $id, "manifest-list": "$ml"}"""
    }.mkString(",")
    val cur = snapshots.last._1
    Files.writeString(path,
      s"""{
         |  "format-version": 2,
         |  "current-snapshot-id": $cur,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [$fs]}],
         |  "partition-specs": [{"spec-id": 0, "fields": [$ps]}],
         |  "snapshots": [$ss]
         |}""".stripMargin)
  }

  /** Read the live table (optionally at an old snapshot), the F14
    * reading shape: one pruned parquet scan per partition-value group,
    * partition columns re-entering as typed literals.
    */
  def read(spark: SparkSession, table: String,
           snapshotId: Option[Long] = None,
           partitionFilter: Map[String, Any] => Boolean = _ => true)
      : DataFrame = {
    val st = state(spark, table, snapshotId)
    val dataSchema = StructType(
      st.schema.fields.filterNot(f => st.partitionFields.contains(f.name)))
    val groups = st.files.filter(f => partitionFilter(f.partition))
      .groupBy(_.partition).toSeq
      .sortBy(_._1.toSeq.map(kv => kv._1 + "=" + String.valueOf(kv._2)).sorted.mkString(","))
    if (groups.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st.schema)
    val parts = groups.map { case (pvals, files) =>
      val base = spark.read.schema(dataSchema)
        .parquet(files.map(f => resolve(table, f.path).toString): _*)
      st.partitionFields.foldLeft(base) { (df, c0) =>
        val fld = st.schema.fields.find(_.name == c0).getOrElse(
          throw new IllegalArgumentException(s"partition field $c0 not in schema"))
        val raw = pvals.get(c0).orNull
        val litV = if (raw == null) lit(null)
                   else lit(String.valueOf(raw))
        df.withColumn(c0, litV.cast(fld.dataType))
      }.select(st.schema.fieldNames.map(col).toSeq: _*)
    }
    parts.reduce(_ unionByName _)
  }
}
