package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkTestSession
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** F15: the Iceberg reader against a spec-faithful hand-built table —
  * metadata.json + Avro manifest list + Avro manifests with
  * added/existing/deleted entries, snapshot time travel, partition
  * pruning, and loud rejection of delete files.
  */
class IcebergCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"content","type":"int"},
      |    {"name":"partition","type":{"type":"record","name":"part_r","fields":[
      |      {"name":"part","type":"string"}]}},
      |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)

  private def writeManifestList(path: Path, manifests: Seq[Path]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestListSchema))
    w.create(manifestListSchema, path.toFile)
    manifests.foreach { m =>
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m.toString)
      w.append(r)
    }
    w.close()
  }

  /** entries: (status, filePath, content, partValue) */
  private def writeManifest(path: Path,
                            entries: Seq[(Int, String, Int, String)]): Unit = {
    val dfSchema = manifestSchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestSchema))
    w.create(manifestSchema, path.toFile)
    entries.foreach { case (status, fp, content, part) =>
      val pr = new GenericData.Record(partSchema)
      pr.put("part", part)
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", fp); df.put("content", content)
      df.put("partition", pr); df.put("record_count", 1L)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", status); e.put("data_file", df)
      w.append(e)
    }
    w.close()
  }

  private def writeDataFile(df: DataFrame, table: Path, rel: String): String = {
    val tmp = Files.createTempDirectory("icefile")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val target = table.resolve(rel)
    Files.createDirectories(target.getParent)
    Files.move(part, target)
    target.toString
  }

  private def metadataJson(current: Long,
                           snaps: Seq[(Long, Path)]): String = {
    val snapJson = snaps.map { case (id, ml) =>
      s"""{"snapshot-id": $id, "manifest-list": "$ml"}"""
    }.mkString(",")
    s"""{
       |  "format-version": 2,
       |  "current-snapshot-id": $current,
       |  "current-schema-id": 0,
       |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
       |    {"id": 1, "name": "id", "required": true, "type": "long"},
       |    {"id": 2, "name": "v", "required": false, "type": "string"},
       |    {"id": 3, "name": "part", "required": false, "type": "string"}]}],
       |  "partition-specs": [{"spec-id": 0, "fields": [
       |    {"name": "part", "transform": "identity", "source-id": 3, "field-id": 1000}]}],
       |  "snapshots": [$snapJson]
       |}""".stripMargin
  }

  /** Two-snapshot fixture:
    *  snap 10: f1 (part a: ids 1,2) + f2 (part b: id 3)
    *  snap 20: f2 existing, f1 DELETED, f3 added (part a: id 4)
    */
  private def buildTable(badContent: Boolean = false): Path = {
    val t = Files.createTempDirectory("icetbl")
    val mdir = t.resolve("metadata"); Files.createDirectories(mdir)
    val f1 = writeDataFile(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), t, "data/part=a/f1.parquet")
    val f2 = writeDataFile(Seq((3L, "z")).toDF("id", "v"), t, "data/part=b/f2.parquet")
    val f3 = writeDataFile(Seq((4L, "q")).toDF("id", "v"), t, "data/part=a/f3.parquet")
    val m1 = mdir.resolve("m1.avro")
    writeManifest(m1, Seq((1, f1, 0, "a"), (1, f2, 0, "b")))
    val m2 = mdir.resolve("m2.avro")
    writeManifest(m2, Seq((0, f2, 0, "b"), (2, f1, 0, "a"),
      (1, f3, if (badContent) 1 else 0, "a")))
    val ml1 = mdir.resolve("snap-10.avro"); writeManifestList(ml1, Seq(m1))
    val ml2 = mdir.resolve("snap-20.avro"); writeManifestList(ml2, Seq(m2))
    Files.writeString(mdir.resolve("v1.metadata.json"),
      metadataJson(20L, Seq(10L -> ml1, 20L -> ml2)))
    t
  }

  private def rows(df: DataFrame): Set[(Long, String, String)] =
    df.select("id", "v", "part").as[(Long, String, String)].collect().toSet

  test("current snapshot: deleted entries drop, partitions attach") {
    val t = buildTable()
    val got = rows(IcebergCatalog.read(spark, t.toString))
    assert(got == Set((3L, "z", "b"), (4L, "q", "a")))
  }

  test("snapshot time travel reads the older manifest list") {
    val t = buildTable()
    val got = rows(IcebergCatalog.read(spark, t.toString, snapshotId = Some(10L)))
    assert(got == Set((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b")))
  }

  test("partition pruning drops whole file groups") {
    val t = buildTable()
    val got = rows(IcebergCatalog.read(spark, t.toString,
      partitionFilter = pv => String.valueOf(pv("part")) == "a"))
    assert(got == Set((4L, "q", "a")))
    val st = IcebergCatalog.state(spark, t.toString)
    assert(st.partitionFields == Seq("part"))
    assert(st.files.map(_.path).exists(_.contains("f3.parquet")))
  }

  test("delete files are rejected loudly, never misread") {
    val t = buildTable(badContent = true)
    val e = intercept[IllegalArgumentException] {
      IcebergCatalog.read(spark, t.toString)
    }
    assert(e.getMessage.contains("delete files"))
  }
}
