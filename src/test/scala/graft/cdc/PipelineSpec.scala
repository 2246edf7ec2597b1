package graft.cdc

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the full replication loop across two incremental runs — the
  * scenario the reference pipeline exists for.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // source state: customers (parent) + orders (child) with CDC columns
  private def customers(rows: Seq[(Long, String, String, Option[String], String)]): DataFrame =
    rows.toDF("id", "name", "c", "u", "is_deleted")
      .select(col("id"), col("name"),
        col("c").cast("timestamp").as("created_at"),
        col("u").cast("timestamp").as("updated_at"),
        col("is_deleted"))

  val specs = Seq(
    Pipeline.TableSpec("cust", Seq("id")),
    Pipeline.TableSpec("ord", Seq("id")))
  val edges = Seq("cust" -> "ord")

  test("two incremental runs converge the replica and advance watermarks") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    val target = new Pipeline.ParquetTarget(spark, dir)

    // ── run 1: initial full load ──
    val src1 = Map(
      "cust" -> customers(Seq(
        (1L, "alice", "2024-01-01 00:00:00", None, "N"),
        (2L, "bob", "2024-01-02 00:00:00", None, "N"))),
      "ord" -> customers(Seq(
        (10L, "o-alice", "2024-01-03 00:00:00", None, "N"))))
    val (rep1, wm1) = Pipeline.replicate(specs, edges, src1(_),
      target.read, target.write, Map.empty)
    assert(rep1.processed == 2 && rep1.failed == 0)
    assert(target.read("cust").get.count() == 2)
    assert(wm1("cust") == ts("2024-01-02 00:00:00"))
    // parents load before children
    assert(rep1.results.map(_.table) == Seq("cust", "ord"))

    // ── run 2: update, insert, soft delete, and one unchanged table ──
    val src2 = Map(
      "cust" -> customers(Seq(
        (1L, "alice", "2024-01-01 00:00:00", None, "N"),                       // unchanged (pre-watermark)
        (2L, "bob2", "2024-01-02 00:00:00", Some("2024-02-01 00:00:00"), "N"), // update
        (3L, "carol", "2024-02-02 00:00:00", None, "N"),                       // insert
        (1L, "alice", "2024-01-01 00:00:00", Some("2024-02-03 00:00:00"), "Y"))), // soft delete (new version row)
      "ord" -> src1("ord")) // no changes
    val (rep2, wm2) = Pipeline.replicate(specs, edges, src2(_),
      target.read, target.write, wm1)
    assert(rep2.processed == 1 && rep2.noChanges == 1)
    val cust = target.read("cust").get.orderBy("id")
      .select("id", "name", "is_deleted").as[(Long, String, String)].collect().toSeq
    assert(cust == Seq((1L, "alice", "Y"), (2L, "bob2", "N"), (3L, "carol", "N")))
    assert(wm2("cust") == ts("2024-02-03 00:00:00"))
    assert(wm2("ord") == wm1("ord")) // untouched watermark survives
  }

  test("level-parallel replication matches the serial run (same data, watermarks, order guarantees)") {
    // 4 tables, 2 levels: {a, b} then {c, d} (c ← a, d ← b)
    val pSpecs = Seq("a", "b", "c", "d").map(n => Pipeline.TableSpec(n, Seq("id")))
    val pEdges = Seq("a" -> "c", "b" -> "d")
    val src = Map(
      "a" -> customers(Seq((1L, "x", "2024-01-01 00:00:00", None, "N"))),
      "b" -> customers(Seq((2L, "y", "2024-01-02 00:00:00", None, "N"))),
      "c" -> customers(Seq((3L, "z", "2024-01-03 00:00:00", None, "N"))),
      "d" -> customers(Seq((4L, "w", "2024-01-04 00:00:00", None, "N"))))
    def freshTarget() = new Pipeline.ParquetTarget(spark,
      Files.createTempDirectory("graft_par").toString)
    val tSer = freshTarget(); val tPar = freshTarget()
    val (serial, wmS) = Pipeline.replicate(pSpecs, pEdges, src(_),
      tSer.read, tSer.write, Map.empty)
    val (par, wmP) = Pipeline.replicateParallel(pSpecs, pEdges, src(_),
      tPar.read, tPar.write, Map.empty, parallelism = 4)
    assert(par.processed == 4 && par.failed == 0)
    assert(wmP == wmS)
    assert(par.results.map(r => r.table -> r.status).toMap ==
      serial.results.map(r => r.table -> r.status).toMap)
    for (t <- Seq("a", "b", "c", "d"))
      assert(tPar.read(t).get.orderBy("id").collect().toSeq ==
        tSer.read(t).get.orderBy("id").collect().toSeq)
    // parents' level completes before children start (level barrier):
    // result order groups level 0 before level 1
    val order = par.results.map(_.table)
    assert(order.indexOf("a") < order.indexOf("c") && order.indexOf("b") < order.indexOf("d"))
  }

  test("schema evolution: source adds a column mid-stream; target backfills nulls") {
    val dir = Files.createTempDirectory("graft_pipe3").toString
    val target = new Pipeline.ParquetTarget(spark, dir)
    val onlyCust = Seq(Pipeline.TableSpec("cust", Seq("id")))
    val src1 = Map("cust" -> customers(Seq(
      (1L, "alice", "2024-01-01 00:00:00", None, "N"))))
    val (_, wm1) = Pipeline.replicate(onlyCust, Nil, src1(_), target.read, target.write, Map.empty)

    // run 2: source gained a `tier` column
    val src2 = customers(Seq(
      (2L, "bob", "2024-02-01 00:00:00", None, "N")))
      .withColumn("tier", lit("gold"))
    val (rep2, _) = Pipeline.replicate(onlyCust, Nil, _ => src2, target.read, target.write, wm1)
    assert(rep2.processed == 1)
    val got = target.read("cust").get.orderBy("id")
      .select("id", "name", "tier").as[(Long, String, Option[String])].collect().toSeq
    assert(got == Seq((1L, "alice", None), (2L, "bob", Some("gold"))))
  }

  test("migrationDdl emits ADD for source-added columns only") {
    val target = Seq((1L, "a")).toDF("id", "name")
    val staged = Seq((2L, 3.5, true)).toDF("id", "score", "active") // name dropped
    val ddl = Pipeline.migrationDdl(target, staged, "CUST")
    assert(ddl == Seq(
      "ALTER TABLE CUST ADD score DOUBLE",
      "ALTER TABLE CUST ADD active BOOLEAN"))
  }

  test("a failing table is isolated; the run continues (reference :348-352)") {
    val dir = Files.createTempDirectory("graft_pipe2").toString
    val target = new Pipeline.ParquetTarget(spark, dir)
    val src: String => DataFrame = {
      case "cust" => customers(Seq((1L, "a", "2024-01-01 00:00:00", None, "N")))
      case "ord"  => throw new RuntimeException("boom: source unavailable")
    }
    val (rep, wm) = Pipeline.replicate(specs, edges, src, target.read, target.write, Map.empty)
    assert(rep.processed == 1 && rep.failed == 1)
    assert(rep.results.find(_.table == "ord").get.error.get.contains("boom"))
    assert(wm.contains("cust") && !wm.contains("ord"))
  }

  test("writeRunReport persists a timestamped JSONL artifact per run") {
    val dir = Files.createTempDirectory("graft_runlog").toString
    val rep = Pipeline.RunReport(Seq(
      Pipeline.TableResult("cust", "processed", 5,
        Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))),
      Pipeline.TableResult("ord", "failed", 0, None,
        error = Some("boom: \"quoted\"\r\n\tline2"))))
    val at = java.time.Instant.parse("2024-01-02T03:04:05Z")
    val f = Pipeline.writeRunReport(rep, dir, at)
    assert(f.getName == "cdc_run_20240102_030405_000000000.jsonl")
    val lines = {
      val s = scala.io.Source.fromFile(f); try s.getLines().toVector finally s.close()
    }
    assert(lines.size == 3)
    assert(lines(0).contains("\"table\":\"cust\"") && lines(0).contains("\"rows\":5"))
    // every control char escaped — the artifact must stay parseable JSONL
    assert(lines(1).contains("\\\"quoted\\\"") &&
      lines(1).contains("\\u000d\\u000a\\u0009"))
    assert(lines(2).contains("\"processed\":1") && lines(2).contains("\"failed\":1"))
    // runs in the SAME second land in distinct files (nanosecond field)
    val f2 = Pipeline.writeRunReport(rep, dir, at.plusNanos(1))
    assert(f2.exists() && f.exists() && f2.getName != f.getName)
  }
}
