package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X43: the message-bus MicroBatchStream — multi-partition parallel
  * delivery, per-partition ordering, offset bookkeeping, admission
  * control, and batch parity through a real streaming aggregate.
  */
class BusSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Stage a bus of `parts` partitions holding (pt, seq, payload). */
  private def stageBus(n: Int, parts: Int): String = {
    val root = Files.createTempDirectory("bus").toString
    val rows = (0 until n).map(i => (i % parts, i.toLong, s"payload-$i"))
    BusSource.stage(rows.toDF("pt", "seq", "payload"), root, parts,
      col("pt"), concat_ws("|", col("seq"), col("payload")), col("seq"))
    root
  }

  private def readAll(root: String, maxRowsPerTrigger: Option[Long])
      : Array[(Int, Long, String)] = {
    val reader = spark.readStream
      .format("graft.streaming.BusSourceProvider")
      .option("path", root)
    val withLimit = maxRowsPerTrigger
      .fold(reader)(m => reader.option("maxRowsPerTrigger", m.toString))
    val name = s"bus_test_${System.nanoTime()}"
    val q = withLimit.load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name).as[(Int, Long, String)].collect()
  }

  test("exactly-once delivery with per-partition contiguous offsets") {
    val root = stageBus(n = 97, parts = 3)
    val got = readAll(root, maxRowsPerTrigger = None)
    assert(got.length == 97)
    // per partition: offsets are exactly 0..count-1 (contiguous, unique)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val offs = rows.map(_._2).sorted.toSeq
      assert(offs == (0L until rows.length.toLong))
    }
  }

  test("per-partition order: offsets follow the staged sequence") {
    val root = stageBus(n = 60, parts = 4)
    val got = readAll(root, maxRowsPerTrigger = None)
    // producer staged ascending seq per partition — the bus contract
    // says offset order ≡ staged order, so seq must be ascending in
    // offset order within every partition
    got.groupBy(_._1).foreach { case (_, rows) =>
      val seqs = rows.sortBy(_._2).map(_._3.split("\\|")(0).toLong).toSeq
      assert(seqs == seqs.sorted, "within-partition order broken")
    }
  }

  test("admission control: maxRowsPerTrigger bounds every micro-batch") {
    val root = stageBus(n = 90, parts = 3)
    val reader = spark.readStream
      .format("graft.streaming.BusSourceProvider")
      .option("path", root).option("maxRowsPerTrigger", "12")
    val name = s"bus_adm_${System.nanoTime()}"
    val q = reader.load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table(name).count() == 90)
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 7, s"expected ≥ 90/12 batches, got ${progress.length}")
    assert(progress.forall(_.numInputRows <= 12),
      progress.map(_.numInputRows).mkString(","))
  }

  test("streaming aggregate over parsed payloads equals the batch result") {
    // the end-to-end bus pattern: values are JSON, consumers from_json
    // them and aggregate; order-independence makes multi-partition
    // delivery safe — THE semantic the coalesce(1) staging can't test
    val root = Files.createTempDirectory("busjson").toString
    val events = (0 until 200)
      .map(i => (i % 5, i.toLong, (i * 37) % 100))
      .toDF("user", "seq", "amount")
    BusSource.stage(
      events.select(col("user"), col("seq"),
        to_json(struct(col("user"), col("amount"))).as("v")),
      root, 4, pmod(hash(col("user")), lit(4)), col("v"), col("seq"))
    val name = s"bus_agg_${System.nanoTime()}"
    val q = spark.readStream
      .format("graft.streaming.BusSourceProvider").option("path", root)
      .load()
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("user INT, amount INT")).as("e"))
      .groupBy(col("e.user").as("user"))
      .agg(count(lit(1)).as("n"), sum(col("e.amount")).as("total"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table(name).as[(Int, Long, Long)].collect().toSet
    val want = events.groupBy(col("user"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("CDC apply from the bus equals the direct file replay") {
    // multi-version keys split across micro-batches: per-key order on
    // the keyed bus must make the sequential merge land on the LAST
    // version, identical to the single-file replay. All keys pre-exist
    // in the target: a born-and-died key (inserted then deleted, never
    // in the target) is legitimately batch-split-DEPENDENT — one-shot
    // replay collapses it to nothing, incremental replay leaves a
    // tombstone; C35's net-change squash canonicalizes that upstream
    val target = Seq((1L, 10L, 0L, "N"), (2L, 20L, 0L, "N"),
        (3L, 30L, 0L, "N"), (4L, 40L, 0L, "N"))
      .toDF("k", "v", "seq", "is_deleted")
    val delta = (1 to 40).map { i =>
      val k = (i % 4) + 1L
      (k, 100L * i, i.toLong, if (i == 39) "Y" else "N")
    }.toDF("k", "v", "seq", "is_deleted")
    val viaBus = Streams.cdcApplyFromBus(spark, target, delta,
        Seq("k"), Seq(col("seq")), busPartitions = 3, maxRowsPerTrigger = 7)
      .as[(Long, Long, Long, String)].collect().toSet
    val viaFile = Streams.cdcApply(spark, target, delta,
        Seq("k"), Seq(col("seq")))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viaBus == viaFile)
    // latest version per key won: key 4's last change is i = 39, the
    // soft delete; key 1's last change is i = 40
    assert(viaBus.exists { case (k, _, seq, d) =>
      k == 4L && seq == 39L && d == "Y" })
    assert(viaBus.exists { case (k, _, seq, d) =>
      k == 1L && seq == 40L && d == "N" })
  }

  test("checkpoint recovery: a restarted query resumes from the " +
       "committed offsets with no loss") {
    val n = 20000
    val root = stageBus(n = n, parts = 4)
    val ckpt = Files.createTempDirectory("busckpt").toString
    val out = Files.createTempDirectory("busout").toString
    // transactional file sink: the sink log makes source-offset replay
    // EXACTLY-once end to end, so the final count must be n on the nose
    def start() = spark.readStream
      .format("graft.streaming.BusSourceProvider")
      .option("path", root).option("maxRowsPerTrigger", "500")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // first incarnation: killed mid-replay (500-row batches over 20k
    // rows — stopping after a few committed batches is guaranteed)
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60_000_000_000L
      while (q1.recentProgress.map(_.numInputRows).sum < 1000 &&
             System.nanoTime() < deadline) Thread.sleep(100)
    } finally q1.stop()
    val partial = spark.read.parquet(out).count()
    assert(partial < n, s"expected a partial first run, got $partial")
    // second incarnation on the SAME checkpoint drains the rest
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val all = spark.read.parquet(out)
      .selectExpr("partition", "offset").as[(Int, Long)].collect()
    assert(all.length == n, s"exactly-once broken: ${all.length} rows")
    assert(all.distinct.length == n, "duplicate (partition, offset) pairs")
  }

  test("offset round-trip: serialize/parse is the identity") {
    val o = BusOffset(Map(2 -> 14L, 0 -> 3L, 1 -> 0L))
    assert(o.json() == "0:3,1:0,2:14")
    assert(BusOffset.parse(o.json()) == o)
    assert(BusOffset.parse("") == BusOffset(Map.empty))
  }
}
