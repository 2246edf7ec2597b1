package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X47: the network bus transport — TCP broker protocol, parallel
  * per-partition fetches, exactly-once offsets, admission control,
  * checkpoint recovery across a broker restart, and loud failure on a
  * truncated fetch.
  */
class SocketBusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stageBus(n: Int, parts: Int): String = {
    val root = Files.createTempDirectory("sockbus").toString
    val rows = (0 until n).map(i => (i % parts, i.toLong, s"payload-$i"))
    BusSource.stage(rows.toDF("pt", "seq", "payload"), root, parts,
      col("pt"), concat_ws("|", col("seq"), col("payload")), col("seq"))
    root
  }

  private def readAll(port: Int, maxRowsPerTrigger: Option[Long])
      : Array[(Int, Long, String)] = {
    val reader = spark.readStream
      .format("graft.streaming.SocketBusProvider")
      .option("host", "127.0.0.1").option("port", port.toString)
    val withLimit = maxRowsPerTrigger
      .fold(reader)(m => reader.option("maxRowsPerTrigger", m.toString))
    val name = s"sock_test_${System.nanoTime()}"
    val q = withLimit.load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name).as[(Int, Long, String)].collect()
  }

  test("exactly-once delivery over TCP with contiguous offsets") {
    val root = stageBus(n = 97, parts = 3)
    val server = BusServer.serve(root)
    try {
      val got = readAll(server.port, maxRowsPerTrigger = None)
      assert(got.length == 97)
      got.groupBy(_._1).foreach { case (_, rows) =>
        val offs = rows.map(_._2).sorted.toSeq
        assert(offs == (0L until rows.length.toLong))
      }
      // payloads identical to the directory transport's view
      val direct = spark.readStream
        .format("graft.streaming.BusSourceProvider").option("path", root)
      val name = s"sock_ref_${System.nanoTime()}"
      val q = direct.load().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      val ref = spark.table(name).as[(Int, Long, String)].collect()
      assert(got.toSet == ref.toSet)
    } finally server.close()
  }

  test("admission control bounds every micro-batch over the wire") {
    val root = stageBus(n = 90, parts = 3)
    val server = BusServer.serve(root)
    try {
      val name = s"sock_adm_${System.nanoTime()}"
      val q = spark.readStream
        .format("graft.streaming.SocketBusProvider")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("maxRowsPerTrigger", "12")
        .load()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      assert(spark.table(name).count() == 90)
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.length >= 7, s"expected >= 8 batches, got ${progress.length}")
      assert(progress.forall(_.numInputRows <= 12),
        progress.map(_.numInputRows).mkString(","))
    } finally server.close()
  }

  test("checkpoint recovery resumes from the committed offset after a " +
      "broker restart") {
    val root = stageBus(n = 40, parts = 2)
    val ckpt = Files.createTempDirectory("sockbus_ckpt").toString
    val out = Files.createTempDirectory("sockbus_out").toString
    def start(port: Int) = spark.readStream
      .format("graft.streaming.SocketBusProvider")
      .option("host", "127.0.0.1").option("port", port.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val s1 = BusServer.serve(root)
    try {
      val q = start(s1.port)
      try { q.processAllAvailable() } finally q.stop()
      assert(spark.read.parquet(out).count() == 40)
    } finally s1.close()
    // more data lands; a NEW broker serves the grown bus on a NEW port
    BusSource.stage(
      ((0 until 40) ++ (100 until 130)).map(i => (i % 2, i.toLong, s"payload-$i"))
        .toDF("pt", "seq", "payload"),
      root, 2, col("pt"), concat_ws("|", col("seq"), col("payload")),
      col("seq"))
    val s2 = BusServer.serve(root)
    try {
      val q2 = start(s2.port)
      try { q2.processAllAvailable() } finally q2.stop()
      // only the 30 NEW records replay — the offsets survived the restart
      assert(spark.read.parquet(out).count() == 70)
    } finally s2.close()
  }

  test("a broker that cannot serve the full range fails loudly") {
    val root = stageBus(n = 20, parts = 1)
    val server = BusServer.serve(root)
    try {
      // ask past the head: the reader must throw, not silently shorten
      val e = intercept[Exception] {
        val part = SocketBusInputPartition("127.0.0.1", server.port, 0, 0, 99)
        val r = new SocketBusPartitionReader(part)
        try { while (r.next()) r.get() } finally r.close()
      }
      assert(e.getMessage.contains("before"))
    } finally server.close()
  }

  test("HEADS reports the staged per-partition counts") {
    val root = stageBus(n = 30, parts = 3)
    val server = BusServer.serve(root)
    try {
      val heads = SocketBus.headOffsets("127.0.0.1", server.port)
      assert(heads == Map(0 -> 10L, 1 -> 10L, 2 -> 10L))
    } finally server.close()
  }
}
