package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X52: the Kafka wire layer — varint/zigzag golden vectors, the
  * message-format-v2 RecordBatch codec (CRC32C integrity, tamper
  * detection), and full client↔broker exchanges over a staged bus.
  */
class KafkaWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zigzag varint golden vectors (the protobuf wire spec)") {
    def enc(v: Int): Seq[Int] = {
      val w = new KafkaWire.Writer
      w.varInt(v)
      w.toBytes.toSeq.map(_ & 0xff)
    }
    assert(enc(0) == Seq(0x00))
    assert(enc(-1) == Seq(0x01))
    assert(enc(1) == Seq(0x02))
    assert(enc(-2) == Seq(0x03))
    assert(enc(150) == Seq(0xac, 0x02)) // zigzag(150)=300 -> AC 02
    assert(enc(Int.MaxValue) == Seq(0xfe, 0xff, 0xff, 0xff, 0x0f))
    assert(enc(Int.MinValue) == Seq(0xff, 0xff, 0xff, 0xff, 0x0f))
    // read back every boundary value
    for (v <- Seq(0, 1, -1, 63, -64, 64, 8191, -8192, Int.MaxValue, Int.MinValue)) {
      val w = new KafkaWire.Writer; w.varInt(v)
      val r = new KafkaWire.Reader(java.nio.ByteBuffer.wrap(w.toBytes))
      assert(r.varInt() == v, s"varint roundtrip $v")
    }
    for (v <- Seq(0L, -1L, Long.MaxValue, Long.MinValue, 1L << 40)) {
      val w = new KafkaWire.Writer; w.varLong(v)
      val r = new KafkaWire.Reader(java.nio.ByteBuffer.wrap(w.toBytes))
      assert(r.varLong() == v, s"varlong roundtrip $v")
    }
  }

  test("RecordBatch v2 encodes the spec layout and round-trips") {
    val values = Seq("alpha", "beta", "", "delta").map(_.getBytes(UTF_8))
    val batch = KafkaWire.encodeBatch(baseOffset = 42L, values)
    // fixed header positions per the public format
    val buf = java.nio.ByteBuffer.wrap(batch)
    assert(buf.getLong(0) == 42L) // baseOffset
    assert(buf.getInt(8) == batch.length - 12) // batchLength
    assert(batch(16) == 2) // magic
    val got = KafkaWire.decodeBatches(batch)
    assert(got.map(_._1) == Seq(42L, 43L, 44L, 45L))
    assert(got.map(g => new String(g._2, UTF_8)) ==
      Seq("alpha", "beta", "", "delta"))
  }

  test("a flipped payload bit fails the CRC32C check loudly") {
    val batch = KafkaWire.encodeBatch(0L, Seq("payload".getBytes(UTF_8)))
    val tampered = batch.clone()
    tampered(batch.length - 3) = (tampered(batch.length - 3) ^ 0x40).toByte
    intercept[IllegalArgumentException] {
      KafkaWire.decodeBatches(tampered)
    }
    // bad magic is loud too
    val badMagic = batch.clone(); badMagic(16) = 1
    intercept[IllegalArgumentException] {
      KafkaWire.decodeBatches(badMagic)
    }
  }

  test("concatenated batches and a partial trailing batch decode correctly") {
    val b1 = KafkaWire.encodeBatch(0L, Seq("a", "b").map(_.getBytes(UTF_8)))
    val b2 = KafkaWire.encodeBatch(2L, Seq("c").map(_.getBytes(UTF_8)))
    val got = KafkaWire.decodeBatches(b1 ++ b2)
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
    // a truncated trailing batch is dropped, not mis-read (Kafka allows
    // partial batches at the end of a fetch response)
    val partial = b1 ++ b2.take(b2.length - 5)
    assert(KafkaWire.decodeBatches(partial).map(_._1) == Seq(0L, 1L))
  }

  private def stagedBus(): String = {
    val root = Files.createTempDirectory("kafka_spec").toString
    val df = (0L until 100L).toDF("k")
      .select(pmod(col("k"), lit(3)).as("pt"),
        concat(lit("msg-"), col("k")).as("v"), col("k"))
    BusSource.stage(df, root, busPartitions = 3,
      pt = col("pt"), value = col("v"), col("k"))
    root
  }

  test("ApiVersions, Metadata, and ListOffsets speak the real frames") {
    val root = stagedBus()
    val server = KafkaBusServer.serve(root, topic = "t1")
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        val apis = c.apiVersions()
        assert(apis(KafkaWire.ApiFetch) == ((0, 4)))
        assert(apis(KafkaWire.ApiMetadata) == ((0, 1)))
        assert(c.partitions("t1") == Seq(0, 1, 2))
        val latest = c.listOffsets("t1", Seq(0, 1, 2), -1L)
        assert(latest.values.sum == 100L)
        val earliest = c.listOffsets("t1", Seq(0, 1, 2), -2L)
        assert(earliest == Map(0 -> 0L, 1 -> 0L, 2 -> 0L))
      } finally c.close()
    } finally server.close()
  }

  test("Fetch returns the exact record range with correct offsets") {
    val root = stagedBus()
    val server = KafkaBusServer.serve(root)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        val head = c.listOffsets("bus", Seq(0), -1L)(0)
        // pull the whole partition via the fetch loop
        var pos = 0L
        val all = Seq.newBuilder[(Long, String)]
        while (pos < head) {
          val got = c.fetch("bus", 0, pos)
          assert(got.nonEmpty)
          got.foreach { case (o, v) => all += ((o, new String(v, UTF_8))) }
          pos = got.last._1 + 1
        }
        val rows = all.result()
        assert(rows.map(_._1) == (0L until head))
        assert(rows.forall(_._2.startsWith("msg-")))
        // mid-stream fetch starts exactly at the requested offset
        val mid = c.fetch("bus", 0, head / 2)
        assert(mid.head._1 == head / 2)
        // at-head fetch returns empty, not an error
        assert(c.fetch("bus", 0, head).isEmpty)
      } finally c.close()
    } finally server.close()
  }

  test("compressed RecordBatches: all four codec arms round-trip (r10)") {
    val values = (0 until 500).map(i => s"compressed-rec-$i-${"p" * (i % 11)}")
      .map(_.getBytes(UTF_8))
    for (codec <- Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
        KafkaWire.CodecLz4, KafkaWire.CodecZstd)) {
      val batch = KafkaWire.encodeBatch(7L, values, codec)
      // attribute bits carry the codec id (offset 21 in the batch:
      // baseOffset 8 + length 4 + epoch 4 + magic 1 + crc 4, then the
      // attributes i16 big-endian)
      val attrs = ((batch(21) & 0xff) << 8) | (batch(22) & 0xff)
      assert((attrs & 0x07) == codec, s"codec $codec not in attribute bits")
      // compression actually happened (repetitive payload shrinks)
      val plain = KafkaWire.encodeBatch(7L, values)
      assert(batch.length < plain.length, s"codec $codec did not compress")
      val got = KafkaWire.decodeBatches(batch)
      assert(got.map(_._1) == (7L until 507L), s"codec $codec offsets")
      assert(got.map(r => new String(r._2, UTF_8)) ==
        values.map(new String(_, UTF_8)), s"codec $codec payloads")
      // a flipped bit inside the COMPRESSED region still fails the CRC
      val bad = batch.clone()
      bad(80) = (bad(80) ^ 0x01).toByte
      intercept[IllegalArgumentException] { KafkaWire.decodeBatches(bad) }
    }
  }

  test("produce zstd, fetch gzip: both wire legs compressed end-to-end (r10)") {
    val server = KafkaBusServer.serve(null, topic = "z", emptyPartitions = 1,
      fetchCodec = KafkaWire.CodecGzip)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        val vals = (0 until 100).map(i => s"both-legs-$i")
        c.produce("z", 0, vals.map(_.getBytes(UTF_8)),
          codec = KafkaWire.CodecZstd)
        val got = c.fetch("z", 0, 0L).map(r => new String(r._2, UTF_8))
        assert(got == vals)
      } finally c.close()
    } finally server.close()
  }

  test("record keys ride the wire; murmur2 partitioner contract holds (r10)") {
    // murmur2 self-vectors (freeze the implementation against drift;
    // constants are the public algorithm's: seed 0x9747b28c, m
    // 0x5bd1e995, r 24) + structural properties
    val k1 = KafkaWire.murmur2("order-key-A".getBytes(UTF_8))
    assert(k1 == KafkaWire.murmur2("order-key-A".getBytes(UTF_8)),
      "murmur2 must be deterministic")
    assert(KafkaWire.murmur2("a".getBytes(UTF_8)) !=
      KafkaWire.murmur2("b".getBytes(UTF_8)))
    // partitionForKey is non-negative and stable even when murmur2 < 0
    val neg = (0 until 1000).map(i => s"k$i")
      .find(k => KafkaWire.murmur2(k.getBytes(UTF_8)) < 0).get
    assert(KafkaWire.partitionForKey(neg.getBytes(UTF_8), 4) >= 0)
    val spread = (0 until 64)
      .map(i => KafkaWire.partitionForKey(s"key-$i".getBytes(UTF_8), 4))
      .toSet
    assert(spread == Set(0, 1, 2, 3), "64 keys must reach all 4 partitions")
    // keyed batch round-trip: keys survive encode/decode, incl. nulls
    val recs = Seq(("ka", "v1"), (null, "v2"), ("kb", "v3")).map {
      case (k, v) => (if (k == null) null else k.getBytes(UTF_8),
        v.getBytes(UTF_8))
    }
    val got = KafkaWire.decodeBatchesKeyed(
      KafkaWire.encodeKeyedBatch(5L, recs, KafkaWire.CodecZstd))
    assert(got.map(_._1) == Seq(5L, 6L, 7L))
    assert(got.map(r => Option(r._2).map(new String(_, UTF_8))) ==
      Seq(Some("ka"), None, Some("kb")))
    assert(got.map(r => new String(r._3, UTF_8)) == Seq("v1", "v2", "v3"))
  }

  test("produceSinkKeyed: every key's records land WHOLLY on one partition (r10)") {
    val server = KafkaBusServer.serve(null, topic = "k", emptyPartitions = 4)
    try {
      val df = (0L until 300L).toDF("i")
        .select(concat(lit("key-"), pmod(col("i"), lit(10))).as("k"),
          concat(lit("val-"), col("i")).as("v"))
        .repartition(8) // rows of one key scattered across tasks
      KafkaWire.produceSinkKeyed(df, "127.0.0.1", server.port, "k",
        numPartitions = 4, key = col("k"), value = col("v"), batchSize = 16)
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        val heads = c.listOffsets("k", Seq(0, 1, 2, 3), -1L)
        assert(heads.values.sum == 300L)
        // pull everything WITH keys; group key -> partitions seen
        val seen = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.Set[Int]]
        (0 to 3).foreach { p =>
          var pos = 0L
          while (pos < heads(p)) {
            val got = c.fetchKeyed("k", p, pos)
            got.foreach { case (_, k, _) =>
              seen.getOrElseUpdate(new String(k, UTF_8),
                scala.collection.mutable.Set.empty) += p
            }
            pos = got.last._1 + 1
          }
        }
        assert(seen.keySet == (0 until 10).map(i => s"key-$i").toSet)
        assert(seen.values.forall(_.size == 1),
          s"a key spanned partitions: $seen")
        // and the broker-side partition matches the default partitioner
        seen.foreach { case (k, ps) =>
          assert(ps.head == KafkaWire.partitionForKey(k.getBytes(UTF_8), 4))
        }
      } finally c.close()
    } finally server.close()
  }

  test("Produce v3 appends over the wire; fetch reads the records back (r10)") {
    // produce-only broker: partitions advertised before the first append
    val server = KafkaBusServer.serve(null, topic = "w", emptyPartitions = 2)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        assert(c.apiVersions()(KafkaWire.ApiProduce) == ((0, 3)))
        assert(c.partitions("w") == Seq(0, 1))
        assert(c.listOffsets("w", Seq(0, 1), -1L) == Map(0 -> 0L, 1 -> 0L))
        // two appends: the broker assigns consecutive base offsets
        val b0 = c.produce("w", 0, Seq("a", "b").map(_.getBytes(UTF_8)))
        assert(b0 == 0L)
        val b1 = c.produce("w", 0, Seq("c").map(_.getBytes(UTF_8)))
        assert(b1 == 2L)
        c.produce("w", 1, Seq("z").map(_.getBytes(UTF_8)))
        assert(c.listOffsets("w", Seq(0, 1), -1L) == Map(0 -> 3L, 1 -> 1L))
        // fetch round-trips the produced values with correct offsets
        val got = c.fetch("w", 0, 0L).map { case (o, v) =>
          (o, new String(v, UTF_8)) }
        assert(got == Seq((0L, "a"), (1L, "b"), (2L, "c")))
        assert(c.fetch("w", 0, 1L).map(r => new String(r._2, UTF_8)) ==
          Seq("b", "c"))
      } finally c.close()
    } finally server.close()
  }

  test("produce over a STAGED root appends after the staged records (r10)") {
    val root = stagedBus()
    val server = KafkaBusServer.serve(root)
    var stagedHead = -1L
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        stagedHead = c.listOffsets("bus", Seq(0), -1L)(0)
        val base = c.produce("bus", 0, Seq("appended".getBytes(UTF_8)))
        assert(base == stagedHead, "append must land at the staged head")
        assert(c.listOffsets("bus", Seq(0), -1L)(0) == stagedHead + 1)
        val tail = c.fetch("bus", 0, stagedHead)
        assert(tail.map(r => new String(r._2, UTF_8)) == Seq("appended"))
      } finally c.close()
      // a SECOND broker over the same root must NOT see the append —
      // produced records are per-Handle (gate/bench re-runs stay clean)
      val server2 = KafkaBusServer.serve(root)
      try {
        val c2 = new KafkaWire.Client("127.0.0.1", server2.port)
        try assert(c2.listOffsets("bus", Seq(0), -1L)(0) == stagedHead)
        finally c2.close()
      } finally server2.close()
    } finally server.close()
  }

  test("executor-side produceSink ships every row over the wire (r10)") {
    val server = KafkaBusServer.serve(null, emptyPartitions = 4)
    try {
      val df = (0L until 200L).toDF("k")
        .select(pmod(col("k"), lit(4)).cast("int").as("pt"),
          concat(lit("v"), col("k")).as("v"))
        .repartition(8, col("pt"))
      KafkaWire.produceSink(df, "127.0.0.1", server.port, "bus",
        col("pt"), col("v"), batchSize = 16)
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        val heads = c.listOffsets("bus", Seq(0, 1, 2, 3), -1L)
        assert(heads.values.sum == 200L)
        assert(heads.values.forall(_ == 50L))
        // every value arrives intact, on its keyed partition
        val vals = (0 to 3).flatMap { p =>
          var pos = 0L
          val out = Seq.newBuilder[String]
          while (pos < heads(p)) {
            val got = c.fetch("bus", p, pos)
            got.foreach(r => out += new String(r._2, UTF_8))
            pos = got.last._1 + 1
          }
          out.result().map(v => (p, v))
        }
        assert(vals.size == 200)
        assert(vals.forall { case (p, v) => v.drop(1).toLong % 4 == p })
      } finally c.close()
    } finally server.close()
  }

  test("timestamps ride the batch as base + varlong deltas and survive codecs (r10b)") {
    // header rule: baseTimestamp = FIRST record's ts (not the min), max = max
    val recs = Seq((1000L, null: Array[Byte], "a".getBytes(UTF_8)),
      (950L, null: Array[Byte], "b".getBytes(UTF_8)), // negative delta: legal
      (1500L, "k".getBytes(UTF_8), "c".getBytes(UTF_8)))
    for (codec <- Seq(KafkaWire.CodecNone, KafkaWire.CodecGzip, KafkaWire.CodecZstd)) {
      val got = KafkaWire.decodeBatchesTimestamped(
        KafkaWire.encodeTimestampedBatch(7L, recs, codec))
      assert(got.map(_._1) == Seq(7L, 8L, 9L), s"offsets, codec $codec")
      assert(got.map(_._2) == Seq(1000L, 950L, 1500L), s"timestamps, codec $codec")
      assert(got.map(r => new String(r._4, UTF_8)) == Seq("a", "b", "c"))
    }
    // the legacy keyed encoder stamps 0 — pre-r10b bytes unchanged
    val legacy = KafkaWire.decodeBatchesTimestamped(
      KafkaWire.encodeKeyedBatch(0L,
        Seq((null: Array[Byte], "x".getBytes(UTF_8)))))
    assert(legacy.map(_._2) == Seq(0L))
  }

  test("offsetsForTimes: earliest offset with ts >= target; -1 past the end (r10b)") {
    val server = KafkaBusServer.serve(null, topic = "t", emptyPartitions = 1)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        // monotone create-times 100, 200, 300, 400 at offsets 0..3
        c.produceTimestamped("t", 0, (1 to 4).map(i =>
          (i * 100L, null: Array[Byte], s"v$i".getBytes(UTF_8))))
        assert(c.offsetsForTimes("t", Seq(0), 100L) == Map(0 -> 0L))
        assert(c.offsetsForTimes("t", Seq(0), 101L) == Map(0 -> 1L),
          "strictly-after seeks land on the NEXT record")
        assert(c.offsetsForTimes("t", Seq(0), 400L) == Map(0 -> 3L))
        assert(c.offsetsForTimes("t", Seq(0), 401L) == Map(0 -> -1L),
          "no record at/after target -> unknown offset")
        // sentinels still answer the log ends
        assert(c.listOffsets("t", Seq(0), -2L) == Map(0 -> 0L))
        assert(c.listOffsets("t", Seq(0), -1L) == Map(0 -> 4L))
        // and the create-times come back verbatim over Fetch
        val got = c.fetchTimestamped("t", 0, 0L)
        assert(got.map(_._2) == Seq(100L, 200L, 300L, 400L))
      } finally c.close()
    } finally server.close()
  }

  test("startTimestamp stream replays exactly the suffix with wire timestamps (r10b)") {
    val server = KafkaBusServer.serve(null, topic = "s", emptyPartitions = 2)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        // pt 0: ts 10,20,30; pt 1: ts 15,25 — seek at 20 keeps 20,30,25
        c.produceTimestamped("s", 0, Seq(10L, 20L, 30L).map(ts =>
          (ts, null: Array[Byte], s"p0-$ts".getBytes(UTF_8))))
        c.produceTimestamped("s", 1, Seq(15L, 25L).map(ts =>
          (ts, null: Array[Byte], s"p1-$ts".getBytes(UTF_8))))
      } finally c.close()
      val out = Streams.kafkaBusReplayFrom(spark, "127.0.0.1", server.port,
        "s", startTimestamp = 20L, maxRowsPerTrigger = 2,
        s"kw_seek_${System.nanoTime()}") { stream =>
        stream.select(col("partition"), col("timestamp"), col("value"))
          .groupBy(col("partition"))
          .agg(count(lit(1)).as("n"), min(col("timestamp")).as("min_ts"),
            max(col("timestamp")).as("max_ts"))
      }
      val got = out.orderBy("partition")
        .as[(Int, Long, Long, Long)].collect().toSeq
      assert(got == Seq((0, 2L, 20L, 30L), (1, 1L, 25L, 25L)))
    } finally server.close()
  }

  test("a structured-streaming read over the Kafka wire matches the staged rows") {
    val root = stagedBus()
    val server = KafkaBusServer.serve(root)
    try {
      val out = Streams.kafkaBusReplay(spark, "127.0.0.1", server.port,
        "bus", maxRowsPerTrigger = 17,
        s"kw_spec_${System.nanoTime()}") { stream =>
        stream.groupBy(col("partition"))
          .agg(count(lit(1)).as("n"))
      }
      val got = out.orderBy("partition")
        .as[(Int, Long)].collect().toSeq
      assert(got.map(_._2).sum == 100L)
      assert(got.map(_._1) == Seq(0, 1, 2))
    } finally server.close()
  }

  // ---- r11: consumer-group coordination (X57) ----

  test("FindCoordinator + OffsetCommit/OffsetFetch round-trip on the wire (r11)") {
    val server = KafkaBusServer.serve(null, topic = "g", emptyPartitions = 2)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try {
        assert(c.apiVersions()(KafkaWire.ApiOffsetCommit) == ((2, 2)))
        assert(c.apiVersions()(KafkaWire.ApiFindCoordinator) == ((0, 0)))
        // discovery: the single broker coordinates every group
        val (host, port) = c.findCoordinator("grp-a")
        assert(host == "127.0.0.1" && port == server.port)
        // a new group has nothing committed (-1 sentinel)
        assert(c.offsetFetch("grp-a", "g", Seq(0, 1)) ==
          Map(0 -> -1L, 1 -> -1L))
        c.offsetCommit("grp-a", "g", Map(0 -> 7L, 1 -> 3L))
        assert(c.offsetFetch("grp-a", "g", Seq(0, 1)) ==
          Map(0 -> 7L, 1 -> 3L))
        // re-commit overwrites; groups are isolated from each other
        c.offsetCommit("grp-a", "g", Map(0 -> 9L))
        assert(c.offsetFetch("grp-a", "g", Seq(0, 1)) ==
          Map(0 -> 9L, 1 -> 3L))
        assert(c.offsetFetch("grp-b", "g", Seq(0, 1)) ==
          Map(0 -> -1L, 1 -> -1L))
      } finally c.close()
    } finally server.close()
  }

  test("a crashed group consumer resumes from COMMITTED offsets, no checkpoint (r11)") {
    // 1 partition, 10 records; budget 4 → batch 0 commits offset 4,
    // the crash kills batch 1, the fresh query reads exactly [4, 10)
    val server = KafkaBusServer.serve(null, topic = "bus", emptyPartitions = 1)
    try {
      val c = new KafkaWire.Client("127.0.0.1", server.port)
      try c.produce("bus", 0, (0 until 10).map(i => s"r$i".getBytes(UTF_8)))
      finally c.close()
      val out = Streams.kafkaBusGroupResume(spark, "127.0.0.1", server.port,
        "bus", s"grp_spec_${System.nanoTime()}", maxRowsPerTrigger = 4,
        s"kwg_spec_${System.nanoTime()}") { stream =>
        stream.groupBy(col("partition"))
          .agg(count(lit(1)).as("n"), min(col("offset")).as("lo"),
            max(col("offset")).as("hi"))
      }
      val got = out.as[(Int, Long, Long, Long)].collect().toSeq
      assert(got == Seq((0, 6L, 4L, 9L)),
        s"resume must start at the committed offset 4, got $got")
    } finally server.close()
  }
}
