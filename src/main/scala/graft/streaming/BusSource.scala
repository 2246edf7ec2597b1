package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** X43: a message-bus-SHAPED Structured Streaming source — the missing
  * arrival path the r6 verdict called out (every X gate replays via
  * single-file parquet staging; real CDC streams arrive on a
  * Kafka-like bus). This is a full DataSource V2 `MicroBatchStream`
  * over a directory of numbered partitions, with the bus semantics
  * that matter:
  *
  *  - **Per-partition total order, no cross-partition order** — exactly
  *    Kafka's contract. A partition is the subdirectory `pt=N/`; its
  *    record order is (file name asc, line order), its offset is the
  *    line index in that sequence.
  *  - **Kafka-shaped rows** `(partition int, offset long, value
  *    string)` — payloads are opaque strings the consumer parses with
  *    `from_json`, the real-world pattern (key/timestamp ride inside
  *    the value).
  *  - **Resumable offsets**: the stream's `Offset` is the per-partition
  *    consumed count, serialized `p:count,...`; recovery replays from
  *    the checkpointed offset like any exactly-once source.
  *  - **Admission control**: `maxRowsPerTrigger` caps each micro-batch
  *    via `SupportsAdmissionControl` (per-partition even split,
  *    remainder to the lowest partition ids — deterministic batching).
  *
  * Scale shape: partitions are read in PARALLEL (one `InputPartition`
  * per bus partition per batch); the driver holds only per-partition
  * line counts (metadata), never rows. Staging a test bus writes
  * through Spark (`Bus.stage` — hash-partitioned `partitionBy` text
  * write), so the producer side is distributed too.
  *
  * Usage: `spark.readStream.format("graft.streaming.BusSourceProvider")
  * .option("path", dir).option("maxRowsPerTrigger", "1000").load()`.
  */
class BusSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties carry the reader options in caller case — normalize
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    new BusTable(opts.getOrElse("path", null),
      opts.get("maxrowspertrigger").map(_.toLong))
  }
}

object BusSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Partition dirs `pt=N` under the bus root, sorted by N. */
  def partitionDirs(root: String): Seq[(Int, Path)] = {
    val p = Paths.get(root)
    require(Files.isDirectory(p), s"bus root missing: $root")
    val st = Files.list(p)
    try st.iterator().asScala
      .filter(d => Files.isDirectory(d) && d.getFileName.toString.startsWith("pt="))
      .map(d => d.getFileName.toString.drop(3).toInt -> d)
      .toSeq.sortBy(_._1)
    finally st.close()
  }

  /** Ordered data files of one partition (file name asc). */
  def partFiles(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_")
        && !f.getFileName.toString.startsWith("."))
      .toSeq.sortBy(_.getFileName.toString)
    finally st.close()
  }

  /** Per-partition record counts (the bus head). */
  def headOffsets(root: String): Map[Int, Long] =
    partitionDirs(root).map { case (id, dir) =>
      id -> partFiles(dir).map { f =>
        val s = Files.lines(f)
        try s.count() finally s.close()
      }.sum
    }.toMap

  /** Shared admission step: advance `from` toward `head` within
    * `limit` rows — budget split evenly over partitions with backlog,
    * remainder to the lowest ids (deterministic batch plan, no
    * wall-clock, no race). Used by both the directory and the socket
    * transports.
    */
  def admit(head: Map[Int, Long], from: Map[Int, Long],
            limit: ReadLimit): BusOffset = limit match {
    case m: ReadMaxRows =>
      val backlog = head.toSeq.sortBy(_._1).map { case (p, h) =>
        (p, from.getOrElse(p, 0L), h)
      }.filter { case (_, f, h) => h > f }
      if (backlog.isEmpty) BusOffset(head)
      else {
        val budget = m.maxRows()
        val per = budget / backlog.size
        val extra = (budget % backlog.size).toInt
        val stepped = backlog.zipWithIndex.map { case ((p, f, h), i) =>
          val take = per + (if (i < extra) 1L else 0L)
          p -> math.min(h, f + take)
        }.toMap
        BusOffset(head.map { case (p, h) =>
          p -> stepped.getOrElse(p, from.getOrElse(p, 0L))
        })
      }
    case _ => BusOffset(head)
  }

  /** Distributed producer: stage `df` as a bus of `busPartitions`
    * Kafka-shaped partitions under `root`. `pt` assigns the bus
    * partition (producer keying — hash a key column for Kafka
    * semantics), `order` fixes the within-partition sequence (a bus
    * guarantees per-partition order; a DETERMINISTIC test bus needs
    * the producer to pin it). One text file per bus partition:
    * repartition-by-pt keeps each pt on one task, sortWithinPartitions
    * orders it, partitionBy writes the `pt=N/` layout — all
    * distributed, no driver collect.
    */
  def stage(df: org.apache.spark.sql.DataFrame, root: String,
            busPartitions: Int, pt: org.apache.spark.sql.Column,
            value: org.apache.spark.sql.Column,
            order: org.apache.spark.sql.Column*): Unit = {
    import org.apache.spark.sql.functions.col
    val base = df.select((pt.cast("int").as("pt") +: value.as("value") +:
      order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }): _*)
    val sorted = base
      .repartition(busPartitions, col("pt"))
      .sortWithinPartitions(col("pt") +: order.indices.map(i => col(s"__o$i")): _*)
      .select(col("pt"), col("value"))
    sorted.write.mode("overwrite").partitionBy("pt").text(root)
  }
}

class BusTable(path: String, maxRows: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"bus($path)"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BusSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BusMicroBatchStream(path, maxRows)
      }
    }
}

/** Offset = per-partition consumed counts, serialized `p:n,p:n,...`
  * (partition-id ascending — stable JSON for the checkpoint log).
  */
case class BusOffset(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1).map { case (p, n) => s"$p:$n" }.mkString(",")
}
object BusOffset {
  def parse(s: String): BusOffset =
    if (s == null || s.isEmpty) BusOffset(Map.empty)
    else BusOffset(s.split(",").map { kv =>
      val Array(p, n) = kv.split(":"); p.toInt -> n.toLong
    }.toMap)
}

class BusMicroBatchStream(root: String, maxRows: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    BusOffset(BusSource.partitionDirs(root).map(_._1 -> 0L).toMap)

  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    BusOffset(BusSource.headOffsets(root))

  /** Cap the advance at `limit` rows: spread the budget evenly over the
    * partitions with backlog, remainder to the lowest ids — a
    * deterministic batch plan (no wall-clock, no race).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    BusSource.admit(BusSource.headOffsets(root),
      start.asInstanceOf[BusOffset].counts, limit)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].counts
    val e = end.asInstanceOf[BusOffset].counts
    BusSource.partitionDirs(root).flatMap { case (id, dir) =>
      val from = s.getOrElse(id, 0L)
      val to = e.getOrElse(id, 0L)
      if (to > from)
        Some(BusInputPartition(id,
          BusSource.partFiles(dir).map(_.toString).toArray, from, to))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new BusPartitionReader(partition.asInstanceOf[BusInputPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One bus partition's slice [from, to) for one micro-batch. */
case class BusInputPartition(busPartition: Int, files: Array[String],
                             from: Long, to: Long) extends InputPartition

/** Streams the line range [from, to) across the partition's ordered
  * file list — executor-side, plain buffered IO, O(1) memory.
  */
class BusPartitionReader(p: BusInputPartition)
    extends PartitionReader[InternalRow] {
  private val files = p.files.iterator
  private var reader: java.io.BufferedReader = _
  private var pos = 0L
  private var current: String = _

  private def nextLine(): String = {
    while (true) {
      if (reader == null) {
        if (!files.hasNext) return null
        reader = Files.newBufferedReader(Paths.get(files.next()))
      }
      val line = reader.readLine()
      if (line != null) return line
      reader.close(); reader = null
    }
    null
  }

  override def next(): Boolean = {
    while (pos < p.from) {
      if (nextLine() == null) return false
      pos += 1
    }
    if (pos >= p.to) return false
    current = nextLine()
    if (current == null) return false
    pos += 1
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](p.busPartition, pos - 1,
      UTF8String.fromString(current)))

  override def close(): Unit = if (reader != null) reader.close()
}
