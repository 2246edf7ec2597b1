package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** X47: the bus over a REAL network path — [[BusSource]]'s semantics
  * (per-partition total order, resumable `p:count` offsets,
  * deterministic admission control) served over TCP instead of a
  * shared directory, closing the "the MicroBatchStream is shaped for a
  * network reader but no network path exists" gap. The broker protocol
  * is a minimal Kafka-shaped line protocol (one request per
  * connection):
  *
  *  - `HEADS` → one line `p:count,...` (the bus head, the
  *    [[BusOffset]] wire form);
  *  - `FETCH <pt> <from> <to>` → the half-open record range as raw
  *    lines, then EOF.
  *
  * Scale shape: the DRIVER talks to the broker only for metadata
  * (HEADS); every micro-batch plans one `InputPartition` per bus
  * partition with backlog, and each EXECUTOR task opens its own
  * connection and streams exactly its [from, to) slice — fetches are
  * parallel per partition, rows never pass through the driver, and a
  * reader holds O(1) memory. [[BusServer]] is the test-harness broker
  * (serves a [[BusSource.stage]]d directory); the client sees only the
  * protocol, so a real broker could stand behind the same two verbs.
  */
object SocketBus {
  /** One request/response exchange against the broker. */
  private[streaming] def request(host: String, port: Int, cmd: String)
      : Seq[String] = {
    val sock = new Socket(host, port)
    try {
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      out.println(cmd)
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
    } finally sock.close()
  }

  def headOffsets(host: String, port: Int): Map[Int, Long] = {
    val lines = request(host, port, "HEADS")
    require(lines.nonEmpty, s"bus broker at $host:$port returned no HEADS")
    BusOffset.parse(lines.head).counts
  }
}

/** Test-harness broker: serves a [[BusSource.stage]]d directory over
  * the [[SocketBus]] protocol. Daemon accept loop, one thread per
  * connection, ephemeral port by default; `close()` stops the loop.
  */
object BusServer {
  final class Handle(server: ServerSocket) extends AutoCloseable {
    def port: Int = server.getLocalPort
    override def close(): Unit = server.close()
  }

  def serve(root: String, port: Int = 0): Handle = {
    val server = new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      while (!server.isClosed) {
        val sock =
          try server.accept()
          catch { case _: java.net.SocketException => null }
        if (sock != null) {
          val h = new Thread(() => handle(root, sock))
          h.setDaemon(true)
          h.start()
        }
      }
    }, s"bus-server-${server.getLocalPort}")
    t.setDaemon(true)
    t.start()
    new Handle(server)
  }

  private def handle(root: String, sock: Socket): Unit =
    try {
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(sock.getOutputStream, false)
      val cmd = in.readLine()
      if (cmd != null) cmd.trim.split("\\s+").toSeq match {
        case Seq("HEADS") =>
          out.println(BusOffset(BusSource.headOffsets(root)).json())
        case Seq("FETCH", pt, from, to) =>
          val dir = BusSource.partitionDirs(root).toMap
            .getOrElse(pt.toInt,
              throw new IllegalArgumentException(s"no partition $pt"))
          var pos = 0L
          val f0 = from.toLong
          val t0 = to.toLong
          BusSource.partFiles(dir).iterator
            .takeWhile(_ => pos < t0)
            .foreach { f =>
              val s = Files.lines(f)
              try s.iterator().asScala.foreach { line =>
                if (pos >= f0 && pos < t0) out.println(line)
                pos += 1
              } finally s.close()
            }
        case other =>
          out.println(s"ERR unknown command: ${other.mkString(" ")}")
      }
      out.flush()
    } catch {
      case _: Throwable => () // connection-scoped; the broker survives
    } finally sock.close()
}

/** `spark.readStream.format("graft.streaming.SocketBusProvider")
  * .option("host", h).option("port", p)
  * .option("maxRowsPerTrigger", n).load()` — [[BusSource.schema]] rows.
  */
class SocketBusProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    new SocketBusTable(opts.getOrElse("host", "127.0.0.1"),
      opts.getOrElse("port",
        throw new IllegalArgumentException("option 'port' is required")).toInt,
      opts.get("maxrowspertrigger").map(_.toLong))
  }
}

class SocketBusTable(host: String, port: Int, maxRows: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"socketbus($host:$port)"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BusSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SocketBusMicroBatchStream(host, port, maxRows)
      }
    }
}

class SocketBusMicroBatchStream(host: String, port: Int, maxRows: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    BusOffset(SocketBus.headOffsets(host, port).map { case (p, _) => p -> 0L })

  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    BusOffset(SocketBus.headOffsets(host, port))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    BusSource.admit(SocketBus.headOffsets(host, port),
      start.asInstanceOf[BusOffset].counts, limit)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].counts
    val e = end.asInstanceOf[BusOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (p, to) =>
      val from = s.getOrElse(p, 0L)
      if (to > from) Some(SocketBusInputPartition(host, port, p, from, to))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new SocketBusPartitionReader(
          partition.asInstanceOf[SocketBusInputPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One bus partition's slice [from, to), fetched over its own
  * connection by the executor task.
  */
case class SocketBusInputPartition(host: String, port: Int,
                                   busPartition: Int,
                                   from: Long, to: Long) extends InputPartition

class SocketBusPartitionReader(p: SocketBusInputPartition)
    extends PartitionReader[InternalRow] {
  private val sock = new Socket(p.host, p.port)
  private val in = {
    val out = new PrintWriter(sock.getOutputStream, true)
    out.println(s"FETCH ${p.busPartition} ${p.from} ${p.to}")
    new BufferedReader(new InputStreamReader(
      sock.getInputStream, StandardCharsets.UTF_8))
  }
  private var pos = p.from
  private var current: String = _

  override def next(): Boolean = {
    if (pos >= p.to) return false
    current = in.readLine()
    if (current == null)
      throw new IllegalStateException(
        s"broker closed FETCH ${p.busPartition} at $pos before ${p.to}")
    pos += 1
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](p.busPartition, pos - 1,
      UTF8String.fromString(current)))

  override def close(): Unit = sock.close()
}
