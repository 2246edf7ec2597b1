package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10b surface growth: the next real-lake tier the r10 sketch
  * ranked — record create-times on the Kafka wire with ListOffsets
  * time seeks (X55), Iceberg APPEND commits (F15d), Avro reader-schema
  * RESOLUTION (F16c), and planar (PlanarConfiguration=2) TIFF (M17d).
  * House contract as everywhere: deterministic fixtures, every gate a
  * bit-exact hash compare against DuckDB on the same tables.
  */
object QueriesR20 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X55: seek-by-TIME on the Kafka wire — orders produced with their
    * o_orderkey as the record CREATE-TIME (monotone per partition:
    * `repartition(pt).sortWithinPartitions(pt, ts)`, the layout the
    * broker time index assumes), then the stream STARTS from
    * `offsetsForTimes(T)` where T = ⌊max(o_orderkey)/2⌋ — a real
    * ListOffsets v1 timestamp lookup, not the -1/-2 sentinels — and
    * replays exactly the suffix. The aggregate carries min/max of the
    * WIRE timestamp column per group, so the hash compare witnesses
    * both the seek boundary (nothing below T leaks in) and create-time
    * fidelity through produce → broker log → fetch.
    */
  def streamKafkaSeekTs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").as("cents"))
    val server = graft.streaming.KafkaBusServer.serve(
      null, emptyPartitions = 4)
    try {
      graft.streaming.KafkaWire.produceSinkTimestamped(
        o.select(pmod(col("o_orderkey"), lit(4)).as("pt"),
            col("o_orderkey").as("ts"),
            to_json(struct(col("o_orderstatus"), col("cents"))).as("v"))
          .repartition(4, col("pt"))
          .sortWithinPartitions(col("pt"), col("ts")),
        "127.0.0.1", server.port, "bus",
        col("pt"), col("ts"), col("v"))
      val seekTs = o.agg(floor(max(col("o_orderkey")) / 2).cast("long"))
        .head.getLong(0) // driver scalar: the seek point, metadata-sized
      val trigger = math.max(100L, o.count() / 8)
      graft.streaming.Streams.kafkaBusReplayFrom(s, "127.0.0.1", server.port,
          "bus", seekTs, trigger, s"gate_kafkaseek_${System.nanoTime()}") { stream =>
        stream.select(col("timestamp").as("ts"),
            from_json(col("value"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "o_orderstatus STRING, cents LONG")).as("e"))
          .groupBy(col("e.o_orderstatus").as("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("e.cents")).as("sum_cents"),
            min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      }.orderBy(col("o_orderstatus"))
    } finally server.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_kafka_seek_ts" -> (streamKafkaSeekTs _))

  val sql: Map[String, String] = Map(
    "stream_kafka_seek_ts" ->
      """WITH thr AS (
        |  SELECT CAST(FLOOR(MAX(o_orderkey) / 2.0) AS BIGINT) AS t
        |  FROM orders)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_ts,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_ts
        |FROM orders, thr WHERE o_orderkey >= thr.t
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
