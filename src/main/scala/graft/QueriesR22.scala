package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-12 surface growth, per the r11 verdict's ranked gaps: Kafka
  * consumer-group REBALANCE (X58 — two consumers split partitions via
  * the classic JoinGroup/SyncGroup dance, one crashes mid-drain, the
  * survivor inherits and resumes from the victim's committed offsets,
  * zombie commits fenced by generation), plus the Delta/Iceberg
  * maintenance next-tier. House contract as everywhere: deterministic
  * fixtures, every gate a bit-exact hash compare against DuckDB on the
  * same parquet tables.
  */
object QueriesR22 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Run two blocking actions concurrently and propagate the first
    * failure — the shape a JOINT group formation needs (both members'
    * JoinGroup calls must be in flight together for the coordinator to
    * land them in one generation).
    */
  private def inParallel(f: => Unit, g: => Unit): Unit = {
    @volatile var err: Throwable = null
    def guard(body: => Unit): Runnable = () =>
      try body catch { case e: Throwable => if (err == null) err = e }
    val t1 = new Thread(guard(f)); val t2 = new Thread(guard(g))
    t1.start(); t2.start()
    t1.join(60000); t2.join(60000)
    if (err != null) throw err
    require(!t1.isAlive && !t2.isAlive, "parallel group action hung")
  }

  /** X58 (r12): consumer-group REBALANCE end-to-end — the r11
    * verdict's #1 gap ("a group is still single-client; partition
    * splitting and zombie fencing are what 'consumer group' means").
    *
    * Script: orders staged to a 4-partition broker; consumers A and B
    * join one group (classic JoinGroup v0 → leader computes the RANGE
    * assignment client-side → SyncGroup v0 distributes) and split the
    * topic 2+2; each drains a capped slice of its partitions and
    * commits under its (generation, member id); B is KILLED mid-drain
    * (socket death, no LeaveGroup — the crash shape); A rejoins, the
    * coordinator evicts B via session(-as-connection) expiry, and the
    * new generation hands A all 4 partitions; A resumes B's partitions
    * from B's COMMITTED offsets and drains to head. The union of
    * everything consumed must equal the staged topic EXACTLY ONCE —
    * any lost or doubled record shifts the counts/sums and fails the
    * hash. Consumption is client-side by construction (the gate's
    * subject is the membership protocol — a "consumer" IS one client);
    * the executor-parallel data plane remains [[KafkaWireProvider]].
    */
  def streamKafkaRebalance(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      pmod(col("o_orderkey"), lit(4)).cast("int").as("pt"),
      col("o_orderkey").as("ok"),
      to_json(struct(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))).as("v"))
    val total = o.count()
    val server = graft.streaming.KafkaBusServer.serve(
      null, emptyPartitions = 4)
    try {
      graft.streaming.KafkaWire.produceSink(
        o.repartition(4, col("pt")).sortWithinPartitions(col("pt"), col("ok")),
        "127.0.0.1", server.port, "bus", col("pt"), col("v"))
      val group = s"graft-rb-${System.nanoTime()}"
      val a = new graft.streaming.KafkaWire.GroupConsumer(
        "127.0.0.1", server.port, group, "bus")
      val b = new graft.streaming.KafkaWire.GroupConsumer(
        "127.0.0.1", server.port, group, "bus")
      // joint formation: both joins in flight together land in ONE
      // generation inside the coordinator's initial-delay window; the
      // retry erases the residual race (a member that formed alone
      // rejoins — the protocol's own recovery, not a special case)
      var attempts = 0
      var formed = false
      while (!formed) {
        attempts += 1
        require(attempts <= 8, "joint group formation did not converge")
        inParallel(a.rebalance(), b.rebalance())
        formed = a.generation == b.generation &&
          (a.assigned ++ b.assigned).sorted == Seq(0, 1, 2, 3) &&
          a.assigned.intersect(b.assigned).isEmpty
      }
      require(a.assigned.size == 2 && b.assigned.size == 2,
        s"range assignor did not split 2+2: A=${a.assigned} B=${b.assigned}")
      // generation 1: each member drains a capped slice and commits
      val capEach = math.max(1L, total / 16)
      val gotA1 = a.consume(capEach)
      val gotB1 = b.consume(capEach)
      b.kill() // crash, not LeaveGroup: eviction is the broker's job
      val inherited = a.rebalance()
      require(inherited.sorted == Seq(0, 1, 2, 3),
        s"survivor did not inherit all partitions: $inherited")
      val gotA2 = a.consume() // to head; B's partitions resume from B's commits
      a.close()
      import s.implicits._
      val consumed = (gotA1 ++ gotB1 ++ gotA2).map(_._3)
      val df = s.createDataset(consumed).toDF("v")
      df.select(from_json(col("v"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT")).as("e"))
        .groupBy(col("e.o_orderstatus").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("e.cents")).as("sum_cents"),
          min(col("e.o_orderkey")).as("min_ok"),
          max(col("e.o_orderkey")).as("max_ok"))
        .orderBy(col("o_orderstatus"))
    } finally server.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_kafka_rebalance" -> (streamKafkaRebalance _))

  val sql: Map[String, String] = Map(
    "stream_kafka_rebalance" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_ok,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
}
