package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Named-table catalog over a directory of parquet files (one file or
  * directory per table). This is the engine's stand-in for the reference's
  * `list_tables` schema discovery (reference utils/database.py:17-30): the
  * set of replicated tables plus their FK graph.
  *
  * At scale each entry would be a partitioned parquet/iceberg table path;
  * reads stay lazy so Catalyst prunes columns and pushes filters into the
  * scan.
  */
object Tables {
  /** All tables of the replicated schema, in no particular order. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** FK edges (parent, child) of the replicated schema — what the
    * reference discovers from all_constraints (utils/database.py:86-109).
    */
  val fkEdges: Seq[(String, String)] = Seq(
    "region" -> "nation",
    "nation" -> "customer",
    "nation" -> "supplier",
    "customer" -> "orders",
    "orders" -> "lineitem",
    "part" -> "lineitem",
    "supplier" -> "lineitem",
    "customer" -> "events")

  /** FK join columns for integrity checks: (child, childCol, parent, parentCol). */
  val fkColumns: Seq[(String, String, String, String)] = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  /** Load a table. The events fixture carries a TIMESTAMP(NANOS) column,
    * which Spark's parquet reader only accepts as a raw long
    * (spark.sql.legacy.parquet.nanosAsLong — set by GraftSession / Verify /
    * Bench); it is converted here to a proper µs timestamp.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
