package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark bookkeeping — the Spark-native form of the reference's
  * ETL_WATERMARKS table + MERGE upsert (scripts/03_cdc_etl.py:56-96) and
  * watermark advance to MAX(change_ts) of the applied delta (:325-333).
  *
  * The store itself is a tiny DataFrame (one row per table/entity); compute
  * is a single partial-aggregating groupBy on the delta — map-side combine
  * means the shuffle carries one row per entity per partition.
  */
object Watermarks {
  /** New candidate watermark per entity = max change-ts observed in the
    * delta batch (reference :325-329).
    */
  def compute(delta: DataFrame, entity: Column, changeTsCol: Column): DataFrame =
    delta.groupBy(entity.as("entity")).agg(max(changeTsCol).as("last_ts"))

  /** Upsert candidates into the current store, keeping the max of old and
    * new per entity — the MERGE of reference :85-96, made monotone (a
    * replayed older batch can never move a watermark backwards).
    */
  def advance(current: DataFrame, computed: DataFrame): DataFrame = {
    val cur = current.select(col("entity").as("ce"), col("last_ts").as("cts"))
    val nxt = computed.select(col("entity").as("ne"), col("last_ts").as("nts"))
    cur.join(nxt, cur("ce") === nxt("ne"), "full_outer")
      .select(
        coalesce(col("ce"), col("ne")).as("entity"),
        greatest(coalesce(col("cts"), col("nts")), coalesce(col("nts"), col("cts"))).as("last_ts"))
  }
}
