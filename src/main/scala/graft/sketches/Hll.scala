package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog with dense registers over portable md5 hashing — the
  * register array is nothing but `groupBy(bucket).max(rank)`, so the
  * "sketch" is plain relational algebra: partial-aggregated map-side,
  * mergeable by construction (max of maxes), persistable as a tiny
  * (group, bucket, register) table that future runs UNION + re-max with
  * new data — incremental distinct counting with 256 small ints of state
  * per group.
  *
  * Everything that crosses the oracle boundary is integer-exact:
  *   - bucket  = first 2 hex chars of md5 (8 bits → m = 256)
  *   - rank    = leading zeros of the next 48 bits + 1, derived from the
  *     HEX STRING (ltrim zeros + a 16-case nibble table) — no log2, no
  *     bit intrinsics, identical SQL in Spark and DuckDB
  *   - denom   = Σ_buckets 2^(49−register)  (empty register ⇒ 2^49),
  *     < 2^57, exact in BIGINT — the harmonic denominator scaled by 2^49
  * The float-valued estimate α·m²·2⁴⁹/denom lives JVM-side ([[estimate]],
  * accuracy spec-bounded); the gate compares the exact register digest.
  */
object Hll {
  val B = 8                // bucket bits
  val M: Int = 1 << B      // 256 registers
  val Scale = 49           // rank ∈ [1, 49]; empty register = 0

  /** rank of the 48-bit value whose hex form is `hx12` (12 chars):
    * leading zero bits + 1. String-only arithmetic, engine-portable.
    */
  private def rankFromHex(hx12: Column): Column = {
    val stripped = ltrim(hx12, "0")
    val zeroChars = (lit(12) - length(stripped)) * 4
    val nibble = substring(stripped, 1, 1)
    val inNibble =
      when(nibble === "1", 3)
        .when(nibble.isin("2", "3"), 2)
        .when(nibble.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    when(length(stripped) === 0, lit(Scale))
      .otherwise((zeroChars + inNibble + 1).cast("int"))
  }

  /** (group, bucket, register) dense-register table for `valueCol` —
    * the sketch state. One narrow projection + one max aggregation.
    */
  def registers(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val h = md5(valueCol.cast("string"))
    df.select(col(groupCol),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket"),
        rankFromHex(substring(h, 3, 12)).as("rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("register"))
  }

  /** Merge any number of register tables (the HLL union). `groupCol` is
    * explicit like [[registers]]/[[digest]] — inferring it by position
    * would silently group on the wrong column for a reselected/joined
    * register table.
    */
  def merge(groupCol: String, tables: DataFrame*): DataFrame = {
    tables.foreach(t => require(t.columns.contains(groupCol),
      s"Hll.merge: register table lacks group column '$groupCol' (has ${t.columns.mkString(",")})"))
    tables.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("register")).as("register"))
  }

  /** Exact-integer digest per group: the scaled harmonic denominator
    * Σ 2^(49−register) with 2^49 per empty bucket, plus occupied-bucket
    * and register-sum checksums. This is the oracle-comparable form.
    */
  def digest(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col(groupCol))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $Scale - register)")).cast("long")
          .as("occ_denom"),
        count(lit(1)).cast("long").as("n_occupied"),
        sum(col("register")).cast("long").as("sum_reg"))
      .select(col(groupCol),
        (col("occ_denom") + (lit(M.toLong) - col("n_occupied")) * (1L << Scale))
          .cast("long").as("hll_denom"),
        col("n_occupied"), col("sum_reg"))

  /** The HLL estimate from a digest row's denominator (driver/spec side;
    * α_m = 0.7213/(1 + 1.079/m)).
    */
  def estimate(hllDenom: Long): Double = {
    val alpha = 0.7213 / (1 + 1.079 / M)
    alpha * M.toDouble * M.toDouble * math.pow(2.0, Scale) / hllDenom.toDouble
  }
}
