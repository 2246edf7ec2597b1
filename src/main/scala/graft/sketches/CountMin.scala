package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as relational algebra over portable md5 hashing —
  * like [[Hll]], the sketch state is a plain aggregate: counter(d, j) =
  * COUNT(*) of items hashing to bucket j under hash-row d. Mergeable by
  * addition, persistable as a d×w table of longs, probed with a join +
  * MIN. With fixed hash functions the whole structure is deterministic,
  * so the oracle reproduces counters AND estimates exactly — and the CM
  * guarantee (min-counter ≥ true count, overshoot ≤ collisions) is
  * checked as integer comparisons, not probability hand-waving.
  *
  * Hash row d of item x: 12 hex chars of md5(d || ':' || x) mod w —
  * independent-enough rows from domain separation, identical in any
  * engine with md5.
  */
object CountMin {
  val Depth = 4
  val Width = 512

  private def bucketFor(d: Int, item: Column): Column =
    pmod(conv(substring(md5(concat(lit(d.toString), lit(":"),
      item.cast("string"))), 1, 12), 16, 10).cast("long"), lit(Width.toLong))

  /** (d, bucket, cnt) counter table — the sketch state. ONE scan of the
    * input: the Depth hash rows explode from an inline array (a union of
    * Depth projections would re-scan the source per row), then
    * partial-aggregate.
    */
  def counters(items: DataFrame, itemCol: Column): DataFrame = {
    val hashes = array((0 until Depth).map(d =>
      struct(lit(d).as("d"), bucketFor(d, itemCol).as("bucket"))): _*)
    items.select(explode(hashes).as("x"))
      .select(col("x.d").as("d"), col("x.bucket").as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch tables (counter-wise addition). */
  def merge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point estimates for `probes` (a one-column DataFrame of items):
    * est = min over hash rows of the item's counter. Never below the
    * true count; overshoot bounded by bucket collisions.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, probeCol: String): DataFrame = {
    val keyed = (0 until Depth).map(d =>
      probes.select(col(probeCol), lit(d).as("pd"),
        bucketFor(d, col(probeCol)).as("pb")))
      .reduce(_ unionByName _)
    keyed.join(sketch, col("pd") === col("d") && col("pb") === col("bucket"), "left")
      .groupBy(col(probeCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("cm_est"))
  }

  /** Equi-join CARDINALITY estimate from two sketches alone: the
    * inner-product estimator minᵈ Σⱼ cntA(d,j)·cntB(d,j) (Cormode &
    * Muthukrishnan) — never below the true join size, overshoot bounded
    * by cross-bucket collisions. The cost-based-optimizer primitive: how
    * big is A ⋈ B going to be, answered from two d×w counter tables
    * without touching either input again. Deterministic under the fixed
    * md5 hash rows, so an oracle reproduces the estimate bit-exactly.
    * Counter products are summed in Long: safe while both inputs stay
    * under ~10⁸ rows per hash row (cntA·cntB ≤ n_a·n_b per bucket); past
    * that, widen the `ip` accumulation to DECIMAL(38,0).
    */
  def joinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a")
      .join(b.as("b"), col("a.d") === col("b.d") && col("a.bucket") === col("b.bucket"))
      .groupBy(col("a.d"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("ip"))
      .agg(min(col("ip")).cast("long").as("est_join_size"))
}
