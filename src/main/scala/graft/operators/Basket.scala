package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket support counters and their INCREMENTAL maintenance.
  *
  * The 2-itemset rule table (SURVEY R67) is a pure function of two
  * counter tables: pair supports and item supports. Both are plain
  * integer counts, so they follow the same incremental pattern as the
  * HLL registers (R44) and the t-digest states (R38b): persist the
  * counters, count ONLY the delta, merge by groupBy-sum — history is
  * never re-read. Correctness is exact, not approximate: a basket
  * (order) lives entirely inside one ingest batch, so its pairs are
  * counted exactly once no matter how the order stream is batched, and
  * counter addition is associative/commutative.
  *
  * At 100 TB the difference is a full-corpus self-join per refresh vs a
  * delta-sized one: pair generation is the bounded per-order self-join
  * (fan-out = C(basket size, 2), never corpus-squared), and the merge is
  * one hash aggregate keyed on the pair.
  *
  * Reference anchor: the reference's incremental loop (03_cdc_etl.py
  * delta extract → apply) applied to a derived analytic artifact rather
  * than a replica table.
  */
object Basket {

  /** Distinct (basket, item) pairs → pair-support counters.
    * `baskets` must have integral columns `basket` and `item`.
    */
  def pairSupports(baskets: DataFrame): DataFrame = {
    val b = baskets.select(col("basket"), col("item")).distinct()
    b.select(col("basket"), col("item").as("part_a"))
      .join(b.select(col("basket"), col("item").as("part_b")), Seq("basket"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support_pair"))
  }

  /** Distinct (basket, item) pairs → per-item support counters. */
  def itemSupports(baskets: DataFrame): DataFrame =
    baskets.select(col("basket"), col("item")).distinct()
      .groupBy(col("item")).agg(count(lit(1)).as("support"))

  /** R96: item-item Jaccard similarity — the item-based collaborative-
    * filtering similarity matrix: for item pairs co-occurring in ≥
    * `minPairSupport` baskets, |baskets(a) ∩ baskets(b)| over
    * |baskets(a) ∪ baskets(b)| in exact ppm. Jaccard normalization is
    * what separates "genuinely similar" from "merely popular" — the
    * co-count table ([[pairSupports]], also-bought) ranks hubs first;
    * this divides them back down by their ubiquity.
    *
    * Scale posture: pair generation is bounded by the BASKET contract
    * (C(basket size, 2) rows per basket — per-source capped upstream
    * like T10), never wedge- or corpus-quadratic; the per-item support
    * join is item-keyed. Union via inclusion-exclusion, no set
    * materialization.
    */
  def itemJaccard(baskets: DataFrame, minPairSupport: Long): DataFrame =
    pairSupports(baskets)
      .filter(col("support_pair") >= minPairSupport)
      .join(itemSupports(baskets)
        .select(col("item").as("part_a"), col("support").as("n_a")), Seq("part_a"))
      .join(itemSupports(baskets)
        .select(col("item").as("part_b"), col("support").as("n_b")), Seq("part_b"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("support_pair"))
      .select(col("part_a"), col("part_b"),
        col("support_pair").as("n_inter"), col("n_union"),
        expr("support_pair * 1000000 div n_union").as("jaccard_ppm"))

  /** Merge counter tables (stored + delta(s)): groupBy-sum on the key
    * columns, with `valueCol` summed. Exact for any batch split.
    */
  def mergeCounters(valueCol: String, tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "mergeCounters: no inputs")
    val keys = tables.head.columns.filterNot(_ == valueCol)
    tables.reduce(_ unionByName _)
      .groupBy(keys.map(col).toSeq: _*)
      .agg(sum(col(valueCol)).as(valueCol))
  }

  /** The R67 rule table from the two counter tables: confidence both
    * directions in exact ppm (trunc division, engine-identical).
    */
  def rules(pairSupport: DataFrame, itemSupport: DataFrame,
            minSupport: Long): DataFrame =
    pairSupport.filter(col("support_pair") >= minSupport)
      .join(itemSupport.select(col("item").as("part_a"),
        col("support").as("support_a")), Seq("part_a"))
      .join(itemSupport.select(col("item").as("part_b"),
        col("support").as("support_b")), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("support_pair"),
        col("support_a"), col("support_b"),
        expr("support_pair * 1000000 div support_a").as("conf_a_to_b_ppm"),
        expr("support_pair * 1000000 div support_b").as("conf_b_to_a_ppm"))

  /** Rules extended with LIFT in exact ppm: observed co-occurrence over
    * the independence expectation,
    *
    *   lift_ppm = support_pair · n_baskets · 10⁶ div (support_a · support_b)
    *
    * (> 10⁶ = genuine affinity, < 10⁶ = substitutes/avoidance — the
    * signal confidence alone can't give: a universally popular item has
    * high confidence with everything). The triple product runs in
    * DECIMAL(38,0): support·baskets·10⁶ passes int64 already at ~10⁵
    * baskets. `nBaskets` is a 1-row frame (basket count) — broadcast by
    * construction, like the corpus stats in [[Retrieval.bm25]].
    */
  def rulesWithLift(pairSupport: DataFrame, itemSupport: DataFrame,
                    nBaskets: DataFrame, minSupport: Long): DataFrame =
    rules(pairSupport, itemSupport, minSupport)
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift_ppm",
        expr("""CAST(support_pair AS DECIMAL(38,0)) * n_baskets * 1000000
               | div (CAST(support_a AS DECIMAL(38,0)) * support_b)"""
          .stripMargin))
      .drop("n_baskets")
}
