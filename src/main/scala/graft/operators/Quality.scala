package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (Deequ-style): a
  * constraint set over a table evaluates in ONE aggregate pass — at
  * 100 TB the audit costs one scan, not one scan per rule — and yields a
  * (check_name, n_violations, passed) report row per constraint.
  *
  * The reference pipeline validates replication by row counts alone
  * (04_validate_data.py:15-24); this is that step generalized to
  * content-level contracts: nullability, key uniqueness, domains,
  * ranges. Referential integrity across tables stays with the dedicated
  * FK orphan check (C8) — it needs a join, not a scan.
  */
object Quality {
  /** One constraint: display name + an AGGREGATE column counting its
    * violations (0 = pass).
    */
  case class Check(name: String, violations: Column)

  /** SUM over an empty relation is NULL, not 0 — an empty table must
    * PASS its constraints, not report null violations.
    */
  private def zsum(c: Column): Column = coalesce(sum(c), lit(0L))

  /** Rows where the column is null. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", zsum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Rows beyond the first per duplicate NON-NULL value (nulls are
    * not_null's business): count(c) − count(distinct c).
    */
  def unique(c: String): Check =
    Check(s"unique($c)",
      zsum(when(col(c).isNotNull, 1L).otherwise(0L)) - countDistinct(col(c)))

  /** Rows whose value (or null) falls outside the accepted set. */
  def inSet(c: String, values: Seq[String]): Check =
    Check(s"in_set($c)",
      zsum(when(col(c).isNull || !col(c).isin(values.map(lit): _*), 1L)
        .otherwise(0L)))

  /** Rows whose value (or null) falls outside [lo, hi]. */
  def inRange(c: String, lo: Column, hi: Column): Check =
    Check(s"in_range($c)",
      zsum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L)))

  /** Evaluate all checks in one aggregate over `df`, one report row per
    * check: (check_name, n_violations, passed). `prefix` namespaces the
    * check names (typically the table name); reports from several tables
    * union into one audit.
    */
  def report(df: DataFrame, prefix: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val agged = df.agg(checks.head.violations.as("c0"),
      checks.tail.zipWithIndex.map { case (ch, i) =>
        ch.violations.as(s"c${i + 1}") }: _*)
    val rows = checks.zipWithIndex.map { case (ch, i) =>
      struct(lit(s"$prefix.${ch.name}").as("check_name"),
        col(s"c$i").cast("long").as("n_violations"))
    }
    agged.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
  }
}
