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

  /** Q5: Benford's-law first-digit screen — the forensic-accounting
    * anomaly test applied to a numeric column: naturally-occurring
    * multi-magnitude amounts follow P(d) = log10(1 + 1/d); fabricated,
    * truncated, or unit-capped data does not. One scan (a 9-group hash
    * aggregate); the expected ppm values are PRECOMPUTED integer
    * constants so the engine-vs-oracle compare never touches float
    * log10 rounding.
    *
    * A uniform- or normal-ish column legitimately fails Benford (the
    * law needs several orders of magnitude) — the report states
    * deviation, the analyst owns the verdict; that is why this is a
    * REPORT, not a [[Check]].
    *
    * @param values rows with a positive numeric column; values < 1 are
    *               excluded (no leading significant digit in the
    *               integer part)
    * @return one row per digit 1..9: (digit, n_obs, obs_ppm, exp_ppm,
    *         dev_ppm = obs − exp)
    */
  def benford(values: DataFrame, value: Column): DataFrame = {
    // floor(log10(1 + 1/d) * 1e6) for d = 1..9
    val expPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val digits = values.filter(value >= 1)
      .select(substring(floor(value).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(coalesce(sum(col("n_obs")), lit(0L)).as("__t"))
    val exp = values.sparkSession.createDataFrame(
      values.sparkSession.sparkContext.parallelize(
        expPpm.zipWithIndex.map { case (p, i) =>
          org.apache.spark.sql.Row(i + 1L, p) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("digit",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("exp_ppm",
          org.apache.spark.sql.types.LongType, nullable = false))))
    exp.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        when(col("__t") === 0, 0L)
          .otherwise(expr("coalesce(n_obs, 0) * 1000000 div __t"))
          .as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** l-diversity audit — the governance check BEHIND k-anonymity: a
    * quasi-identifier group can hold ≥ k members and still leak if they
    * all share one sensitive value (the "everyone in this zip+age cell
    * has the same diagnosis" failure). Per report key: how many
    * quasi-groups exist, how many are low-diversity (distinct sensitive
    * values < l), and the worst group's diversity.
    *
    * Scale shape: one exact countDistinct per quasi-group (a two-stage
    * hash aggregate — Spark plans distinct-agg as expand + two
    * aggregates, all hash-partitioned on the group key) followed by a
    * report-key-sized rollup. No window, no sort.
    */
  def lDiversity(df: DataFrame, reportKey: Column, quasi: Seq[Column],
                 sensitive: Column, l: Long): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(reportKey.as("__rk") +: quasi: _*)
      .agg(countDistinct(sensitive).as("n_vals"))
      .groupBy(col("__rk"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_vals") < l, 1L).otherwise(0L)).as("n_low_div"),
        min(col("n_vals")).as("min_diversity"))
      .withColumnRenamed("__rk", "report_key")
  }
}
