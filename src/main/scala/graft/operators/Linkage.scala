package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D16: probabilistic record-linkage scoring (Fellegi–Sunter) — the
  * decision layer on top of the blocking/similarity operators: each
  * candidate pair gets a MATCH SCORE = Σ per-field agreement weights
  * (log-odds ln(m/u), here supplied as integer milli-units so the
  * engine-vs-oracle compare is exact), an agreement BIT VECTOR for
  * audit ("why did these two match"), and a three-way decision
  * (match / possible / non-match) against caller thresholds.
  *
  * In production the weights come from EM over labeled pairs; this
  * operator takes them as given — the estimation step is upstream
  * offline work, the scoring pass is the 100 TB-scale part (one narrow
  * projection over the blocked pairs, fully codegen'd, no shuffle
  * beyond what blocking already did).
  *
  * Reference anchor: the validation step (04_validate_data.py) checks
  * replica equality row-by-row; linkage scoring is the fuzzy version of
  * that check for entity tables without reliable keys.
  */
object Linkage {
  /** One field comparator: display name, agreement predicate over the
    * pair row, and the milli-log-odds weights applied on agree/disagree.
    */
  case class FieldCmp(name: String, agree: Column,
                      wAgreeMilli: Long, wDisagreeMilli: Long)

  /** Score blocked candidate pairs. Adds:
    *  - `agreement_bits`: bit i set iff field i agreed (audit vector)
    *  - `match_score`: Σ weights in milli-units
    *  - `decision`: 'match' (≥ matchMilli), 'possible' (≥ possibleMilli),
    *    'non-match' rows are DROPPED (at corpus scale they are almost
    *    all pairs — emitting them defeats blocking)
    */
  def score(pairs: DataFrame, fields: Seq[FieldCmp],
            matchMilli: Long, possibleMilli: Long): DataFrame = {
    require(fields.nonEmpty, "no comparators")
    require(fields.size <= 62, s"too many comparators (${fields.size})")
    require(matchMilli >= possibleMilli,
      "match threshold below possible threshold")
    val bits = fields.zipWithIndex
      .map { case (f, i) => when(f.agree, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    val total = fields
      .map(f => when(f.agree, lit(f.wAgreeMilli)).otherwise(lit(f.wDisagreeMilli)))
      .reduce(_ + _)
    pairs.withColumn("agreement_bits", bits)
      .withColumn("match_score", total)
      .filter(col("match_score") >= possibleMilli)
      .withColumn("decision",
        when(col("match_score") >= matchMilli, lit("match"))
          .otherwise(lit("possible")))
  }
}
