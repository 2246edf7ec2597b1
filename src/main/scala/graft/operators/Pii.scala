package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** T38 (r12): PII scrubbing for training corpora — the standard
  * pre-training hygiene pass (emails, IPv4s, phone numbers replaced
  * by typed placeholders, with per-document counts for the removal
  * report). Patterns are deliberately the portable ASCII subset that
  * evaluates identically under Java regex (Spark, codegen'd
  * `regexp_replace`/`regexp_count` builtins — no UDF) and RE2
  * (DuckDB oracle): character classes, bounded quantifiers, `\b`,
  * non-capturing groups; no backreferences or lookaround.
  *
  * Redaction order is fixed (email → ip → phone): an email's
  * dotted-digit host could otherwise partially match the IP pattern;
  * placeholders contain no digits or `@`, so later passes never
  * re-match earlier replacements.
  */
object Pii {
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Stage 1: emails redacted. */
  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, EmailToken)

  /** Stage 2 input must be stage-1 output. */
  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, IpToken)

  /** Stage 3 input must be stage-2 output. */
  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, PhoneToken)

  /** Redacted text: all three PII classes replaced, in the fixed
    * order documented above.
    */
  def redact(text: Column): Column =
    redactPhones(redactIps(redactEmails(text)))

  /** PROGRESSIVE match counts — each class counted on the text with
    * the earlier classes already redacted, so the counts equal exactly
    * what [[redact]] replaced (an email whose host looks like an IP is
    * one email, not one email and one IP).
    */
  def countEmails(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def countIps(text: Column): Column =
    regexp_count(redactEmails(text), lit(Ipv4Pattern))
  def countPhones(text: Column): Column =
    regexp_count(redactIps(redactEmails(text)), lit(PhonePattern))
}
