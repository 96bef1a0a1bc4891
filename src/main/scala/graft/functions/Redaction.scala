package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction rules for training-corpus hygiene: pure regexp_replace
  * chains (codegen'd, map-side, shuffle-free at any scale).
  *
  * The chain is ordered most-specific-first: emails are masked before
  * digit rules (addresses may embed digits), then phone-shaped runs
  * (anchored on the leading '+', so a bare digit ID can never match),
  * then 12-digit IDs — a '+'-prefixed 12-digit run is thus labeled
  * [PHONE], not '+[ID]', keeping downstream audit counts honest.
  * Patterns use explicit [0-9] classes so Java (Spark) and RE2
  * (DuckDB oracle) agree without unicode-digit surprises.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongIdPattern = "[0-9]{12}"
  val PhonePattern = "\\+[0-9][0-9 \\-]{7,}[0-9]"

  /** Mask emails → [EMAIL], +international phone-shaped runs → [PHONE],
    * 12-digit IDs → [ID]. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      LongIdPattern, "[ID]")

  /** Count of email-shaped substrings (pre-redaction audit metric). */
  def emailCount(c: Column): Column =
    coalesce(regexp_count(c, lit(EmailPattern)), lit(0)).cast("int")

  /** Count of ≥10-digit runs (ID/phone audit metric). */
  def longDigitRunCount(c: Column): Column =
    coalesce(regexp_count(c, lit("[0-9]{10,}")), lit(0)).cast("int")
}
