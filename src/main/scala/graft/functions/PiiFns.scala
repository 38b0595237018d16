package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: regex detection + redaction
  * of emails and phone numbers as codegen'd column expressions (built-in
  * `regexp_replace`/`regexp_extract_all` — no UDF, scales as a narrow
  * projection). The regex dialect is the Java/RE2 common subset so an
  * engine swap (or the DuckDB oracle) computes identical results: no
  * lookbehind, no possessive quantifiers.
  *
  * This generalizes the reference's single-field scrub (the LLM output's
  * `contact_num` handling) to corpus-level redaction — the form a 100 TB
  * pre-training pipeline needs before text ships to a trainer.
  */
object PiiFns {

  /** Common-subset email pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PH-style mobile: `09` + 9 digits, word-bounded (the reference's
    * helpdesk domain normalizes contact numbers to this shape).
    */
  val PhoneRe = "\\b09\\d{9}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"

  /** Occurrences of `re` in `text` (0 for null text). */
  def piiCount(text: Column, re: String): Column =
    coalesce(size(regexp_extract_all(text, lit(re), lit(0))), lit(0))
      .cast("int")

  /** Redact all email + phone matches (emails first, so a phone-looking
    * digit run inside an email local part is already gone).
    */
  def redactAll(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, EmailToken),
      PhoneRe, PhoneToken)
}
