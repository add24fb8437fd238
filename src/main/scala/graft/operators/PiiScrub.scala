package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: regex-replace emails and
  * phone-shaped strings with typed placeholder tokens, plus per-doc
  * match accounting (the audit trail a compliance pass needs).
  *
  * Patterns are deliberately RE2-compatible (no backrefs/lookaround) —
  * they run identically under java.util.regex (Spark, codegen'd) and
  * RE2 (DuckDB oracle). Single projection per row, no shuffle.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-ish phone shapes: 555-0123 / (555) 012-3456 /
    * +1-555-012-3456. Separators are only allowed BETWEEN digit
    * groups — a leading separator class would swallow the space
    * before the number into the redaction. */
  val PhoneRe = "\\+?1?[-.]?\\(?\\d{3}[-. )]*\\d{3}[-. ]*\\d{4}|\\b555-\\d{4}\\b"

  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Scrub + counts in one pass: (…, n_emails, n_phones, scrubbed). */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        lit(PhoneRe)).cast("long").as("n_phones"),
      scrubbed(col(textCol)).as("scrubbed"))
}
