package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: regex-replace emails, card
  * numbers, IPv4 addresses, and phone-shaped strings with typed
  * placeholder tokens, plus per-doc match accounting (the audit trail
  * a compliance pass needs).
  *
  * Patterns are deliberately RE2-compatible (no backrefs/lookaround) —
  * they run identically under java.util.regex (Spark, codegen'd) and
  * RE2 (DuckDB oracle). Replacement ORDER is part of the contract:
  * email → card → ip → phone, so card digit groups are gone before the
  * looser phone pattern could bite into them. Single projection per
  * row, no shuffle. */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 16-digit card shapes in 4[- ]4[- ]4[- ]4 groups. */
  val CardRe = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"

  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** North-American-ish phone shapes: 555-0123 / (555) 012-3456 /
    * +1-555-012-3456. Separators are only allowed BETWEEN digit
    * groups — a leading separator class would swallow the space
    * before the number into the redaction. */
  val PhoneRe = "\\+?1?[-.]?\\(?\\d{3}[-. )]*\\d{3}[-. ]*\\d{4}|\\b555-\\d{4}\\b"

  /** The redaction chain in contract order. */
  val Chain: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", CardRe -> "<CARD>",
    Ipv4Re -> "<IP>", PhoneRe -> "<PHONE>")

  def scrubbed(text: Column): Column =
    Chain.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** Scrub + counts in one pass: each count is taken on the text AFTER
    * the earlier patterns were replaced (so counts partition the
    * matches; nothing is counted twice). */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val names = Seq("n_emails", "n_cards", "n_ips", "n_phones")
    val stages = Chain.scanLeft(col(textCol)) {
      case (c, (re, tag)) => regexp_replace(c, re, tag)
    }
    val counts = names.zip(Chain.map(_._1)).zip(stages.init).map {
      case ((name, re), stage) => regexp_count(stage, lit(re)).cast("long").as(name)
    }
    docs.select(col(idCol) +: counts :+ stages.last.as("scrubbed"): _*)
  }
}
