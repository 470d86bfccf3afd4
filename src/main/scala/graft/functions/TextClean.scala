package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing / text normalization for corpus preparation: emails,
  * URLs, and phone-like numbers replaced with stable placeholder
  * tokens, plus whitespace canonicalization.
  *
  * Pure `regexp_replace` chains — per-row, codegen, no shuffle, and
  * RE2-compatible patterns (no backreferences/lookaround) so the same
  * scrub runs on any engine. Redaction COUNTS are computed before
  * replacement so a quality gate can drop documents that are mostly
  * PII rather than silently keeping their husks.
  */
object TextClean {

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "(https?://|www\\.)[^\\s]+"
  // 7+ digit runs with optional separators, anchored to non-digit edges
  private val phoneRe =
    "(^|[^0-9])((\\+?[0-9][0-9 ().-]{5,14}[0-9]))($|[^0-9])"

  def scrubEmails(text: Column): Column =
    regexp_replace(text, emailRe, "<EMAIL>")

  def scrubUrls(text: Column): Column =
    regexp_replace(text, urlRe, "<URL>")

  def scrubPhones(text: Column): Column =
    regexp_replace(text, phoneRe, "$1<PHONE>$4")

  /** Collapse whitespace runs and trim — after scrubbing so adjacent
    * redactions don't leave double spaces. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Full scrub pipeline. */
  def scrub(text: Column): Column =
    normalizeWhitespace(scrubPhones(scrubUrls(scrubEmails(text))))

  /** How many matches a pattern has in `text` (size of split minus 1 —
    * regexp_count without a dedicated function). */
  private def countMatches(text: Column, re: String): Column =
    when(text.isNull, 0).otherwise(
      size(split(text, re, -1)) - 1).cast("long")

  def emailCount(text: Column): Column = countMatches(text, emailRe)
  def urlCount(text: Column): Column = countMatches(text, urlRe)
}
