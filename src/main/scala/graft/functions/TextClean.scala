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
  def phoneCount(text: Column): Column = countMatches(text, phoneRe)

  // --- Unicode canonicalization (corpus-prep step 0) ------------------
  // Web-scraped text carries C0 control chars, zero-width marks, and
  // typographic space variants that break tokenization and dedup
  // (visually identical docs hash differently). True NFC composition
  // needs ICU; this is the ENGINE-PORTABLE subset — explicit codepoint
  // ranges only (no Java-only class intersections), so the DuckDB twin
  // runs the same patterns under RE2.

  // \x{...} codepoint syntax: the one form Java regex AND RE2 share
  // (RE2 has no \uXXXX). private[graft] so the generated DuckDB oracle
  // interpolates the SAME patterns instead of a copy that can drift.
  /** C0 controls minus \t\n\r, plus DEL: always garbage in text. */
  private[graft] val controlRe =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  /** Zero-width space/joiners + BOM: invisible dedup poison. */
  private[graft] val zeroWidthRe = "[\\x{200B}-\\x{200D}\\x{FEFF}]"
  /** Unicode space variants (NBSP, en/em/thin spaces, ideographic). */
  private[graft] val unicodeSpaceRe =
    "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]"

  /** Count of characters canonicalization would remove or rewrite —
    * computed BEFORE cleaning (like the PII counts) so a gate can drop
    * documents that are mostly invisible junk. */
  def nonCanonicalCount(text: Column): Column =
    when(text.isNull, 0).otherwise(
      size(split(text, controlRe, -1)) +
        size(split(text, zeroWidthRe, -1)) +
        size(split(text, unicodeSpaceRe, -1)) - 3).cast("long")

  /** The three class rewrites alone (no whitespace collapse) — for
    * pipelines whose NEXT map stage collapses whitespace anyway
    * (CorpusPrepJob's scrub does), saving one full-text regex pass per
    * document in the hottest pure-map path. */
  def canonicalizeClasses(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, controlRe, ""),
        zeroWidthRe, ""),
      unicodeSpaceRe, " ")

  /** Canonical text: controls and zero-width marks stripped, space
    * variants mapped to plain space, whitespace collapsed + trimmed. */
  def canonicalize(text: Column): Column =
    normalizeWhitespace(canonicalizeClasses(text))
}
