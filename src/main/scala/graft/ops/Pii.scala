package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for training-data pipelines — the bridge
  * between the corpus operators and the protection engine: detect → redact
  * (or selectively encrypt) before text ever reaches a training shard.
  *
  * Detectors are regex heuristics chosen to behave identically under Java's
  * regex engine (Spark codegen) and RE2 (the DuckDB oracle): character
  * classes, bounded repetition and `\b` only — no lookarounds, no
  * backreferences. Everything is a per-row column expression: zero shuffle,
  * survives column pruning, runs inside whole-stage codegen.
  */
object Pii {

  /** user@host.tld — local part and domain restricted to the common charset
    * (case-insensitive via explicit classes, not flags, for engine parity).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 3-3-4 digit groups separated by -, ., or space. */
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Dotted-quad IPv4 (permissive — no octet range check; a detector, not a
    * validator).
    */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** SSN-shaped 3-2-4 digit groups. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Ordered (pattern, replacement-token) table used by [[redact]]; order
    * matters (emails before phones so a phone inside a local part is not
    * double-replaced — with these charsets they cannot overlap, but the
    * fixed order keeps the output engine-independent by construction).
    */
  val Redactions: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    SsnRe -> "<SSN>",
    PhoneRe -> "<PHONE>",
    Ipv4Re -> "<IP>")

  /** Number of matches of `re` in `text` (0 for null text). */
  def countMatches(text: Column, re: String): Column =
    coalesce(size(regexp_extract_all(text, lit(re), lit(0))), lit(0))
      .cast("long")

  /** All matches of `re`, in order. */
  def extractAll(text: Column, re: String): Column =
    regexp_extract_all(text, lit(re), lit(0))

  /** Replace every detector hit with its class token, in [[Redactions]]
    * order.
    */
  def redact(text: Column): Column =
    Redactions.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, lit(re), lit(token))
    }

  /** Per-document detector summary: one count column per PII class plus a
    * `has_pii` flag.
    */
  def detect(text: Column): Seq[Column] = Seq(
    countMatches(text, EmailRe).as("n_emails"),
    countMatches(text, PhoneRe).as("n_phones"),
    countMatches(text, Ipv4Re).as("n_ipv4"),
    countMatches(text, SsnRe).as("n_ssn"),
    (countMatches(text, EmailRe) + countMatches(text, PhoneRe) +
      countMatches(text, Ipv4Re) + countMatches(text, SsnRe) > 0)
      .cast("long").as("has_pii"))
}
