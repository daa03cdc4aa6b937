package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for pretraining corpora: emails, North
  * American phone numbers, and IPv4 addresses, the three patterns every
  * public data-curation pipeline scrubs first.
  *
  * The patterns use only syntax with identical semantics in Java regex
  * (Spark, codegen'd `regexp_count`/`regexp_replace`) and RE2
  * (DuckDB/Go oracles): character classes, bounded repetition, and the
  * ASCII word boundary `\b`. Detection and redaction are pure
  * projections — zero shuffles, scan-speed at any corpus size.
  */
object Pii {

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  // The *Count detectors are independent raw-text match counts, NOT the
  // number of replacements redact() performs: an IPv4 embedded in an
  // email domain (user@10.0.0.1) counts in both n_emails and n_ips but
  // is redacted once, as [EMAIL] (email-first precedence below).

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")

  /** Replace every PII occurrence with a typed placeholder. Emails are
    * redacted first (an address like `user@1.2.3.4` must become
    * `[EMAIL]`, not a partial IP redaction inside the domain), then
    * phones, then IPv4 on the already-redacted text.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe), lit("[PHONE]")),
      lit(Ipv4Re), lit("[IP]"))
}
