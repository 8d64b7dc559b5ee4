package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: mask emails, phone numbers,
  * and long digit runs (account/ID numbers) before text ships to a training
  * corpus — the standard redaction pass between raw crawl and tokenization.
  *
  * Pure row-local `regexp_replace` chains — codegen'd string ops, no UDFs,
  * no shuffle, linear scale. The patterns deliberately avoid lookaround and
  * backreferences so the SAME pattern strings run identically under Java's
  * regex engine (Spark) and RE2 (DuckDB oracle, Go/Rust tooling): masking is
  * reproducible across every engine that touches the corpus.
  *
  * Masking order matters and is fixed: emails first (an address contains
  * digit runs), then phones (separator-structured digits), then bare digit
  * runs — each later pattern sees the previous pattern's replacement tokens,
  * never its raw text.
  */
object Scrub {

  /** No-lookaround email matcher (local@domain.tld). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Separator-structured phone runs: 2-3 digit groups joined by `-`, `.`
    * or space, at least three groups (e.g. `25-989-741-2988`,
    * `202 555 0173`). */
  val PhoneRe = "[0-9]{2,4}([- .][0-9]{2,4}){2,4}"

  /** IPv4 literals (dotted quads). Matched BEFORE phones: an IP's
    * digit groups are also a legal dot-separated phone run, and the IP
    * reading is the right one when all four groups are octet-sized. */
  val IpRe = "[0-9]{1,3}(\\.[0-9]{1,3}){3}"

  /** Bare digit runs of `minDigits`+ (account numbers, SSN-ish IDs). */
  def digitRunRe(minDigits: Int): String = s"[0-9]{$minDigits,}"

  /** Mask all four PII classes in `text`. Replacement tokens contain no
    * digits, so later patterns cannot re-match inside earlier replacements.
    * Order fixed: emails (contain digit runs and dots), then IPv4 quads
    * (a legal phone-run shape), then phones, then bare digit runs. */
  def piiMask(text: Column,
              emailTok: String = "<EMAIL>",
              ipTok: String = "<IP>",
              phoneTok: String = "<PHONE>",
              idTok: String = "<ID>",
              minDigits: Int = 6): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, emailTok),
          IpRe, ipTok),
        PhoneRe, phoneTok),
      digitRunRe(minDigits), idTok)
}
