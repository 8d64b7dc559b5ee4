package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** PII census: per (group, rule) how many documents contain at least
    * one raw match and how many matches there are in total — the
    * decision table read BEFORE [[piiMask]] runs. A source with heavy
    * digit-run counts but no emails wants a different `minDigits`; a
    * source with zero hits across all rules doesn't need the masking
    * pass in its plan at all. Each rule is counted INDEPENDENTLY on the
    * raw text (a diagnostic upper bound — [[piiMask]] itself applies the
    * rules sequentially, so a masked email's digits never reach the
    * digit-run rule; the census deliberately reports the raw exposure
    * per class instead).
    *
    * Row-local `regexp_count` projection (codegen'd, no UDFs, RE2-safe
    * patterns — identical enumeration under Java regex and RE2) + one
    * narrow groupBy on (group, rule); linear scale, no text shuffles
    * (only the 4-row-per-doc count structs move). Returns
    * (groupCol, rule, n_docs, n_matches). */
  def piiCensus(docs: DataFrame, groupCol: String, textCol: String,
                minDigits: Int = 6): DataFrame = {
    val rules = Seq("email" -> EmailRe, "ip" -> IpRe, "phone" -> PhoneRe,
      "digit_run" -> digitRunRe(minDigits))
    docs.select(col(groupCol).as("_g"), explode(array(rules.map {
      case (name, re) => struct(lit(name).as("_rule"),
        regexp_count(col(textCol), lit(re)).cast("long").as("_c"))
    }: _*)).as("_s"))
      .groupBy(col("_g").as(groupCol), col("_s._rule").as("rule"))
      .agg(sum(when(col("_s._c") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("_s._c")).as("n_matches"))
  }

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
