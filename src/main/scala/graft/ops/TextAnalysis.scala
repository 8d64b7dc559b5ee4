package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting. All are codegen-friendly compositions of built-in
  * functions (no UDFs) and operate row-local — they scale linearly with no
  * shuffle.
  *
  * Hash choice: md5 — bit-identical across engines (used by the DuckDB
  * oracle), content-stable across runs/partitions.
  */
object TextAnalysis {

  /** Whitespace tokenization of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Characters per token ratio, punctuation density, and a simple
    * quality gate — the usual cheap pre-filters before expensive dedup. */
  def punctRatio(text: Column, punct: String = "[.,!?;:]"): Column =
    // nullif: an empty document must yield null, not an ANSI DIVIDE_BY_ZERO
    // (Spark 4 runs with ANSI mode on by default)
    (length(text) - length(regexp_replace(text, punct, ""))) / nullif(length(text), lit(0))

  /** Ratio of tokens found in a stopword list — the building block of the
    * n-gram/stopword language-ID heuristic. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => array_contains(lit(stopwords.toArray), w))) / size(t)
  }

  /** Stopword-scored language ID: the language whose stopword list scores
    * the highest ratio, or "und" below `minRatio`. Scores tie-break by
    * list order. */
  def langId(text: Column, lists: Seq[(String, Seq[String])], minRatio: Double = 0.05): Column = {
    val scored = lists.map { case (lang, words) => lang -> stopwordRatio(text, words) }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 >= minRatio, best._1).otherwise(lit("und"))
  }

  /** Whitespace-normalized content fingerprint (exact-dup key). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** A BPE-ish subword count approximation: words plus punctuation marks
    * (cheap token-count estimate for budget accounting). Punctuation is
    * counted by length difference — a codegen'd string op — instead of a
    * per-character split+filter walk. */
  def subwordCount(text: Column, punct: String = "[.,!?;:]"): Column =
    (size(split(trim(text), "\\s+"))
      + (length(text) - length(regexp_replace(text, punct, "")))).cast("long")

  /** Winnowing document fingerprints (the standard k-gram/window scheme from
    * the MOSS local-fingerprinting literature): hash every word k-gram in
    * ORDER (not a distinct set), slide a window of `w` consecutive hashes,
    * keep each window's minimum, and return the distinct selected hashes.
    * Guarantees any shared run of ≥ w+k-1 words contributes a shared
    * fingerprint — positional, unlike MinHash's set sketch.
    *
    * md5 as the hash family: bit-identical in the DuckDB oracle. Row-local,
    * shuffle-free; built only from codegen-friendly array functions. */
  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    // one-pass custom expression: the composable form — transform(sequence)
    // over array_min(slice(grams, j, w)) — re-evaluates the whole gram
    // array inside the window lambda (no common-subexpression elimination
    // across higher-order-function boundaries), going O(n²) in md5 calls
    graft.functions.ShingleExprs.winnowingFingerprints(text, k, w)
}
