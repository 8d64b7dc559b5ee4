package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard training-data cleaning pipeline, composed as ONE lazy
  * declarative plan — the point of building every stage as a column
  * expression / narrow-key join is that the whole chain fuses into a
  * handful of stages Catalyst can see through (filters push past each
  * other, column pruning crosses stage boundaries), instead of N
  * materialization barriers between N tools.
  *
  * Stages: cheap row-local quality gate → exact content dedup (first id
  * wins) → benchmark decontamination → sliding-window chunking. Heavier
  * stages see strictly fewer rows; nothing materializes until the sink.
  */
object Pipeline {

  /** Clean `docs` against a held-out `bench` corpus and emit training
    * chunks (idCol, chunk_idx, chunk_hash, n_chunk_tokens).
    *
    * One shuffle for the dedup groupBy, one narrow-key shuffle pair for
    * the contamination probe (bench side broadcast), none for the gate or
    * the chunking. */
  /** `contamination` picks the decontamination flavor: `"drop"` (default)
    * removes whole contaminated documents ([[graft.ops.Dedup.contaminationFlags]]);
    * `"excise"` keeps the documents and surgically removes just the
    * benchmark-overlapping spans ([[graft.ops.Dedup.decontaminateSpans]],
    * q175) — documents excised to nothing are dropped. Excision can in
    * principle create NEW n-grams at the cut seams (the known artifact of
    * span surgery); callers needing a zero-overlap guarantee re-run the
    * flag pass on the output. */
  def cleanCorpus(docs: DataFrame, bench: DataFrame,
                  idCol: String, textCol: String,
                  minTokens: Int = 20, ngram: Int = 5,
                  chunkSize: Int = 16, overlap: Int = 4,
                  contamination: String = "drop",
                  scope: CacheScope = CacheScope.noop): DataFrame = {
    require(contamination == "drop" || contamination == "excise",
      s"contamination must be drop or excise, got '$contamination'")
    val t = col(textCol)

    // 1. quality gate: row-local, evaluated in the scan stage
    val gated = docs.select(col(idCol).as("_id"), t.as("_text"))
      .filter(TextAnalysis.tokenCount(col("_text")) >= minTokens)

    // 2. exact dedup, minimum id survives per fingerprint: min_by carries
    // the whole winning row through ONE partial-aggregated shuffle (no
    // join-back pass). Cached (scope-owned): both the contamination
    // shingle build and the chunking branch consume it — uncached, the
    // corpus scan + dedup shuffle would run twice.
    val deduped = scope.track(gated
      .groupBy(TextAnalysis.fingerprint(col("_text")).as("_fp"))
      .agg(min_by(struct(col("_id"), col("_text")), col("_id")).as("_row"))
      .select(col("_row._id").as("_id"), col("_row._text").as("_text"))
      .cache())

    // 3. decontamination against the benchmark's n-gram set — drop the
    // whole document, or excise just the overlapping spans (q175)
    val benchR = bench.select(col(idCol).as("_id"), col(textCol).as("_text"))
    val clean = contamination match {
      case "drop" =>
        val flags = Dedup.contaminationFlags(deduped, benchR, "_id", "_text",
          ngram, scope = scope)
        deduped.join(flags.filter(col("contaminated") === 0)
          .select(col("_id")), Seq("_id"), "left_semi")
      case _ =>
        Dedup.decontaminateSpans(deduped, "_id", "_text", benchR, "_text", ngram)
          .filter(col("kept_tokens") > 0)
          .select(col("_id"), col("text_clean").as("_text"))
    }

    // 4. chunk for the context window
    clean.select(col("_id").as(idCol),
        explode(TextAnalysis.chunkTokens(col("_text"), chunkSize, overlap)).as("_c"))
      .select(col(idCol), col("_c.idx").as("chunk_idx"),
        md5(col("_c.chunk")).as("chunk_hash"),
        size(split(col("_c.chunk"), " ")).as("n_chunk_tokens"))
  }

  /** The curation recipe the round-6 operators exist for, composed
    * end-to-end: length gate → chunk-level exact dedup with text rebuild
    * (CCNet) → DSIR importance weights against a trusted-language target
    * → token-budget selection of the highest-weight documents. The modern
    * pretraining-data shape: dedup BEFORE weighting (duplicates would
    * inflate their own n-gram likelihoods), weight before selection,
    * select under an explicit token budget.
    *
    * Scale shape is inherited from the parts, each already in its
    * minimal-scan form (cached narrow streams, vocabulary-sized count
    * tables, boundary-partition budget windows). The DSIR weight frame —
    * document-count-sized — has ONE consumer since round 15: the budget
    * draw derives the corpus total from its own per-partition totals.
    *
    * Returns the selected documents as (idCol, n_tokens, lr_micro),
    * ranked prefix of the (weight desc, id) order under
    * `budgetNum/budgetDen` of the CLEANED corpus's tokens. */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, targetLang: String = "en",
                   minChars: Int = 200, chunkTokens: Int = 10,
                   budgetNum: Long = 1, budgetDen: Long = 2,
                   scope: CacheScope = CacheScope.noop): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0, "budget fraction must be positive")
    // cached: the rebuild and the (id, lang) metadata join both consume
    // the gated frame, and the length gate forces a full text read to
    // re-evaluate — uncached, that is a second corpus scan per call
    val gated = scope.track(docs.select(col(idCol), col(textCol), col(langCol))
      .filter(length(col(textCol)) >= minChars).cache())
    val rebuilt = Dedup.chunkDedupRebuild(gated, idCol, textCol, chunkTokens, scope)
    val cleanDocs = rebuilt.join(gated.select(col(idCol), col(langCol)), Seq(idCol))
    // round 15 (r14 verdict #6): the corpus-total pass folds into the
    // budget draw's own per-partition totals (exact long sums — an
    // identical budget), so the weight frame has ONE consumer and its
    // outer cache is gone with the separate collect. An empty weight
    // frame yields total 0 → budget 0 → empty selection, as before.
    val weights = Corpus.dsirWeights(cleanDocs, idCol, "clean_text",
      col(langCol) === targetLang, scope)
    BudgetSelect.selectByBudgetFrac(weights, "n_tokens",
        budgetNum, budgetDen, scope,
        col("lr_micro").desc, col(idCol).asc)
      .select(col(idCol), col("n_tokens"), col("lr_micro"))
  }

  /** The published web-pipeline QUALITY recipe composed end-to-end — the
    * FineWeb/RefinedWeb refinement ladder in rung-cost order, each rung
    * seeing strictly fewer rows:
    *
    *  1. Gopher gate ([[TextAnalysis.gopherQualityGate]], q140) —
    *     row-local, evaluated in the scan stage; failing docs exit before
    *     anything aggregates;
    *  2. vocabulary-coverage gate over the SURVIVORS
    *     ([[Corpus.vocabCoverage]], q142) — the vocab is built on
    *     gopher-clean docs deliberately: junk must not vote for the
    *     vocabulary it is judged against;
    *  3. cross-document duplicated-span removal on what remains
    *     ([[Dedup.dupSpanRemove]], q144) — the ExactSubstr rebuild, paid
    *     only for docs worth keeping.
    *
    * Returns [[Dedup.dupSpanRemove]]'s shape: (idCol, n_tokens,
    * kept_tokens, text_clean). Order matters and is pinned by the gate
    * query: gating AFTER span removal would let removed boilerplate
    * still count toward word-count/stopword features, and a vocab built
    * before the Gopher cut skews toward template tokens.
    *
    * Scale shape: the gate frame is scope-cached (the
    * [[curateCorpus]] precedent — three consumers would otherwise
    * re-scan the corpus through the row-local filter); each rung's own
    * movement budget is unchanged from its standalone form, and the two
    * id semi joins between rungs are narrow. */
  def refineCorpus(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, vocabTopK: Int = 10000,
                   maxOovFrac: Double = 0.1, spanN: Int = 5,
                   withRepetition: Boolean = false,
                   repTopNs: Seq[(Int, Double)] =
                     Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
                   repRepNs: Seq[(Int, Double)] =
                     Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
                         8 -> 0.12, 9 -> 0.11, 10 -> 0.10),
                   scope: CacheScope = CacheScope.noop): DataFrame = {
    // round 14 (guide §2.4): both opening gates are ROW-LOCAL rules, so
    // they compose into the scan stage as plain filters — the previous
    // frame-returning form semi-joined the corpus back onto its own gate
    // output by id, a whole extra shuffle (two, with repetition) of the
    // corpus that moved the text for nothing. Verdict expressions are
    // shared with the gate queries (gopherOkCol / repetitionStats), so
    // the admitted set is bit-identical.
    val gopherPass = docs.filter(
      TextAnalysis.gopherOkCol(col(textCol), minWords = minWords) === 1)
    // `withRepetition` inserts the q160 within-doc repetition gate
    // (thresholds from repTopNs/repRepNs, paper defaults) BETWEEN the
    // Gopher cut and the vocab vote — still row-local, so it rides the
    // same scan stage as the Gopher rules and shifts no movement budget;
    // repetition-spam must not vote for the vocabulary either
    val pass0 =
      if (withRepetition)
        gopherPass.filter(graft.functions.RepetitionExprs.repetitionStats(
          col(textCol), 0.30, 0.20, repTopNs, repRepNs)("rep_ok") === 1)
      else gopherPass
    val pass1 = scope.track(pass0.cache())
    val vocabOk = Corpus.vocabCoverage(pass1, idCol, textCol, vocabTopK,
        maxOovFrac, scope)
      .filter(col("vocab_ok") === 1).select(col(idCol))
    val pass2 = pass1.join(vocabOk, Seq(idCol), "left_semi")
    Dedup.dupSpanRemove(pass2, idCol, textCol, spanN, scope)
  }

  /** Pre-training release audit, composed as ONE lazy plan: per-group cap
    * (domain quota) → deterministic split assignment → chunk-level
    * train→eval leakage — rolled up to a per-split report (docs, chunks,
    * leaked chunks, leak rate). The go/no-go dashboard row a release
    * gate reads before a corpus ships: a leak_rate above the noise floor
    * means the split function leaks near-identical pages across the
    * boundary (usually because dedup ran AFTER splitting).
    *
    * Scale shape is its parts': one group-key window for the cap, one
    * digest equi-join for the probe, then a |splits|-row aggregate.
    * `leak_rate` = one IEEE division of two exact sums — engine-stable
    * under any partitioning. Only non-train splits appear (train cannot
    * leak into itself). */
  def auditReport(docs: DataFrame, idCol: String, textCol: String,
                  groupCol: String, cap: Int,
                  splits: Seq[(String, Double)], trainSplit: String,
                  chunkTokens: Int,
                  scope: CacheScope = CacheScope.noop): DataFrame = {
    val capped = TextAnalysis.groupCap(docs, groupCol, idCol, cap)
      .withColumn("_split", TextAnalysis.hashSplit(col(idCol), splits))
    val leaks = Dedup.splitLeakage(capped, idCol, textCol, "_split",
      trainSplit, chunkTokens, scope)
    leaks.groupBy(col("_split").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("n_leaked")).as("n_leaked"))
      .withColumn("leak_rate", col("n_leaked").cast("double") / col("n_chunks"))
  }

  /** The batch INGEST FRONT DOOR composed as one call — the per-document
    * verdict a daily 100-TB loop needs for an arriving batch, rungs in
    * escalating cost order against the two STANDING stores:
    *
    *  1. exact content dedup against the fingerprint snapshot
    *     ([[Dedup.incrementalDedupSnapshot]], the q96/q131 rung) —
    *     `dup_history` / `dup_batch`;
    *  2. fuzzy near-dup against the MinHash-LSH index
    *     ([[Dedup.incrementalNearDupsWith]], the q97/q126 rung) for the
    *     EXACT SURVIVORS ONLY — `near_dup` with the best historical match
    *     (hist_id, jaccard); everything else stays `kept`.
    *
    * One row per batch doc: (idCol, verdict, hist_id, jaccard) —
    * hist_id/jaccard null except on near_dup rows. An exact duplicate is
    * never fuzzy-probed: its verdict is already terminal, and the rung
    * order is the point — the cheap rung's semi join gates the expensive
    * shingle/band work down to the docs that still need a decision (on a
    * healthy ingest, near-dup candidates are a sliver of the batch).
    *
    * Scale shape is its rungs': the exact rung broadcasts the batch's
    * distinct fingerprints ONTO the snapshot scan (history never
    * shuffles); the fuzzy rung shingles only survivors and probes the
    * index's cached flat tables. The extra composition cost is one
    * batch-sized semi join on the id and one batch-sized left join
    * assembling the final verdict — both narrow, no text movement. */
  def ingestGate(batch: DataFrame, idCol: String, textCol: String,
                 snapshot: DataFrame, index: Dedup.NearDupIndex,
                 minJaccard: Double = 0.2,
                 scope: CacheScope = CacheScope.noop,
                 bloomPrefilter: Option[Array[Byte]] = None,
                 batchFps: Option[DataFrame] = None): DataFrame = {
    // `batchFps` (idCol, "fp"): a caller-owned fingerprint frame of the
    // batch — the exact rung then skips its own fingerprint pass (the
    // round-15 shared-memo discipline); verdicts are identical by
    // construction
    val exact = scope.track((batchFps match {
      case Some(bf) => Dedup.incrementalDedupFromFps(bf, idCol, "fp",
        snapshot, "fp", bloomPrefilter)
      case None => Dedup.incrementalDedupSnapshot(batch, idCol, textCol,
        snapshot, scope = scope, bloomPrefilter = bloomPrefilter)
    }).cache())
    val survivors = batch.join(
      exact.filter(col("verdict") === "kept").select(col(idCol)),
      Seq(idCol), "left_semi")
    val fuzzy = Dedup.incrementalNearDupsWith(survivors, index, idCol,
      textCol, minJaccard, scope)
    exact.join(fuzzy, Seq(idCol), "left")
      .select(col(idCol),
        when(col("hist_id").isNotNull, lit("near_dup"))
          .otherwise(col("verdict")).as("verdict"),
        col("hist_id"), col("jaccard"))
  }

  /** The MEDIA front door — [[ingestGate]]'s multimodal twin, rungs in
    * escalating cost order so each sees strictly fewer payloads:
    *
    *   1. payload integrity (row-local md5/len vs the ingest `meta`
    *      struct): `missing` / `truncated` / `corrupted` payloads
    *      verdict here and never reach a decode or probe;
    *   2. (optional, `audioGate = true`) the arrival-time audio quality
    *      gate — clipped rails / dead air verdict `low_quality`
    *      (row-local counts over the RIFF-extracted PCM);
    *   3. the standing perceptual-store probe — payloads perceptually
    *      near history verdict `dup_history` with `hist_id`/`dist`
    *      (hashed in the store's FOUNDING signature space);
    *   4. `kept`.
    *
    * PROBE-ONLY, like every standing-store read path: appending the
    * kept payloads to the store ([[Multimodal.appendPHashIndex]]) is
    * the caller's write-back step. The batch must be PACKED (payload +
    * meta — [[Multimodal.packBinary]]'s layout) with an integral id
    * (the audio rung's typed row-local encoder). Scale shape: two
    * row-local passes + one banded store probe; quality rungs never
    * shuffle, and only integrity-ok (and quality-kept) payloads are
    * ever hashed. Returns (idCol, verdict, hist_id, dist). */
  def mediaIngestGate(batch: DataFrame, idCol: String,
                      index: Multimodal.PHashIndex,
                      maxDist: Int = 6,
                      audioGate: Boolean = false,
                      maxClipFrac: Double = 0.2,
                      maxSilenceFrac: Double = 0.5,
                      silenceTol: Int = 2,
                      scope: CacheScope = CacheScope.noop): DataFrame = {
    Multimodal.requireIntegralId(batch, idCol, "mediaIngestGate")
    val integ = scope.track(
      Multimodal.payloadIntegrity(batch, idCol).cache())
    val healthy = batch.join(
      integ.filter(col("verdict") === "ok").select(col(idCol)),
      Seq(idCol), "left_semi")
    val (audited, survivors) =
      if (!audioGate) (None: Option[DataFrame], healthy)
      else {
        val g = scope.track(Multimodal.wavQualityGate(healthy, idCol,
            maxClipFrac, maxSilenceFrac, silenceTol)
          .withColumnRenamed("id", idCol).cache())
        (Some(g), healthy.join(
          g.filter(col("keep")).select(col(idCol)), Seq(idCol), "left_semi"))
      }
    val fuzzy = Multimodal.incrementalPerceptualDupsWith(survivors, index,
      idCol, "payload", maxDist)
    val withQuality = audited match {
      case Some(g) => integ.select(col(idCol), col("verdict").as("_iv"))
        .join(g.select(col(idCol), col("keep").as("_keep")), Seq(idCol), "left")
      case None => integ.select(col(idCol), col("verdict").as("_iv"))
        .withColumn("_keep", lit(true))
    }
    withQuality
      .join(fuzzy.select(col(idCol), col("hist_id"), col("dist")),
        Seq(idCol), "left")
      .select(col(idCol),
        when(col("_iv") =!= "ok", col("_iv"))
          .when(!coalesce(col("_keep"), lit(true)), lit("low_quality"))
          .when(col("hist_id").isNotNull, lit("dup_history"))
          .otherwise(lit("kept")).as("verdict"),
        col("hist_id"), col("dist"))
  }
}
