package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions: the physical plans the engine is supposed to
  * produce at scale actually get produced — filters reach the parquet
  * scan, small dimensions broadcast, aggregates split partial/final,
  * bucketed co-located joins avoid shuffles, and salted joins spread
  * skewed keys. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filter and projection push down to the parquet scan") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), p)
    assert(p.contains("ReadSchema") &&
      !p.contains("l_shipdate"), "projection pruning should drop unused columns")
  }

  test("person join broadcasts the dictionary side") {
    assert(plan("q05_person_join").contains("BroadcastHashJoin"), "J1 must broadcast")
    val anti = plan("q06_anti_join")
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"), "anti join broadcast")
  }

  test("grouped aggregation runs partial then final") {
    val p = plan("q02_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial/final HashAggregate expected:\n" + p)
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // AQE finalizes the plan on execution; run it, then inspect
    val df = SparkEntry.queries("q01_scan_filter")(spark, dir)
    df.count()
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") && p.contains("*(1) Filter"), p)
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS o_b")
    spark.sql("DROP TABLE IF EXISTS l_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("l_b")
    val joined = spark.table("o_b").join(spark.table("l_b"),
      col("o_orderkey") === col("l_orderkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle either side:\n" + p)
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS o_b")
    spark.sql("DROP TABLE IF EXISTS l_b")
  }

  test("IVF ANN broadcasts the codebook and never cross-joins the corpus") {
    val p = plan("q36_ann_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid assignment must broadcast the codebook\n$p")
    // the corpus-side candidate join must be an equi-join on the cell id,
    // not a cartesian product over the vectors
    assert(!p.contains("CartesianProduct"), s"no corpus cartesian product\n$p")
    // corpus cell assignment is a min_by aggregation (map-side partials, one
    // hash shuffle), NOT a row_number window - the window form would sort
    // the whole corpus; windows may only appear on the query side (_qid)
    assert(p.contains("min_by"), s"cell assignment should aggregate with min_by\n$p")
    assert(!p.contains("windowspecdefinition(_id#"),
      s"no corpus-partitioned window in the assignment\n$p")
  }

  test("q38 argmin aggregates with min_by - no window, partials before the exchange") {
    val p = plan("q38_cheapest_supplier")
    // partial_min_by BEFORE the exchange = map-side combine: the shuffle
    // carries one candidate per (partition, part), not all of lineitem.
    // (The SortAggregate's Sort is a per-partition sort on the group key,
    // not the window form's full sort exchange of the fact table.)
    assert(p.contains("partial_min_by"), s"argmin should partial-aggregate map-side\n$p")
    assert(!p.contains("Window"), s"no window over lineitem\n$p")
    assert(p.indexOf("partial_min_by") > p.indexOf("Exchange hashpartitioning"),
      s"partial aggregation must sit below (after in tree order) the exchange\n$p")
  }

  test("q03 grouping sets scan the fact table once") {
    val p = plan("q03_metrics_rollup")
    assert(p.contains("Expand"), s"grouping sets should Expand, not union\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"events must be scanned exactly once\n$p")
    assert(!p.contains("Union"), s"no 3-branch union\n$p")
  }

  test("winnowing stays codegen-compatible and prunes to the two used columns") {
    val df = SparkEntry.queries("q37_winnow")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("lang"),
      "scan should read only doc_id and text")
    assert(df.count() > 0)
  }

  test("q55 bloom probe filters fact rows below the join, no added shuffle") {
    val p = plan("q55_bloom_join")
    assert(p.contains("might_contain"), s"bloom probe must be in the plan\n$p")
    // the probe must sit on the fact SCAN side, beneath the join — i.e.
    // inside a Filter, not applied after the join
    assert(p.indexOf("might_contain") > p.indexOf("Join"),
      s"probe should filter below the join\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the selective dim should broadcast at this size\n$p")
  }

  test("q53 heavy hitters ends in TakeOrdered, partial agg before the exchange") {
    val p = plan("q53_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must TakeOrdered (driver holds k rows, never a global sort)\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"term counts need partial/final aggregation\n$p")
  }

  test("no query in the whole contract plans a CartesianProduct") {
    // broadcast crossJoins of 1-row totals/codebooks plan as
    // BroadcastNestedLoopJoin and are fine; a CartesianProduct is a
    // data×data blowup and never acceptable — sweep every entry so a
    // future query can't regress silently
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  test("q81/q82 budget select: range exchange, windows bounded by the boundary cell") {
    for (name <- Seq("q81_budget_select", "q82_group_budget")) {
      val p = plan(name)
      assert(p.contains("rangepartitioning"),
        s"$name: ranking must range-partition so partitions come out in global order")
      // every window must be keyed by the partition id — an unpartitioned
      // running sum would collapse the corpus into ONE task
      val specs = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
      assert(specs.nonEmpty, s"$name: expected a boundary-cell window in:\n$p")
      assert(specs.forall(_.startsWith("_bs_pid")),
        s"$name: window not bounded by partition id: $specs")
    }
    // the per-group classification table must broadcast, never shuffle the corpus
    assert(plan("q82_group_budget").contains("BroadcastHashJoin"),
      "q82: cell classification must broadcast-join")
  }

  test("q75 zorder top-k ends in TakeOrdered with the morton key codegen'd in the scan stage") {
    val p = plan("q75_zorder")
    assert(p.contains("TakeOrderedAndProject"),
      s"ordered limit must TakeOrdered, never a global sort\n$p")
    assert(p.contains("interleave_bits"), s"native expression should appear\n$p")
    assert(!p.contains("Exchange"), s"no shuffle at all for a top-k scan\n$p")
  }

  test("q49 decontamination broadcasts the benchmark gram set") {
    val p = plan("q49_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"contamination probe should be a broadcast semi join\n$p")
  }

  test("q93 boilerplate: frequent-chunk set broadcasts onto the chunk stream") {
    val p = plan("q93_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"the boilerplate verdict must be a broadcast join, not a corpus shuffle\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q94 fuzzy pairs: blocked self-join is an equi-join on the block key") {
    val p = plan("q94_fuzzy_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the self-join keyed — quadratic only within blocks\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi-join on _blk\n$p")
  }

  test("q95 temperature mix: windows run on the group table, after the corpus collapses") {
    val df = SparkEntry.queries("q95_temperature_mix")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the corpus-side work is ONE partial/final count; both windows sit
    // above the aggregated group table (5 rows), not the corpus scan
    assert(p.contains("HashAggregate"), p)
    val windowIdx = p.indexOf("Window")
    val scanIdx = p.lastIndexOf("Scan parquet")
    assert(windowIdx >= 0 && scanIdx > windowIdx,
      s"windows must be upstream consumers of the aggregate, not of the scan\n$p")
  }

  test("q96 incremental dedup: batch fingerprints broadcast onto history, no history shuffle for the verdict") {
    val p = plan("q96_incr_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"both the history probe and the hit-set re-attach must broadcast\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q97 incremental near-dups: band-bucket equi-join across sides, never a cross join") {
    val p = plan("q97_incr_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the bucket equi-join\n$p")
  }

  test("q187 phash pairs: band equi-join on signature slivers, payloads stay in the scan stage") {
    val p = plan("q187_phash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the Hamming-band equi-join\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join\n$p")
    // the 8-byte signature is computed by the native expression in the
    // scan-side projection; the binary payload itself never joins
    assert(p.contains("dhash64"), s"native dhash64 expression in the plan\n$p")
  }

  test("q194 capped frame rung: partial WindowGroupLimit below the bucket exchange, still no cross join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val p = plan("q194_frame_capped")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"capped candidates still come from the (fi, band, value) equi-join\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the bucket cap must compile to a group limit, not a full window\n$p")
    // the q111 discipline: the PARTIAL group limit must sit BELOW the
    // window's exchange, so each map task forwards at most cap rows per
    // (fi, band, value) bucket and a constant-frame flood dies in the
    // map stage instead of assembling in one reduce task. The rule only
    // fires while cap <= spark.sql.window.group.limit.threshold
    // (default 1000) — this assert catches a conf or cap regression.
    val wrapped = SparkEntry.queries("q194_frame_capped")(spark, dir)
      .queryExecution.executedPlan
    // round 14: the banded/capped table is cached inside the pair core
    // (one build serves both self-join sides), so the cap's group limit
    // now lives in the CACHED subtree — the walker descends through
    // InMemoryTableScan into the cached plan, where the same
    // partial-below-exchange property must still hold
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def partialBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      val here = p.collect {
        case e: ShuffleExchangeExec => e.child.collect {
          case w: WindowGroupLimitExec if w.mode.toString == "Partial" => w
        }.nonEmpty
      }.exists(identity)
      here || p.collect { case s: InMemoryTableScanExec => s }
        .exists(s => partialBelow(unwrap(s.relation.cachedPlan)))
    }
    assert(partialBelow(unwrap(wrapped)),
      s"partial WindowGroupLimit must run below the exchange\n$wrapped")
  }

  test("q199 frame-store probe: aligned equi-join across sides, never a cross join, dhash in the scan") {
    val p = plan("q199_frame_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the (frame_idx, band, value) equi-join\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join\n$p")
    assert(p.contains("dhash64"), s"native dhash64 expression in the plan\n$p")
  }

  test("q201 audio rung: wav_pcm extraction + dhash in the scan, aligned equi-join, never a cross join") {
    val p = plan("q201_wav_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"audio candidates must come from the (frame_idx, band, value) equi-join\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join\n$p")
    // both native expressions run in the scan stage: the RIFF walk and
    // the signature — only 8-byte signatures leave it, payloads never
    // shuffle
    assert(p.contains("wav_pcm"), s"native wav_pcm expression in the plan\n$p")
    assert(p.contains("dhash64"), s"native dhash64 expression in the plan\n$p")
  }

  test("q193 integrity audit plans ZERO exchanges (row-local scan-stage verdicts)") {
    val p = plan("q193_payload_integrity")
    assert(!p.contains("Exchange"),
      s"the integrity audit must never shuffle — md5/octet_length are row-local\n$p")
  }

  test("q57 range join plans as a hash equi-join, never a nested loop") {
    val p = plan("q57_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binning must yield an equi-join plan\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join\n$p")
  }

  test("q71 funnel: one user-key shuffle, no window, no self-join") {
    val p = plan("q71_funnel")
    assert(!p.contains("Window"),
      s"the fold replaces per-user windows\n$p")
    // exactly one exchange: the user-key groupBy (AQE may re-wrap it, so
    // count the hashpartitioning exchanges on the data path)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"funnel is ONE shuffle on the user key\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no k-way self-join formulation\n$p")
  }

  test("q72 retention: one user shuffle feeding narrow-key aggregation") {
    val p = plan("q72_retention")
    assert(!p.contains("Join"), s"min+collect_set in one agg — no join back\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"user shuffle + (cohort, offset) shuffle, nothing else\n$p")
  }

  test("q85 chunk dedup: no window over the corpus, partial min(struct) election") {
    val p = plan("q85_chunk_dedup")
    assert(!p.contains("Window"), s"first-wins is a groupBy election, not a window\n$p")
    assert(p.contains("partial_min(struct"),
      s"election must combine map-side before the fingerprint exchange\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q86/q88 corpus-LM scores: narrow-key shuffles only, totals broadcast, no window") {
    for (q <- Seq("q86_dsir", "q88_bigram_lm")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: corpus scores need no window\n$p")
      assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"),
        s"$q: the 1-row totals frame must broadcast\n$p")
      assert(p.contains("partial_count"),
        s"$q: count aggregation must combine map-side\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("q87 two-stage rerank: shortlist broadcasts onto the corpus scan, top-k pushes down") {
    val p = plan("q87_ann_rerank")
    // stage-2 float re-read: corpus scan probe side, shortlist + query
    // vectors broadcast — the corpus itself never exchanges for the join
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"shortlist ids and query vectors both broadcast\n$p")
    // the only hashpartitioning exchanges are the two per-query top-k
    // windows (ADC shortlist + exact rerank)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"corpus must not shuffle in either stage\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank-limit should push below the window exchange\n$p")
  }

  test("q89 hard negatives: queries broadcast with pushed filter, single window shuffle") {
    val p = plan("q89_hard_negatives")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,4)"),
      s"query-side selection must reach the parquet scan\n$p")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross, NOT"),
      s"label-mismatch filter rides the broadcast join\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"only the per-query top-k window may shuffle\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k should push down\n$p")
  }

  test("q67/q69 IVF-PQ: probes broadcast, corpus never cartesians against queries") {
    for (q <- Seq("q67_ivf_pq", "q69_ivf_pq_residual")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: probed-cell join must broadcast the query side\n$p")
      // the only allowed cartesian is corpus × the 8-row centroid table
      // (cell assignment) and queries × centroids — both broadcast; the
      // corpus must never nested-loop against per-query LUT rows
      assert(!p.contains("CartesianProduct"), s"$q: no cartesian product\n$p")
    }
  }

  test("q113 bm25: raw text never crosses an exchange, stats broadcast") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wrapped = SparkEntry.queries("q113_bm25")(spark, dir)
      .queryExecution.executedPlan
    // AQE hides the inner plan from collect() — unwrap it first
    val exec = wrapped match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the scale claim, checked structurally (a string match on the plan
    // was vacuous — round-5 review): every shuffle's input carries only
    // ids, lengths, matched tokens, or aggregates — never the raw text
    // or full token array, which must die in the scan-stage projection
    val exchanges = exec.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, s"expected at least one shuffle\n$exec")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.exists(c => c == "_t" || c == "_w" || c == "text"),
        s"raw text/token column crosses a shuffle: $cols\n$exec")
    }
    val p = exec.toString
    assert(p.contains("BroadcastHashJoin"),
      s"df table and corpus stats must broadcast\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q109 split leakage: digest equi-join, never a nested loop") {
    val p = plan("q109_split_leakage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"leak probe is an equi-join on the chunk digest\n$p")
  }

  test("q111/q114 group caps: window partitioned by the group key, no global window") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    for ((q, key) <- Seq("q111_source_cap" -> "source",
                         "q114_cluster_quota" -> "cell_id")) {
      val p = plan(q)
      // the windowspecdefinition must open with the group key — an empty
      // partition list (global window) would read "windowspecdefinition(md5("
      assert(s"windowspecdefinition\\($key#".r.findFirstIn(p).isDefined,
        s"$q: window must partition by $key\n$p")
      // the PARTIAL group limit must sit BELOW the window's exchange —
      // that is what protects a skewed group at scale (each map task
      // forwards at most cap rows per group; NOT an AQE effect — see the
      // groupCap docstring). The rule only fires while cap ≤
      // spark.sql.window.group.limit.threshold (default 1000): this
      // assert catches a future cap-above-threshold (or conf) regression
      // that would silently funnel whole groups through single tasks.
      val wrapped = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      val exec = wrapped match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val partialBelowExchange = exec.collect {
        case e: ShuffleExchangeExec => e.child.collect {
          case w: WindowGroupLimitExec if w.mode.toString == "Partial" => w
        }.nonEmpty
      }.exists(identity)
      assert(partialBelowExchange,
        s"$q: partial WindowGroupLimit must run below the exchange\n$exec")
    }
  }

  test("q142 vocab coverage: vocab rides a TakeOrdered head + broadcast join; text never shuffles") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val p = plan("q142_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-K vocab must be a TakeOrdered head, not a global sort\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the K-row vocab must broadcast onto the probe\n$p")
    val wrapped = SparkEntry.queries("q142_vocab_coverage")(spark, dir)
      .queryExecution.executedPlan
    val exec = wrapped match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // the q113 discipline: every shuffle carries narrow rows — the raw
    // text (and the exploded token only on the vocabulary-sized count
    // path) must die in the scan-stage projection
    exec.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.exists(c => c == "_t" || c == "text"),
        s"raw text crosses a shuffle: $cols\n$exec")
    }
  }

  test("q143 embed outliers: centroids broadcast, partial WindowGroupLimit below the cell exchange") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val p = plan("q143_embed_outliers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"assignment is corpus x broadcast 8-row centroids\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the literal topN must prune below the window\n$p")
    val wrapped = SparkEntry.queries("q143_embed_outliers")(spark, dir)
      .queryExecution.executedPlan
    val exec = wrapped match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val partialBelowExchange = exec.collect {
      case e: ShuffleExchangeExec => e.child.collect {
        case w: WindowGroupLimitExec if w.mode.toString == "Partial" => w
      }.nonEmpty
    }.exists(identity)
    assert(partialBelowExchange,
      s"partial WindowGroupLimit must run below the exchange — each map task forwards at most topN rows per cell\n$exec")
  }

  test("q115 incremental embed near-dups: bucket equi-join across sides") {
    val p = plan("q115_incr_embed_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates come from the bucket equi-join only\n$p")
    assert(p.contains("partial_min"),
      s"best-match election combines map-side before the id exchange\n$p")
  }

  test("q129 bloom prefilter probes row-local below the history semi-join") {
    val p = plan("q129_incr_dedup_bloom")
    // the sketch probe must be a plan expression (codegen'd, row-local),
    // sitting on the batch side that BUILDS the broadcast probe set
    assert(p.contains("bloom_might_contain"), s"probe expression missing\n$p")
    // history still joins the (now bloom-shrunk) fingerprint set via a
    // broadcast left-semi — never a cartesian, never a history shuffle
    assert(p.contains("LeftSemi"), s"history probe should stay a semi join\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q119 semantic decontamination is ONE anti-join, no aggregate, no nested loop") {
    val p = plan("q119_semantic_decontam")
    assert(p.contains("LeftAnti"), s"survivors come from a left-anti join\n$p")
    assert(!p.contains("HashAggregate") || !p.contains("max_by"),
      s"no best-match aggregate — the anti-join needs only existence\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket equality must be the hash key, cosine the residual\n$p")
  }

  test("q139 intra-doc dedup is shuffle-free: one row-local projection") {
    // the operator's whole scale claim — it composes under any
    // partitioning because it never asks for one
    val p = plan("q139_intradoc_dedup")
    assert(!p.contains("Exchange"),
      s"intra-doc dedup must be a pure map — no exchange of any kind\n$p")
  }

  test("q138 ingest gate: snapshot probe and verdict assembly never nest-loop") {
    val p = plan("q138_ingest_gate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"both rungs are equi-joins (fp / band bucket / id)\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the exact rung's batch-fingerprint probe must broadcast\n$p")
  }

  test("q149/q151/q153 sweep+ledger plans: text dies at the scan, aggregates split partial/final") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    for (q <- Seq("q149_packing_stats", "q151_hist_ledger", "q153_hist_drift")) {
      val wrapped = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      val exec = wrapped match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      // every downstream stage moves counts/buckets/offsets — the text
      // column must be consumed by tokenCount inside the scan stage
      exec.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        val cols = e.child.output.map(_.name)
        assert(!cols.exists(c => c == "text" || c == "_t"),
          s"$q: raw text crosses a shuffle: $cols\n$exec")
      }
      val p = exec.toString
      assert("HashAggregate".r.findAllIn(p).length >= 2,
        s"$q: map-side partial aggregation expected\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("q154 sample ledger: partial WindowGroupLimit below the group exchange") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val wrapped = SparkEntry.queries("q154_sample_ledger")(spark, dir)
      .queryExecution.executedPlan
    val exec = wrapped match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // the groupCap contract, inherited per sketch: a skewed group's
    // bottom-k is partially taken on the map side
    val partialBelowExchange = exec.collect {
      case e: ShuffleExchangeExec => e.child.collect {
        case w: WindowGroupLimitExec if w.mode.toString == "Partial" => w
      }.nonEmpty
    }.exists(identity)
    assert(partialBelowExchange,
      s"partial WindowGroupLimit must run below the exchange\n$exec")
  }

  test("salted join spreads a skewed key and preserves results") {
    import graft.ops.SkewJoin
    val spark2 = spark
    import spark2.implicits._
    // one hot key (0) repeated; dimension of 3 keys
    val big = (0 until 1000).map(i => (if (i % 10 == 0) 0L else (i % 3).toLong, i.toLong)).toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("sk", "name")
    val plain  = big.join(small, col("k") === col("sk")).count()
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", factor = 8, saltOn = Seq("payload"))
    assert(salted.count() == plain)
  }

  test("q160 repetition gate plans ZERO exchanges — one native expression in the scan stage") {
    val p = plan("q160_repetition_gate")
    assert(!p.contains("Exchange"), s"the gate must be shuffle-free:\n$p")
    assert(p.contains("repetition_stats"), "the native expression must carry the features")
  }

  test("q161 normalized dedup: partial aggregation before the single fingerprint exchange") {
    val p = plan("q161_norm_dedup")
    assert(p.contains("partial_"), "map-side combine before the shuffle")
    assert(p.split("Exchange").length - 1 <= 2,
      s"one fingerprint exchange (plus AQE artifacts at most):\n$p")
  }

  test("q171 contamination score broadcasts the benchmark gram set") {
    val p = plan("q171_benchmark_overlap")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"the benchmark side must broadcast:\n$p")
  }

  test("q178 pii census: rule counts fold into the partial aggregate — text never shuffles") {
    val p = plan("q178_pii_census")
    // tree prints parent-first, so the map side sits AFTER the exchange
    // token: the partial aggregate (and with it the whole regexp_count
    // projection) must be below the one group shuffle — only the
    // (group, rule, count) rows cross it, never the text column
    val ex = p.indexOf("Exchange hashpartitioning")
    assert(ex >= 0, s"one hash exchange on the group keys expected:\n$p")
    assert(p.indexOf("partial_sum", ex) > ex,
      s"map-side combine must run below the shuffle:\n$p")
    assert(!p.substring(0, ex).contains("text#"),
      s"the text column must not survive above the shuffle:\n$p")
  }

  test("q179 manifest: content hash folds into the partial aggregate — text never shuffles") {
    val p = plan("q179_release_manifest")
    val ex = p.indexOf("Exchange hashpartitioning")
    assert(ex >= 0, s"one hash exchange on the shard key expected:\n$p")
    // the md5 content hash is CONSUMED by the map-side partial_sum —
    // per-doc hashes never cross the wire, only per-shard running sums
    assert(p.indexOf("partial_sum(cast(conv(substring(md5", ex) > ex,
      s"the per-doc hash must fold into the partial agg below the shuffle:\n$p")
  }

  test("q177 diversity: distinct side shuffles hashes, never gram strings") {
    val p = plan("q177_ngram_diversity")
    assert(p.contains("xxhash64"), "grams hash before the distinct")
    assert(p.contains("partial_"), "partial aggregation on both legs")
  }

  test("q183 sketch: mins/sizes tables broadcast onto the pair list") {
    val p = plan("q183_source_sim_sketch")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the metadata-sized mins and size tables must broadcast:\n$p")
    assert(p.contains("xxhash64"),
      "the exact pair join must ride 8-byte shingle hashes")
  }

}
