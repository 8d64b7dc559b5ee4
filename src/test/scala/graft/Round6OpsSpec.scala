package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, Dedup, Similarity}

/** Round-6 depth operators: chunk-level exact dedup (CCNet shape), DSIR
  * importance weights, bigram-LM cross-entropy, two-stage ANN rerank, and
  * contrastive hard-negative mining. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  // ---- Dedup.chunkDedup ----

  test("chunkDedup keeps corpus-first chunk occurrences only") {
    val docs = Seq(
      (0, "a b c d e f g h i j k"),          // 2 chunks: [a..j], [k]
      (1, "a b c d e f g h i j"),            // dup of doc0 chunk0
      (2, "A B C D E F G H I J"),            // normalized dup of the same
      (3, "k"),                              // dup of doc0 chunk1
      (4, "p q r s t u v w x y p q r s t u v w x y") // within-doc repeat
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", 10)
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_chunks"), col("kept_chunks"))
      .as[(Int, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (0, 2L, 2L), (1, 1L, 0L), (2, 1L, 0L), (3, 1L, 0L), (4, 2L, 1L)))
  }

  test("chunkDedup first-wins rule is positional, not value-dependent") {
    // the SAME chunk appearing at a later index of an earlier doc loses to
    // an earlier index of a later doc? No: order is (doc_id, chunk_idx) —
    // doc 0 chunk 1 beats doc 1 chunk 0.
    val docs = Seq(
      (0, "x x x x x x x x x x z z z z z z z z z z"),
      (1, "z z z z z z z z z z")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", 10)
      .orderBy("doc_id").as[(Int, Long, Long)].collect()
    assert(got.toSeq == Seq((0, 2L, 2L), (1, 1L, 0L)))
  }

  test("chunkDedupRebuild reassembles surviving chunks in positional order") {
    val docs = Seq(
      (0, "a b c d e f g h i j k l"),   // chunks [a..j], [k l]
      (1, "a b c d e f g h i j z"),     // chunk0 dup of doc0 → only "z" survives
      (2, "k l")                        // dup of doc0 chunk1 → nothing survives
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedupRebuild(docs, "doc_id", "text", 10)
      .orderBy("doc_id").as[(Int, String)].collect()
    assert(got.toSeq == Seq(
      (0, "a b c d e f g h i j k l"),
      (1, "z")))
  }

  test("ChunkMd5s is bit-identical to the composable transform/slice/md5 form") {
    // includes the divergence traps between Java and Spark string
    // semantics: leading tab (Spark trim strips ' ' only), trailing
    // newline (Spark split keeps trailing empty tokens), CR/LF runs
    val texts = Seq("", " ", "a", "A  B\tc", "one two three four five six",
      "x " * 9 + "x", "x " * 10 + "x", "İstanbul STRASSE ﬀ",
      "\thello world", "hello world\n", " \t a\r\nb \n ", "a b",
      (1 to 37).map(i => s"w$i").mkString(" "))
    val df = texts.toDF("t")
    for (c <- Seq(1, 3, 10)) {
      val w = split(lower(trim(col("t"))), "\\s+")
      val composable = transform(
        sequence(lit(0), ceil(size(w) / lit(c.toDouble)).cast("int") - 1),
        i => md5(concat_ws(" ", slice(w, i * c + 1, lit(c)))))
      val rows = df.select(
          graft.functions.ShingleExprs.chunkMd5s(col("t"), c).as("fast"),
          composable.as("slow"))
        .as[(Seq[String], Seq[String])].collect()
      rows.zip(texts).foreach { case ((fast, slow), t) =>
        assert(fast == slow, s"c=$c text='$t'")
      }
    }
  }

  test("round-6 operators drop null-text rows instead of failing") {
    val docs = Seq((0, "a b c d", "en"), (1, null, "en"), (2, "a b", null))
      .toDF("doc_id", "text", "lang")
    // null text → no chunks/tokens → absent from results; null lang is a
    // non-target, not an error
    assert(Dedup.chunkDedup(docs, "doc_id", "text", 2)
      .select("doc_id").as[Int].collect().toSet == Set(0, 2))
    assert(Corpus.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .select("doc_id").as[Int].collect().toSet == Set(0, 2))
    assert(Corpus.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id").as[Int].collect().toSet == Set(0, 2))
  }

  // ---- Corpus.dsirWeights ----

  test("dsirWeights matches the hand-computed micro-ratio model") {
    // corpus: aa(cs=2, ct=1) bb(1,1) cc(1,0); Ts=4 Tt=2 V=3
    // q(aa) = 10^6·2·7 // (3·5)  = 933333
    // q(bb) = 10^6·2·7 // (2·5)  = 1400000
    // q(cc) = 10^6·1·7 // (2·5)  = 700000
    val docs = Seq((0, "aa bb", "en"), (1, "aa cc", "fr")).toDF("doc_id", "text", "lang")
    val got = Corpus.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").as[(Int, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (0, 2L, (933333.0 + 1400000.0) / 2),
      (1, 2L, (933333.0 + 700000.0) / 2)))
  }

  test("dsirWeights ranks target-like documents above corpus-average ones") {
    val docs = (0 until 20).map(i =>
      if (i % 2 == 0) (i, "clean prose tokens here", "en")
      else (i, "spam spam noise blob", "xx")).toDF("doc_id", "text", "lang")
    val w = Corpus.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .select(col("doc_id"), col("lr_micro")).as[(Int, Double)].collect().toMap
    assert(w(0) > w(1), s"target doc should outscore non-target: $w")
    assert(w.filterKeys(_ % 2 == 0).values.min > w.filterKeys(_ % 2 == 1).values.max)
  }

  // ---- Similarity.pqRerankTopK ----

  test("pqRerankTopK with a corpus-wide shortlist equals exact brute-force top-k") {
    // graceful-exactness: if stage 1 keeps everything, stage 2 IS the
    // exact ranking — same identity discipline as IVF probe-all
    val n = 40
    val dim = 8
    val emb = (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => math.sin(i * 31 + j * 7).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val book = Similarity.pqBookConst(dim, 2, 4)
    val got = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        book, shortlist = n, topK = 5)
      .select(col("vec_id"), col("cos_sim")).as[(Long, Double)].collect().toSeq
    val exact = Similarity.topK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "embedding", 5)
      .as[(Long, Double)].collect().toSeq
    assert(got.sortBy(_._1) == exact.sortBy(_._1))
  }

  // ---- Corpus.bigramLmScore ----

  test("bigramLmScore matches the hand-computed add-one conditional model") {
    // docs d0="a b b", d1="a b"
    // bigrams: "a b":2, "b b":1 ; leading counts c(a·)=2, c(b·)=1 ; V=|{a,b}|=2
    // q("a b") = 10^6·3 // (2+2) = 750000 ; q("b b") = 10^6·2 // (1+2) = 666666
    // d0: ("a b","b b") → mean (750000+666666)/2 ; d1: ("a b") → 750000
    val docs = Seq((0, "a b b"), (1, "a b")).toDF("doc_id", "text")
    val got = Corpus.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Int, Long, Double)].collect()
    assert(got.toSeq == Seq((0, 2L, 708333.0), (1, 1L, 750000.0)))
  }

  test("bigramLmScore scores fluent (common-transition) docs above shredded ones") {
    val common = (0 until 10).map(i => (i, "the quick brown fox jumps"))
    val rare = Seq((10, "fox the jumps quick brown"))
    val got = Corpus.bigramLmScore((common ++ rare).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id"), col("p_micro")).as[(Int, Double)].collect().toMap
    assert(got(0) > got(10), s"common transitions should outscore shuffled: $got")
  }

  // ---- Similarity.hardNegatives ----

  test("hardNegatives never returns the query's own label and ranks by cosine") {
    val n = 30
    val dim = 6
    val emb = (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => math.sin(i + j * 11).toFloat).toArray, i % 3)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", "label", topK = 4)
      .select(col("vec_id"), col("neg_label"), col("cos_sim"))
      .as[(Long, Int, Double)].collect()
    assert(got.length == 4)
    assert(got.forall(_._2 != 0), s"label 0 is the query's own: ${got.toSeq}")
    // cross-check against brute force over the eligible rows
    val exact = Similarity.topK(emb.filter(col("label") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "embedding", 4)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got.map(_._1).toSeq.sorted == exact.sorted)
  }

  // ---- Corpus.datasetCard ----

  test("datasetCard rolls up volumes, language spread, and exact-dup rate per source") {
    val docs = Seq(
      (0, "a b c", "en", "s1"), (1, "a b c", "en", "s1"), (2, "d e", "fr", "s1"),
      (3, "x", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = Corpus.datasetCard(docs, "source", "text", "lang")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("s1", 3L, 8L, 13L, 2L, 2L, 1.0 / 3),
      ("s2", 1L, 1L, 1L, 1L, 1L, 0.0)))
  }

  // ---- Pipeline.curateCorpus ----

  test("curateCorpus gates, dedups, weights, and budget-selects end to end") {
    import graft.ops.Pipeline
    // crafted so every stage does work:
    //  doc 0: long, en, unique            → selected first (target-like)
    //  doc 1: too short                   → gated out
    //  doc 2: long, xx, chunk0 dups doc 0 → cleaned shorter, weighted low
    //  doc 3: long, xx, unique            → competes for the budget tail
    val u = (w: String, n: Int) => Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      (0L, u("alpha", 30) + " " + u("beta", 30), "en"),
      (1L, "tiny", "en"),
      (2L, u("alpha", 30) + " " + u("gamma", 30), "xx"),
      (3L, u("delta", 60), "xx")
    ).toDF("doc_id", "text", "lang")
    val got = Pipeline.curateCorpus(docs, "doc_id", "text", "lang",
        minChars = 100, chunkTokens = 10, budgetNum = 1, budgetDen = 2)
      .select(col("doc_id")).as[Long].collect().toSet
    // the election is corpus-wide AND within-doc: repeated 10-token
    // chunks of the same word collapse to their first occurrence, so the
    // cleaned docs are doc0 = "alpha…"+"beta…" (20 tokens), doc2 =
    // "gamma…" (10; its alpha chunks lose to doc0's), doc3 = "delta…"
    // (10) → total 40, budget 20 → the highest-weight doc0 fills the
    // budget exactly; doc2/doc3 would overflow
    assert(got == Set(0L), s"got $got")
  }

  test("curateCorpus returns empty (not NPE) when the gate drops everything") {
    import graft.ops.Pipeline
    val docs = Seq((0L, "tiny", "en"), (1L, "also tiny", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = Pipeline.curateCorpus(docs, "doc_id", "text", "lang",
      minChars = 100).collect()
    assert(got.isEmpty)
  }

  // ---- EventStream.decontaminateStream ----

  test("stream-static decontamination drops seen fingerprints, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    implicit val sq = spark.sqlContext
    val history = Seq((100L, "the benchmark question"), (101L, "old crawl page"))
      .toDF("doc_id", "text")
    val seen = EventStream.seenFingerprints(history, "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), "text", seen)
      .writeStream.outputMode("append").format("memory").queryName("decon").start()
    // normalization: case, edge-whitespace, AND internal-whitespace
    // variants of history must all drop (fingerprint collapses runs —
    // the same identity the batch dedup half uses)
    mem.addData((1L, "fresh document"), (2L, "The Benchmark Question  "),
      (3L, "old  crawl\npage"))
    q.processAllAvailable()
    mem.addData((4L, "another fresh one"))
    q.processAllAvailable()
    val kept = spark.table("decon").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"got $kept")
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
      "gate must hold no state")
    q.stop()
  }

  test("decontaminateStream applied to a batch frame gives the same survivors") {
    import graft.streaming.EventStream
    val history = Seq((9L, "seen before")).toDF("doc_id", "text")
    val seen = EventStream.seenFingerprints(history, "text")
    val batch = Seq((1L, "fresh"), (2L, "Seen  Before"), (3L, "also fresh"))
      .toDF("doc_id", "text")
    // stateless column ops + anti-join: the same function runs on batch
    // frames unchanged — the identity the qualityGate doc promises holds
    // for the decontamination gate too
    val got = EventStream.decontaminateStream(batch, "text", seen)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("pqRerankTopK output ordering is exact-cosine, not ADC order") {
    val n = 40
    val dim = 8
    val emb = (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => math.cos(i * 13 + j * 3).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val book = Similarity.pqBookConst(dim, 2, 4)
    val rows = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 1), "vec_id", "embedding",
        book, shortlist = 20, topK = 10)
      .orderBy(col("cos_sim").desc)
      .select(col("cos_sim")).as[Double].collect()
    assert(rows.length == 10)
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }
}
