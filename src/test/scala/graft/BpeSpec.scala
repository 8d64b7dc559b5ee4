package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CacheScope, Corpus}

/** Distributed BPE tokenizer training: the learned merge sequence must
  * equal a naive in-memory reference (same counting, same tie-break),
  * stay identical under repartitioning, and the encoder must reproduce
  * the training-time segmentation. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  /** Naive reference: word-frequency map → merge rules. Overlapping
    * adjacent pairs counted; ties break (count desc, left asc, right
    * asc); merges applied greedy leftmost. */
  private def naiveTrain(words: Map[String, Long], numMerges: Int,
                         minCount: Long): Seq[(String, String, Long)] = {
    var ws = words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (continue && out.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, f) <- ws; p <- sym.zip(sym.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b, c))
          ws = ws.map { case (sym, f) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < sym.size) {
              if (i + 1 < sym.size && sym(i) == a && sym(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += sym(i); i += 1 }
            }
            (nb.result(), f)
          }
        case _ => continue = false
      }
    }
    out.toSeq
  }

  private def wordFreqs(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  test("bpeTrain matches the naive reference on seeded random corpora") {
    val vocabChars = "abcd"
    for (seed <- 1 to 2) {
      val rng = new scala.util.Random(500 + seed)
      val docs = (0 until 50).map(_ =>
        (0 until (1 + rng.nextInt(8))).map(_ =>
          (0 until (1 + rng.nextInt(6))).map(_ =>
            vocabChars(rng.nextInt(4))).mkString).mkString(" "))
      val want = naiveTrain(wordFreqs(docs), numMerges = 8, minCount = 2L)
      CacheScope.withScope { scope =>
        val got = Corpus.bpeTrain(docs.toDF("text"), "text", 8, 2L, scope)
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("bpeTrainLocal equals bpeTrain and the naive reference on seeded random corpora") {
    val vocabChars = "abcd"
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(900 + seed)
      val docs = (0 until 50).map(_ =>
        (0 until (1 + rng.nextInt(8))).map(_ =>
          (0 until (1 + rng.nextInt(6))).map(_ =>
            vocabChars(rng.nextInt(4))).mkString).mkString(" "))
      val want = naiveTrain(wordFreqs(docs), numMerges = 10, minCount = 2L)
      val local = Corpus.bpeTrainLocal(docs.toDF("text"), "text", 10, 2L)
      assert(local == want, s"seed=$seed vs naive")
      CacheScope.withScope { scope =>
        val dist = Corpus.bpeTrain(docs.toDF("text"), "text", 10, 2L, scope)
        assert(local == dist, s"seed=$seed vs distributed")
      }
    }
    // non-BMP text (surrogate pairs): the local trainer must split per
    // CODE POINT like the distributed `split(col, "")` — a per-code-unit
    // split would elect lone-surrogate symbols and diverge (round-8 fix)
    locally {
      val emojiDocs = Seq("😀a 😀a 😀b 😀b 😀b",
        "x😁 x😁 x😁 😀a")
      val local = Corpus.bpeTrainLocal(emojiDocs.toDF("text"), "text", 4, 2L)
      CacheScope.withScope { scope =>
        val dist = Corpus.bpeTrain(emojiDocs.toDF("text"), "text", 4, 2L, scope)
        assert(local == dist, "non-BMP local/distributed divergence")
      }
      // every elected symbol is well-formed UTF-16 — no lone surrogates
      def wellFormed(s: String): Boolean = {
        var i = 0
        while (i < s.length) {
          if (Character.isHighSurrogate(s.charAt(i))) {
            if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
            i += 2
          } else if (Character.isLowSurrogate(s.charAt(i))) return false
          else i += 1
        }
        true
      }
      for ((a, b, _) <- local; s <- Seq(a, b))
        assert(wellFormed(s), s"lone surrogate in symbol '$s'")
      assert(local.exists { case (a, _, _) => a.startsWith("😀") || a.startsWith("x") },
        "expected a merge involving the emoji or its neighbor")
    }
    // early stop and the word-table guard
    assert(Corpus.bpeTrainLocal(Seq("ab ab ab cd").toDF("text"), "text", 10, 2L)
      == Seq(("a", "b", 3L)))
    val e = intercept[IllegalArgumentException] {
      Corpus.bpeTrainLocal(Seq("a b c d e f g h").toDF("text"), "text", 5,
        minPairCount = 1L, maxDistinctWords = 3)
    }
    assert(e.getMessage.contains("maxDistinctWords"))
  }

  test("bpeTrain is invariant under repartitioning (deterministic tie-break)") {
    val docs = Seq("aa ab aa ab ba", "ab aa ba ba bb", "aa bb ab aa")
    CacheScope.withScope { scope =>
      val one = Corpus.bpeTrain(docs.toDF("text").repartition(1), "text", 5, 1L, scope)
      val many = Corpus.bpeTrain(docs.toDF("text").repartition(7), "text", 5, 1L, scope)
      assert(one == many)
      assert(one == naiveTrain(wordFreqs(docs), 5, 1L))
    }
  }

  test("bpeTrain stops early when the best pair drops under minPairCount") {
    val docs = Seq("ab ab ab cd")
    CacheScope.withScope { scope =>
      val got = Corpus.bpeTrain(docs.toDF("text"), "text", 10, 2L, scope)
      // (a,b) appears 3 times; every other pair once — exactly one merge
      assert(got == Seq(("a", "b", 3L)))
    }
  }

  test("batched BPE (batchMerges > 1) learns the sequential vocabulary") {
    // pin: the non-interacting-pair batching must reproduce the
    // sequential rules AND counts on the spec corpora (disjointness makes
    // each accepted pair's count exactly the sequential recount)
    val vocabChars = "abcd"
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(700 + seed)
      val docs = (0 until 60).map(_ =>
        (0 until (1 + rng.nextInt(8))).map(_ =>
          (0 until (1 + rng.nextInt(6))).map(_ =>
            vocabChars(rng.nextInt(4))).mkString).mkString(" "))
      CacheScope.withScope { scope =>
        val seqRules = Corpus.bpeTrain(docs.toDF("text"), "text", 12, 2L, scope)
        val batched = Corpus.bpeTrain(docs.toDF("text"), "text", 12, 2L, scope,
          batchMerges = 4)
        assert(batched == seqRules, s"seed=$seed")
        assert(seqRules == naiveTrain(wordFreqs(docs), 12, 2L), s"seed=$seed naive")
      }
    }
  }

  test("batched BPE reaches the ruleset in >= 5x fewer Spark rounds") {
    // letter-disjoint top pairs (the friendly case for prefix batching):
    // 13 bigram words over distinct letters, strictly descending
    // frequencies — every batch prefix fills completely
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val docs = (0 until 13).map { k =>
      val w = s"${letters(2 * k)}${letters(2 * k + 1)}"
      Seq.fill(100 - 2 * k)(w).mkString(" ")
    }
    CacheScope.withScope { scope =>
      val (seqRules, seqRounds) =
        Corpus.bpeTrainWithRounds(docs.toDF("text"), "text", 12, 2L, scope, 1)
      val (batRules, batRounds) =
        Corpus.bpeTrainWithRounds(docs.toDF("text"), "text", 12, 2L, scope, 8)
      assert(batRules == seqRules)
      assert(seqRules.size == 12 && seqRounds == 12, "sequential = one round per merge")
      assert(batRounds * 5 <= seqRounds,
        s"batching must amortize rounds: $batRounds vs $seqRounds")
    }
  }

  test("bpeEncode reproduces the training-time segmentation on the training corpus") {
    val docs = Seq("abab baba abba", "baab abab abab", "bbbb aaaa abab")
    CacheScope.withScope { scope =>
      val merges = Corpus.bpeTrain(docs.toDF("text"), "text", 6, 1L, scope)
      // replay training folds in rank order over the word-frequency table
      var ws = wordFreqs(docs).keys.map(w => w -> w.map(_.toString).toVector).toMap
      for ((a, b, _) <- merges) ws = ws.map { case (w, sym) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < sym.size) {
          if (i + 1 < sym.size && sym(i) == a && sym(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += sym(i); i += 1 }
        }
        w -> nb.result()
      }
      val ranks = merges.map { case (a, b, _) => (a, b) }
      val got = Corpus.bpeEncode(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
          "doc_id", "text", ranks)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        val want = t.split(" ").toSeq.flatMap(ws(_))
        assert(got(i.toLong) == want, s"doc $i")
      }
      // unseen symbols pass through as single characters
      val unk = Corpus.bpeEncode(Seq((9L, "xyz ab")).toDF("doc_id", "text"),
        "doc_id", "text", ranks).collect().head.getSeq[String](1)
      assert(unk.take(3) == Seq("x", "y", "z"))
    }
  }
}
