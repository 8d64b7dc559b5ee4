package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Corpus-audit operators: split-leakage, cross-group duplication matrix,
  * per-group caps, JL random projection, and the ANN recall harness. */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  // ---- Dedup.splitLeakage ----

  test("splitLeakage counts eval chunks that appear anywhere in train") {
    val docs = Seq(
      (0, "train", "a b c d e f g h i j"),        // train chunk A
      (1, "train", "k l m n o p q r s t"),        // train chunk B
      (2, "val",   "a b c d e f g h i j z"),      // chunk A leaked + "z" clean
      (3, "test",  "k l m n o p q r s t a b c d e f g h i j"), // both leaked
      (4, "val",   "w x y")                       // clean
    ).toDF("doc_id", "split", "text")
    val got = Dedup.splitLeakage(docs, "doc_id", "text", "split", "train", 10)
      .orderBy("doc_id")
      .select(col("doc_id"), col("split"), col("n_chunks"), col("n_leaked"))
      .as[(Int, String, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (2, "val", 2L, 1L), (3, "test", 2L, 2L), (4, "val", 1L, 0L)))
  }

  test("splitLeakage matches train chunks case/whitespace-insensitively") {
    // ChunkMd5s normalizes lower(trim(text)) — a cased eval copy of a
    // train chunk still counts as leaked
    val docs = Seq(
      (0, "train", "a b c"),
      (1, "val", "A B C")
    ).toDF("doc_id", "split", "text")
    val got = Dedup.splitLeakage(docs, "doc_id", "text", "split", "train", 10)
      .select(col("n_leaked")).as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  // ---- Dedup.crossGroupMatrix ----

  test("crossGroupMatrix rolls pairs to unordered group pairs") {
    val pairs = Seq(
      (0L, 1L, 0.9), // web x books
      (1L, 2L, 0.5), // books x web → same unordered pair as above
      (0L, 3L, 0.7), // web x web
      (2L, 4L, 0.2)  // web x wiki
    ).toDF("id_a", "id_b", "jaccard")
    val labels = Seq(
      (0L, "web"), (1L, "books"), (2L, "web"), (3L, "web"), (4L, "wiki")
    ).toDF("doc_id", "source")
    val got = Dedup.crossGroupMatrix(pairs, labels, "doc_id", "source")
      .orderBy("group_a", "group_b")
      .as[(String, String, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("books", "web", 2L, 0.9),
      ("web", "web", 1L, 0.7),
      ("web", "wiki", 1L, 0.2)))
  }

  // ---- TextAnalysis.groupCap ----

  test("groupCap keeps at most cap rows per group with dense 1-based ranks") {
    val df = (0 until 40).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "grp")
    val got = TextAnalysis.groupCap(df, "grp", "id", 5)
    // groups have 14/13/13 members, all capped to 5 with ranks exactly 1..5
    val counts = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(5L))
    val ranks = got.select(col("grp"), col("cap_rank")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(ranks.values.toSet == Set(Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("groupCap priority is independent of the hashSplit assignment") {
    // REGRESSION (sf0.1 audit report came back empty): an unsalted cap
    // priority md5(key) is the same function hashSplit thresholds, so a
    // binding cap keeps exactly the below-train-boundary keys — every
    // survivor lands in train. With the salted priority, a binding cap
    // must keep docs from BOTH sides of the split boundary.
    val df = (0 until 400).map(i => (i.toLong, "g")).toDF("id", "grp")
    val splits = TextAnalysis.groupCap(df, "grp", "id", 100)
      .withColumn("split",
        TextAnalysis.hashSplit(col("id"), Seq("train" -> 0.8, "val" -> 0.2)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "val"),
      s"capped survivors must span the split boundary, got $splits")
  }

  test("every sampler's keyspace is independent of the hashSplit assignment") {
    // the q117 lesson generalized (round-5 review): stratified/weighted/
    // temperature samplers threshold or rank a SALTED md5, so composing
    // any of them with hashSplit must span the split boundary. At
    // fraction 0.5 an UNSALTED threshold selects only below-train-
    // boundary keys (train share 0.8) — all three would come back
    // train-only.
    import graft.ops.Corpus
    val df = (0 until 400).map(i => (i.toLong, "g")).toDF("id", "grp")
    def splitsOf(sampled: org.apache.spark.sql.DataFrame): Set[String] =
      sampled.withColumn("split",
          TextAnalysis.hashSplit(col("id"), Seq("train" -> 0.8, "val" -> 0.2)))
        .select("split").distinct().as[String].collect().toSet
    assert(splitsOf(df.filter(TextAnalysis.stratifiedSampleFilter(
      col("id"), col("grp"), Map("g" -> 0.5), 0.5))) == Set("train", "val"))
    assert(splitsOf(df.filter(TextAnalysis.weightedSampleFilter(
      col("id"), lit(0.5)))) == Set("train", "val"))
    assert(splitsOf(Corpus.temperatureSample(df, "id", "grp", 1.0, 200L)
      .select(col("id"))) == Set("train", "val"))
  }

  test("groupCap survivor set is content-stable under repartitioning") {
    val df = (0 until 60).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "grp")
    val a = TextAnalysis.groupCap(df, "grp", "id", 7)
      .select("grp", "id", "cap_rank").as[(String, Long, Long)].collect().toSet
    val b = TextAnalysis.groupCap(df.repartition(13), "grp", "id", 7)
      .select("grp", "id", "cap_rank").as[(String, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.size == 28)
  }

  // ---- Similarity.randomProject ----

  test("randomProject components are the plane dot products") {
    val vec = (0 until 16).map(j => (j + 1).toDouble)
    val df = Seq(Tuple1(vec)).toDF("v")
    val got = df.select(Similarity.randomProject(col("v"), 16, 4, "spec-rp").as("p"))
      .as[Seq[Double]].head()
    // replay the fold in plain Scala — same left-to-right order
    val want = (0 until 4).map { p =>
      vec.indices.foldLeft(0.0)((acc, j) =>
        acc + vec(j) * Similarity.planeComponent(p, j, "spec-rp")) + 0.0
    }
    assert(got == want)
  }

  test("randomProject approximately preserves relative distances (JL sanity)") {
    // three vectors: two nearly parallel, one orthogonal-ish — after
    // projection to 8 dims the near pair must stay closer than the far pair
    val base = (0 until 64).map(j => math.sin(j + 1.0))
    val near = base.map(_ * 1.01)
    val far = (0 until 64).map(j => math.cos(3.0 * (j + 1.0)))
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("id", "v")
    val proj = df.select(col("id"), Similarity.randomProject(col("v"), 64, 8).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(proj(0L), proj(1L)) < d2(proj(0L), proj(2L)))
  }

  // ---- Corpus.bm25Score ----

  test("bm25Score replays the Okapi formula exactly on a hand corpus") {
    import graft.ops.Corpus
    val docs = Seq(
      (0L, "cat dog cat"),     // tf(cat)=2, dl=3
      (1L, "cat fish"),        // tf(cat)=1, dl=2
      (2L, "fish fish fish")   // no match
    ).toDF("doc_id", "text")
    val got = Corpus.bm25Score(docs, "doc_id", "text", Seq("cat"), k1 = 1.2, b = 0.75)
      .select(col("doc_id"), col("n_matched"), col("bm25"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // N=3, df(cat)=2, avgdl=8/3
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Long, dl: Long) =
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (8.0 / 3.0)))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(0L, 1L))           // doc 2 absent: no match
    assert(got.map(_._2).toSeq == Seq(1L, 1L))
    assert(got.map(_._3).toSeq == Seq(r4(s(2, 3)), r4(s(1, 2))))
  }

  test("bm25Score saturates term frequency sub-linearly") {
    import graft.ops.Corpus
    val docs = Seq(
      (0L, "x a b c"), (1L, "x x a b"), (2L, "x x x a"), (3L, "y y y y")
    ).toDF("doc_id", "text")
    val sc = Corpus.bm25Score(docs, "doc_id", "text", Seq("x"))
      .select(col("doc_id"), col("bm25")).as[(Long, Double)].collect().toMap
    assert(sc(0L) < sc(1L) && sc(1L) < sc(2L))   // monotone in tf
    assert(sc(2L) < 3 * sc(0L))                  // but sub-linear (saturation)
  }

  test("bm25Score sums multi-term scores in query-term order") {
    import graft.ops.Corpus
    val docs = Seq((0L, "p q"), (1L, "p"), (2L, "q")).toDF("doc_id", "text")
    val both = Corpus.bm25Score(docs, "doc_id", "text", Seq("p", "q"))
      .select(col("doc_id"), col("n_matched")).as[(Long, Long)].collect().toMap
    assert(both == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  // ---- Similarity.ivfAssign ----

  test("ivfAssign maps each vector to its nearest centroid, ties to lowest cell") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("_cid", "_cv")
    val vecs = Seq(
      (10L, Seq(0.9, 0.1)),   // cell 0
      (11L, Seq(0.1, 0.9)),   // cell 1
      (12L, Seq(1.0, 1.0))    // exact tie → lowest cid = 0
    ).toDF("vec_id", "v")
    val got = Similarity.ivfAssign(cents, vecs, "vec_id", "v")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("ivfAssign + groupCap bounds every cell at the quota") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.select(col("vec_id").as("_cid"),
        col("embedding").cast("array<double>").as("_cv"))
      .orderBy(col("_cid")).limit(4)
    val cells = Similarity.ivfAssign(cents, emb, "vec_id", "embedding")
    val total = cells.count()
    val capped = TextAnalysis.groupCap(cells, "cell_id", "vec_id", 5)
    val perCell = capped.groupBy("cell_id").count().as[(Long, Long)].collect()
    assert(perCell.forall(_._2 <= 5))
    assert(capped.count() <= total)
  }

  // ---- Similarity.incrementalEmbedNearDups ----

  test("incrementalEmbedNearDups finds the best historical match, ties to lowest id") {
    // history 0 and 2 are IDENTICAL — a tie at sim 1.0 → hist_id 0 wins;
    // new 11 has no same-bucket history neighbor above minSim → no row
    val base = Seq(1.0, 0.5, 0.25, 0.125)
    val anti = Seq(-1.0, 0.5, -0.25, 0.125)
    val hist = Seq((0L, base), (2L, base), (4L, anti)).toDF("vec_id", "v")
    val novel = Seq((1L, base.map(_ * 2.0)), (11L, anti.map(-_))).toDF("vec_id", "v")
    val got = Similarity.incrementalEmbedNearDups(novel, hist, "vec_id", "v",
        dim = 4, nPlanes = 1, minSim = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    // vec 1 is a scaled copy of base → cosine 1.0 with both 0 and 2
    assert(got == Seq((1L, 0L, 1.0)))
  }

  test("incrementalEmbedNearDups runs per microbatch via the foreachBatch sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    implicit val sq = spark.sqlContext
    val base = Seq(1.0, 0.5, 0.25, 0.125)
    val hist = Seq((100L, base)).toDF("vec_id", "v")
    val out = java.nio.file.Files.createTempDirectory("embdup_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("embdup_ckpt").toString
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = EventStream.sinkBatches(mem.toDF().toDF("vec_id", "v"), out, ckpt) {
      batch => Similarity.incrementalEmbedNearDups(batch, hist, "vec_id", "v",
        dim = 4, nPlanes = 1, minSim = 0.9)
    }
    mem.addData((1L, base.map(_ * 3.0)), (2L, base.map(x => -x)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 100L, 1.0)))   // the anti-parallel vector is clean
  }

  // ---- Similarity.lshTopKMultiProbe ----

  test("multi-probe LSH recall dominates single-probe for every query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    val exact = Similarity.exactTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 5)
    def recall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.recallAtK(approx, exact, "query_id", "vec_id", 5)
        .select(col("query_id"), col("recall")).as[(Long, Double)].collect().toMap
    val single = recall(Similarity.lshTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", dim = 64, nPlanes = 6, k = 5))
    val multi = recall(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", dim = 64, nPlanes = 6, k = 5))
    // the multi-probe candidate set is a superset (Hamming 0 ⊂ Hamming ≤ 1),
    // so per-query recall can only improve
    single.keys.foreach { q =>
      assert(multi.getOrElse(q, 0.0) >= single(q),
        s"query $q: multi ${multi.get(q)} < single ${single(q)}")
    }
  }

  test("multi-probe candidates are exactly the Hamming<=1 buckets") {
    // 2 planes, vectors placed so buckets differ in known bit counts
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val qs = emb.filter(col("vec_id") < 2)
    val multi = Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
        qs, "vec_id", "embedding", dim = 64, nPlanes = 2, k = 1000)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    // replay: bucket every vector, keep pairs with bit_count(xor) <= 1
    val b = emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding").cast("array<double>"), 64, 2).as("b"))
      .as[(Long, Long)].collect().toMap
    val want = (for {
      q <- b.keys.filter(_ < 2); c <- b.keys if c != q
      if java.lang.Long.bitCount(b(q) ^ b(c)) <= 1
    } yield (q, c)).toSet
    assert(multi == want)
  }

  // ---- Stats.ksDistance ----

  test("ksDistance replays the exact integer KS on a hand sample") {
    import graft.ops.Stats
    // A = {1,2,2,3}, B = {2,3,3,4}; at v=1: |1·4−0·4|=4; v=2: |3·4−1·4|=8;
    // v=3: |4·4−3·4|=4; v=4: 0 → D = 8/16 = 0.5
    val df = (Seq(1, 2, 2, 3).map((_, true)) ++ Seq(2, 3, 3, 4).map((_, false)))
      .toDF("v", "a")
    val got = Stats.ksDistance(df, "v", col("a"))
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((4L, 4L, 8L, 0.5)))
  }

  test("ksDistance is 0 for identical distributions and ignores nulls") {
    import graft.ops.Stats
    val df = Seq((Some(1), true), (Some(2), true), (Some(1), false),
        (Some(2), false), (None, true))
      .toDF("v", "a")
    val got = Stats.ksDistance(df, "v", col("a"))
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((2L, 2L, 0L, 0.0)))
  }

  test("ksDistance returns zero rows on empty or one-sided input") {
    import graft.ops.Stats
    // a SQL GROUP-BY oracle yields no groups on these inputs; the operator
    // must agree (zero rows), not emit an all-null or NaN row
    val empty = Seq.empty[(Option[Int], Boolean)].toDF("v", "a")
    assert(Stats.ksDistance(empty, "v", col("a")).count() == 0)
    val oneSided = Seq((1, true), (2, true)).toDF("v", "a")
    assert(Stats.ksDistance(oneSided, "v", col("a")).count() == 0)
    val allNull = Seq((Option.empty[Int], true), (None, false)).toDF("v", "a")
    assert(Stats.ksDistance(allNull, "v", col("a")).count() == 0)
  }

  test("ksDistance prefix-sum CDF matches a driver replay on a wide domain") {
    import graft.ops.Stats
    // domain (997 distinct values) ≫ shuffle partitions: the CDF runs as
    // per-range-partition windows whose offsets must compose exactly
    val df = spark.range(5000).select(
      (col("id") % 997).as("v"), (col("id") % 3 === 0).as("a"))
    val res = Stats.ksDistance(df, "v", col("a"))
    // the window must be keyed by the partition id, not global
    assert(res.queryExecution.optimizedPlan.toString.contains("_pid"))
    val got = res.as[(Long, Long, Long, Double)].head()
    val rows = df.as[(Long, Boolean)].collect()
    val na = rows.count(_._2).toLong
    val nb = rows.size - na
    var (ca, cb, best) = (0L, 0L, 0L)
    for (v <- rows.map(_._1).distinct.sorted) {
      ca += rows.count(r => r._1 == v && r._2)
      cb += rows.count(r => r._1 == v && !r._2)
      best = math.max(best, math.abs(ca * nb - cb * na))
    }
    assert(got == ((na, nb, best, best.toDouble / (na * nb).toDouble)))
  }

  // ---- TextAnalysis.sequenceAssemble boundaries ----

  test("sequence boundaries mark every fragment start, continuations at 0") {
    // docs of 3/4/5 tokens packed at seqLen 4: token stream positions
    // doc0=[0,3) doc1=[3,7) doc2=[7,12) → seq0 frags at 0,3; seq1 frags
    // at 0 (doc1 continuation), 3; seq2 frag at 0 (doc2 continuation)
    val docs = Seq((0L, "a b c"), (1L, "d e f g"), (2L, "h i j k l"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sequenceAssemble(docs, "doc_id", "text", seqLen = 4)
      .select(col("seq_id"), col("boundaries"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "0-3", 1L -> "0-3", 2L -> "0"))
  }

  // ---- Corpus.termDrift ----

  test("termDrift surfaces the terms a slice amplifies and suppresses") {
    import graft.ops.Corpus
    // "hot" appears only in the target slice, "cold" only outside it
    val docs = Seq(
      (0L, "hot hot shared", "en"), (1L, "hot shared", "en"),
      (2L, "cold shared", "de"), (3L, "cold cold shared", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.termDrift(docs, "text", col("lang") === "en", topK = 1)
      .select(col("direction"), col("term")).as[(String, String)].collect().toMap
    assert(got == Map("over" -> "hot", "under" -> "cold"))
  }

  test("termDrift ratios replay the smoothed micro-ratio exactly") {
    import graft.ops.Corpus
    val docs = Seq((0L, "a a b", "en"), (1L, "b c", "de")).toDF("doc_id", "text", "lang")
    val got = Corpus.termDrift(docs, "text", col("lang") === "en", topK = 3)
      .filter(col("direction") === "over")
      .select(col("term"), col("n_total"), col("n_target"), col("lr_micro"))
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // counts: a cs=2 ct=2; b cs=2 ct=1; c cs=1 ct=0; ts=5 tt=3 v=3;
    // decimal intermediates, one IEEE division — exact doubles here
    def q(cs: Long, ct: Long) =
      (1000000d * (ct + 1) * (5 + 3)) / ((cs + 1) * (3 + 3)).toDouble
    assert(got("a") == ("a", 2L, 2L, q(2, 2)))
    assert(got("b") == ("b", 2L, 1L, q(2, 1)))
    assert(got("c") == ("c", 1L, 0L, q(1, 0)))
  }

  test("termDrift survives counts past the int64 micro-ratio overflow bound") {
    import graft.ops.Corpus
    // (ct+1)·(ts+v) ≈ 4e12 · 1e6-multiplier would overflow int64
    // (~9.2e18); the decimal(38,0) path must not throw under ANSI and
    // must keep the exact ratio. Simulated by pre-aggregated counts fed
    // through the same arithmetic via a tiny corpus with huge repeats is
    // impractical — instead verify the expression directly.
    val big = spark.range(1).select(
      (lit(1000000L).cast("decimal(38,0)")
        * lit(4000000000000L).cast("decimal(38,0)")
        * lit(3000000000000L).cast("decimal(38,0)")).cast("double").as("n"))
      .as[Double].head()
    assert(big == 1.2e31)
  }

  // ---- Dedup.ngramContainmentPairsOf ----

  test("containment scores subsumption that Jaccard misses") {
    // doc 1 is doc 0's text verbatim inside a much longer page: its
    // shingles are a subset, so containment is 1.0 while Jaccard is low
    val quote = (1 to 8).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 60).map(i => s"p$i").mkString(" ")
    val docs = Seq((0L, quote), (1L, page)).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val cont = Dedup.ngramContainmentPairsOf(sets, minContainment = 0.9, maxDf = 100)
      .select(col("id_small"), col("id_big"), col("containment"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont == Seq((0L, 1L, 1.0)), "full quote → containment 1.0, small side first")
    val jac = Dedup.ngramJaccardPairsOf(sets, minJaccard = 0.0, maxDf = 100)
      .select(col("jaccard")).as[Double].collect()
    assert(jac.forall(_ < 0.15), "the same pair is invisible to a Jaccard threshold")
  }

  test("subsetDedup drops the contained doc, keeps the container, once per chain") {
    val quote = (1 to 8).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 40).map(i => s"p$i").mkString(" ")
    val other = (1 to 10).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, quote), (1L, page), (2L, other)).toDF("doc_id", "text")
    val kept = Dedup.subsetDedup(
        Dedup.shingleSets(docs, "doc_id", "text", 3), minContainment = 0.9, maxDf = 100)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L), "the quote is dropped, the page and the unrelated doc stay")
  }

  test("containment size-tie makes the higher id the contained side") {
    val a = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((5L, a), (9L, a), (7L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairsOf(
        Dedup.shingleSets(docs, "doc_id", "text", 3), minContainment = 0.5, maxDf = 100)
      .select(col("id_small"), col("id_big")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((9L, 5L)), "equal sizes → HIGHER id is id_small; x-doc shares nothing")
  }

  test("subsetDedup keeps the LOWEST id on mutual containment (min-id survivor)") {
    val a = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((5L, a), (9L, a), (2L, a)).toDF("doc_id", "text")
    val kept = Dedup.subsetDedup(
        Dedup.shingleSets(docs, "doc_id", "text", 3), minContainment = 0.9, maxDf = 100)
      .as[Long].collect().toSeq
    assert(kept == Seq(2L), "three identical docs → min id survives")
  }

  test("corpusDiff classifies added/removed/kept content with copy counts") {
    val v1 = Seq((0L, "alpha text"), (1L, "beta text"), (2L, "beta  TEXT"),
      (3L, "gamma text")).toDF("id", "text")
    val v2 = Seq((0L, "Alpha   text"), (1L, "delta text"), (2L, "beta text"))
      .toDF("id", "text")
    val got = Dedup.corpusDiff(v1, "text", v2, "text")
      .select(col("status"), col("n_old"), col("n_new"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    // alpha kept 1→1 (normalization folds case/whitespace), beta kept 2→1,
    // gamma removed, delta added
    assert(got == Seq(("added", 0L, 1L), ("kept", 1L, 1L), ("kept", 2L, 1L),
      ("removed", 1L, 0L)))
  }

  // ---- Dedup.snapshotDelta ----

  test("snapshotDelta emits exactly the kept batch rows with their fingerprints") {
    val history = Seq((100L, "seen before")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "SEEN   before"),  // normalizes to the history fp → excluded
      (2L, "fresh one"),      // kept
      (3L, "fresh one"),      // dup within batch → excluded (2 is first)
      (4L, "fresh two")       // kept
    ).toDF("doc_id", "text")
    val delta = Dedup.snapshotDelta(batch, "doc_id", "text", history, "text")
      .as[(Long, String)].collect().toMap
    assert(delta.keySet == Set(2L, 4L))
    // replaying the delta as the next batch's history drops repeats:
    // simulate by unioning fps and re-running verdicts on a repeat batch
    val hist2 = history.select(col("text"))
      .unionByName(batch.filter(col("doc_id").isin(2L, 4L)).select(col("text")))
    val repeat = Seq((9L, "fresh one")).toDF("doc_id", "text")
    val v2 = Dedup.incrementalDedup(repeat, "doc_id", "text", hist2, "text")
      .as[(Long, String)].collect().toMap
    assert(v2 == Map(9L -> "dup_history"),
      "a delta-extended snapshot must catch the repeat")
  }

  // ---- Similarity.semanticDecontaminate ----

  test("semanticDecontaminate drops scaled copies of benchmark vectors, keeps the rest") {
    val base = Seq(1.0, 0.5, 0.25, 0.125)
    val bench = Seq((0L, base)).toDF("vec_id", "v")
    val train = Seq(
      (10L, base.map(_ * 2.0)),   // cosine 1.0 with the benchmark → dropped
      (11L, base.map(x => -x)),   // anti-parallel → different bucket, kept
      (12L, Seq(0.1, -1.0, 0.2, -0.4))  // unrelated → kept
    ).toDF("vec_id", "v")
    val kept = Similarity.semanticDecontaminate(train, "vec_id", "v",
        bench, "vec_id", "v", dim = 4, nPlanes = 1, minSim = 0.9)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(!kept.contains(10L), "the scaled benchmark copy must be dropped")
    assert(kept.contains(11L), "anti-parallel survives (different sign bucket)")
    assert((kept - 11L - 12L).isEmpty && kept.subsetOf(Set(11L, 12L)))
  }

  test("semanticDecontaminate projects all training columns through") {
    val bench = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val train = Seq((10L, Seq(0.0, 1.0), "keep-me")).toDF("vec_id", "v", "tag")
    val out = Similarity.semanticDecontaminate(train, "vec_id", "v",
      bench, "vec_id", "v", dim = 2, nPlanes = 1, minSim = 0.9)
    assert(out.columns.toSeq == Seq("vec_id", "v", "tag"))
    assert(out.select(col("tag")).as[String].collect().toSeq == Seq("keep-me"))
  }

  // ---- Cluster.electSurvivors ----

  test("electSurvivors keeps the highest score per cluster, ties to lowest id") {
    import graft.ops.Cluster
    val comp = Seq((0L, 0L), (1L, 0L), (2L, 0L), (7L, 7L), (8L, 7L), (9L, 9L))
      .toDF("doc_id", "component")
    val scores = Seq((0L, 5L), (1L, 9L), (2L, 9L), (7L, 1L), (8L, 1L), (9L, 4L))
      .toDF("doc_id", "n_tokens")
    val got = Cluster.electSurvivors(comp, "doc_id", "component",
        scores, "doc_id", "n_tokens")
      .orderBy("component")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 9L, 3L),   // best score 9 shared by 1 and 2 → lowest id 1
      (7L, 7L, 1L, 2L),   // score tie → lowest id
      (9L, 9L, 4L, 1L)))  // singleton keeps itself
  }

  test("score tie-breaks accept STRING ids (no numeric negate on ids)") {
    import graft.ops.Cluster
    // round-5 advice: negate(id) in the old max_by tie-break failed
    // analysis on string ids; the (-score, id) min_by form must not
    val comp = Seq(("doc-a", 1L), ("doc-b", 1L)).toDF("id", "component")
    val scores = Seq(("doc-a", 5.0), ("doc-b", 5.0)).toDF("id", "score")
    val surv = Cluster.electSurvivors(comp, "id", "component", scores, "id", "score")
      .select(col("survivor_id")).as[String].head()
    assert(surv == "doc-a")
    val cents = Seq(("c1", Seq(1.0, 0.0)), ("c2", Seq(1.0, 0.0))).toDF("_cid", "_cv")
    val vecs = Seq(("v9", Seq(1.0, 0.0))).toDF("vid", "embedding")
    val cell = Similarity.ivfAssign(cents, vecs, "vid", "embedding")
      .select(col("cell_id")).as[String].head()
    assert(cell == "c1", "centroid sim tie → lexicographically lowest cell id")
    val hist = Seq(("h2", Seq(1.0, 0.0)), ("h1", Seq(1.0, 0.0))).toDF("vid", "embedding")
    val nd = Similarity.incrementalEmbedNearDups(vecs, hist, "vid", "embedding",
        dim = 2, nPlanes = 2, minSim = 0.9)
      .select(col("hist_id")).as[String].head()
    assert(nd == "h1", "sim tie → lexicographically lowest history id")
  }

  // ---- Pipeline.auditReport ----

  test("auditReport rolls cap + split + leakage into per-split rows") {
    import graft.ops.Pipeline
    // two sources; cap 2 per source by md5 priority; leak is then
    // whatever chunk overlap survives — pin the structural contract:
    // only non-train splits appear, counts are per-split sums, and
    // leak_rate = n_leaked / n_chunks exactly
    val docs = (0 until 20).map(i =>
      (i.toLong, s"tok$i a b c d e f g h i j", s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    val got = Pipeline.auditReport(docs, "doc_id", "text", "source", 10,
        Seq("train" -> 0.5, "val" -> 0.5), "train", 10)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet.subsetOf(Set("val")))
    got.foreach { case (_, nDocs, nChunks, nLeaked, rate) =>
      assert(nDocs > 0 && nChunks >= nDocs && nLeaked <= nChunks)
      assert(rate == nLeaked.toDouble / nChunks)
    }
  }

  test("auditReport caps before splitting: over-quota docs never reach the probe") {
    import graft.ops.Pipeline
    val docs = (0 until 30).map(i => (i.toLong, "same text here", "only"))
      .toDF("doc_id", "text", "source")
    val got = Pipeline.auditReport(docs, "doc_id", "text", "source", 4,
      Seq("train" -> 0.5, "val" -> 0.5), "train", 10)
    // at most 4 docs total survive the cap, split across train/val —
    // the report's doc count can never exceed the cap (an all-train
    // draw reports nothing: sum over the empty frame is null → 0)
    assert(got.agg(coalesce(sum(col("n_docs")), lit(0L))).as[Long].head() <= 4)
  }

  // ---- Corpus.cmsWatchlistCounts ----

  test("CMS watchlist counts never undercount and stay within the eps bound") {
    import graft.ops.Corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val watch = Seq("join", "hash", "vector", "no-such-term")
    val est = Corpus.cmsWatchlistCounts(docs, "text", watch,
      eps = 0.001, confidence = 0.99).toMap
    val exact = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t").isin(watch: _*))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val nTokens = docs.select(sum(TextAnalysis.tokenCount(col("text"))))
      .as[Long].head()
    watch.foreach { t =>
      val truth = exact.getOrElse(t, 0L)
      assert(est(t) >= truth, s"$t: CMS must never undercount")
      assert(est(t) <= truth + math.ceil(0.001 * 2 * nTokens).toLong,
        s"$t: overcount beyond the eps bound (est ${est(t)}, true $truth, N $nTokens)")
    }
  }

  test("CMS watchlist on an empty corpus reports zero for every term") {
    import graft.ops.Corpus
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.cmsWatchlistCounts(docs, "text", Seq("x", "y")) ==
      Seq("x" -> 0L, "y" -> 0L))
  }

  // ---- Null-robustness for the audit batch ----

  test("audit operators drop or isolate null-text/null-key rows instead of failing") {
    import graft.ops.Corpus
    val docs = Seq((0L, "a b c", "s1"), (1L, null, "s1"), (2L, "a b", null))
      .toDF("doc_id", "text", "source")
    // bm25: the null-text doc has no tokens → absent from the scores
    val bm = Corpus.bm25Score(docs, "doc_id", "text", Seq("a"))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(bm == Set(0L, 2L))
    // splitLeakage: null text explodes to no chunks → absent
    val split = docs.withColumn("split",
      when(col("doc_id") === 0, "train").otherwise("val"))
    val leak = Dedup.splitLeakage(split, "doc_id", "text", "split", "train", 10)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(leak == Set(2L))
    // groupCap: a null group is its own group, still capped
    val capped = TextAnalysis.groupCap(docs, "source", "doc_id", 1)
    assert(capped.count() == 2)   // one from s1, one from the null group
  }

  // ---- Similarity.recallAtK / exactTopK ----

  test("recallAtK is 1.0 against itself and counts partial overlap") {
    val exact = Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L), (1L, 21L), (1L, 22L))
      .toDF("query_id", "vec_id")
    val approx = Seq((0L, 10L), (0L, 11L), (0L, 99L), (1L, 20L), (1L, 21L), (1L, 22L))
      .toDF("query_id", "vec_id")
    val selfMap = Similarity.recallAtK(exact, exact, "query_id", "vec_id", 3)
      .select(col("query_id"), col("recall")).as[(Long, Double)].collect().toMap
    assert(selfMap == Map(0L -> 1.0, 1L -> 1.0))
    val part = Similarity.recallAtK(approx, exact, "query_id", "vec_id", 3)
      .select(col("query_id"), col("recall")).as[(Long, Double)].collect().toMap
    assert(part(0L) == 2.0 / 3.0 && part(1L) == 1.0)
  }

  test("exactTopK ground truth makes probe-all LSH recall 1.0") {
    // nPlanes = 0 is invalid; instead use nTables high enough that the
    // 1-plane bucketing still unions to full recall? Not guaranteed —
    // use the identity instead: recall of exactTopK vs itself over the
    // sf0.001 embeddings is 1.0 for every query, and lshTopK recall is
    // bounded by it
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 3)
    val exact = Similarity.exactTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 5)
    val self = Similarity.recallAtK(exact, exact, "query_id", "vec_id", 5)
      .select(col("recall")).as[Double].collect()
    assert(self.length == 3 && self.forall(_ == 1.0))
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", dim = 64, nPlanes = 4, k = 5)
    val r = Similarity.recallAtK(lsh, exact, "query_id", "vec_id", 5)
      .select(col("recall")).as[Double].collect()
    assert(r.forall(x => x >= 0.0 && x <= 1.0))
    // the eval-scale bound is ENFORCED (round-12 verdict #3 sweep): a
    // corpus-sized query set is the all-pairs blowup the approximate
    // ladder avoids — it must fail loudly, and the knob raises the cap
    val eG = intercept[IllegalArgumentException] {
      Similarity.exactTopK(emb, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 5, maxQueries = 2)
    }
    assert(eG.getMessage.contains("maxQueries") &&
      eG.getMessage.contains("ground truth"))
    assert(Similarity.exactTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 5, maxQueries = 3).count() == 15)
  }
}
