package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** The ANN ladder's sizing knobs must trade cost for recall in the
  * advertised DIRECTION (the frontier table in BASELINE.md §ANN
  * frontier): more tables / more probes / larger shortlists buy recall,
  * more planes shrink buckets and shed it. Everything here is seeded
  * and the corpus fixed, so the asserts are deterministic. */
class AnnFrontierSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private val k = 10
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 20)
  private lazy val exact = Similarity.exactTopK(emb, "vec_id", "embedding",
    queries, "vec_id", "embedding", k)

  private def recall(approx: DataFrame): Double =
    Similarity.recallAtK(approx, exact, "query_id", "vec_id", k)
      .agg(avg(col("recall"))).head().getDouble(0)

  private def lsh(planes: Int, tables: Int = 1) =
    recall(Similarity.lshTopK(emb, "vec_id", "embedding", queries, "vec_id",
      "embedding", dim = 64, nPlanes = planes, k = k, nTables = tables))

  test("more planes shed recall (smaller buckets, fewer candidates)") {
    assert(lsh(2) > lsh(6))
  }

  test("more tables buy recall (candidate sets are supersets)") {
    val (t1, t4) = (lsh(4), lsh(4, tables = 4))
    assert(t4 >= t1 && t4 > 0)
  }

  test("multi-probe dominates the single table at equal planes") {
    val mp = recall(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", dim = 64, nPlanes = 4, k = k))
    assert(mp >= lsh(4))
  }

  test("IVF recall is monotone in nProbe (probed cells are supersets)") {
    val cents = Similarity.ivfTrain(emb, "embedding", nCentroids = 16)
    def ivf(np: Int) = recall(Similarity.ivfTopKWith(cents, emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", nProbe = np, k = k))
    val (p1, p4, p8) = (ivf(1), ivf(4), ivf(8))
    assert(p1 <= p4 && p4 <= p8)
    assert(p8 > 0.5, s"probing half the codebook should recover most of top-$k ($p8)")
  }

  test("auto-sized shortlist holds recall flat across the 4x corpus where the fixed one decays") {
    // the frontier's scaling rule wired into a default: shortlist 100 is
    // the 0.94-recall point at n=500 but a shrinking fraction at n=2000;
    // autoShortlist holds shortlist/n, so its recall must stay flat
    // (±0.05) across the same 4x where the fixed setting measurably decays
    def recallAt(emb: DataFrame, shortlist: Long => Int): Double = {
      val qs = emb.filter(col("vec_id") < 20)
      val ex = Similarity.exactTopK(emb, "vec_id", "embedding", qs, "vec_id", "embedding", k)
      val book = Similarity.pqTrain(emb, "embedding", dim = 64, m = 16, k = 16)
      val approx = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
        qs, "vec_id", "embedding", book, shortlist(emb.count()), k)
      Similarity.recallAtK(approx, ex, "query_id", "vec_id", k)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    val large = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // at n=500, autoShortlist(n, k) IS 100 — the fixed and auto paths
    // coincide by construction, so the small corpus is measured once
    assert(Similarity.autoShortlist(500L, k) == 100)
    val small = recallAt(emb, n => Similarity.autoShortlist(n, k))
    val fixedLarge = recallAt(large, _ => 100)
    val autoLarge = recallAt(large, n => Similarity.autoShortlist(n, k))
    assert(small - fixedLarge > 0.05,
      s"the fixed shortlist should measurably decay at 4x ($small -> $fixedLarge)")
    assert(math.abs(small - autoLarge) <= 0.05,
      s"auto-sized recall must stay flat ($small -> $autoLarge)")
    assert(autoLarge > fixedLarge)
  }

  test("autoProbe holds the probed fraction; ivfTopKAuto equals the explicit-probe plan") {
    // probes scale with the codebook: 8 of 16, 32 of 64 — the fraction,
    // not the count, is the invariant
    assert(Similarity.autoProbe(16) == 8 && Similarity.autoProbe(64) == 32)
    assert(Similarity.autoProbe(1) == 1 && Similarity.autoProbe(16, 0.25) == 4)
    val cents = Similarity.ivfTrain(emb, "embedding", nCentroids = 16)
    val auto = Similarity.ivfTopKAuto(cents, emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = k)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = Similarity.ivfTopKWith(cents, emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", nProbe = 8, k = k)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
  }

  test("PQ rerank recall is monotone in the shortlist (supersets reranked)") {
    val book = Similarity.pqTrain(emb, "embedding", dim = 64, m = 8, k = 16)
    def rr(sl: Int) = recall(Similarity.pqRerankTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", book, shortlist = sl, topK = k))
    val (s20, s100) = (rr(20), rr(100))
    assert(s20 <= s100)
    // the shortlist head is ADC-ranked, so reranking beats the raw scan
    assert(s100 >= recall(Similarity.pqTopKWith(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", book, k)))
  }
}
