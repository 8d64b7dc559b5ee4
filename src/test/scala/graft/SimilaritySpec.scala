package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Round-5 ANN-ladder depth: trained PQ codebooks beat the md5-constant
  * stand-in on recall, IVF×PQ probing all cells degrades to the plain ADC
  * scan, and multi-table LSH recovers recall a single bucket signature
  * loses at boundaries. All on the driver-generated sf0.001 embeddings
  * (500 × 64-dim float vectors).
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = Golden.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private def n(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue()

  /** exact cosine top-k ids per query id (self excluded) — ground truth */
  private def bruteTruth(k: Int): Map[Long, Set[Long]] =
    queries.select(col("vec_id").as("qid"), col("embedding").as("qv")).collect().map { qr =>
      val top = Similarity.topK(
          emb.filter(col("vec_id") =!= n(qr, 0)), "vec_id", "embedding",
          spark.createDataFrame(java.util.List.of(qr), qr.schema).select(col("qv")), "qv", k)
        .collect().map(r => n(r, 0)).toSet
      n(qr, 0) -> top
    }.toMap

  private def recallOf(result: Array[(Long, Long)], truth: Map[Long, Set[Long]]): Double = {
    val hits = result.count { case (q, id) => truth(q).contains(id) }
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("pqTrain: per-sub-space k-means codebook lifts ADC recall over md5 constants") {
    val (dim, m, k, topK) = (64, 4, 8, 10)
    val truth = bruteTruth(topK)
    def recallWith(book: Seq[Seq[Seq[Double]]]): Double = recallOf(
      Similarity.pqTopKWith(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", book, topK)
        .collect().map(r => (n(r, 0), n(r, 1))), truth)

    val trained = Similarity.pqTrain(emb, "embedding", dim, m, k)
    assert(trained.size == m && trained.forall(_.size == k)
      && trained.flatten.forall(_.size == dim / m), "book shape m×k×(dim/m)")

    val rTrained = recallWith(trained)
    val rConst = recallWith(Similarity.pqBookConst(dim, m, k))
    info(f"ADC recall@$topK: trained $rTrained%.2f vs constant $rConst%.2f")
    // md5 constants are uniform noise in [-0.5,0.5); centroids fitted to
    // the corpus must rank neighbors strictly better
    assert(rTrained > rConst)
  }

  test("ivfPqTopK probing all cells equals the whole-corpus ADC scan") {
    val book = Similarity.pqBookConst(64, 4, 8)
    val cents = Similarity.ivfTrain(emb, "embedding", nCentroids = 4)
    val ivfpq = Similarity.ivfPqTopK(cents, emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", book, nProbe = 4, topK = 5)
      .collect().map(r => (n(r, 0), n(r, 1))).toSet
    val flat = Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", dim = 64, m = 4, k = 8, topK = 5)
      .collect().map(r => (n(r, 0), n(r, 1))).toSet
    assert(ivfpq == flat)
  }

  test("residual IVF-PQ with one coarse cell equals plain ADC on shifted vectors") {
    // with a single cell every residual is v − c0, so IVFADC must reduce
    // exactly (same adist doubles) to pqTopKWith over the shifted frame
    import spark.implicits._
    val book = Similarity.pqBookConst(64, 4, 8)
    // MLlib k-means requires k > 1, and one cell needs no training anyway:
    // any deterministic vector works as the lone centroid
    val c0vec = emb.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>")).collect()(0).getSeq[Double](0)
    val cents = Seq((0L, c0vec)).toDF("_cid", "_cv")
    val res = Similarity.ivfPqTopKResidual(cents, emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", book, nProbe = 1, topK = 5)
      .collect().map(r => (n(r, 0), n(r, 1), r.getDouble(2))).toSet

    val c0 = typedlit(c0vec)
    def shifted(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      zip_with(col("embedding").cast("array<double>"), c0, _ - _).as("sv"))
    val flat = Similarity.pqTopKWith(shifted(emb), "vec_id", "sv",
        shifted(queries), "vec_id", "sv", book, topK = 5)
      .collect().map(r => (n(r, 0), n(r, 1), r.getDouble(2))).toSet
    assert(res == flat)
  }

  test("multi-table LSH recovers recall a single bucket signature loses") {
    val (dim, nPlanes, k) = (64, 6, 10)
    val truth = bruteTruth(k)
    def recallAt(l: Int): Double = recallOf(
      Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", dim, nPlanes, k, nTables = l)
        .collect().map(r => (n(r, 0), n(r, 1))), truth)
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    info(f"LSH recall@$k: L=1 $r1%.2f vs L=4 $r4%.2f")
    // OR-amplification: every table-0 candidate survives, so recall is
    // monotone in L; with 6 planes per table, 3 extra tables must find
    // neighbors table 0's signature split away
    assert(r4 > r1)
  }

  test("meanPool: element-wise group means, short vectors contribute per-element nulls") {
    val spark2 = Golden.spark
    import spark2.implicits._
    val df = Seq((0, Seq(1f, 2f, 10f)), (0, Seq(3f, 4f)), (1, Seq(5f, 6f)))
      .toDF("g", "v")
    val got = Similarity.meanPool(df, "g", "v", 3).collect()
      .map(r => r.getInt(0) -> r.getSeq[Any](1)).toMap
    // dim 3 exists only in group 0's first vector: avg over the present
    // elements, not over the row count
    assert(got(0) == Seq(2.0, 3.0, 10.0))
    assert(got(1) == Seq(5.0, 6.0, null))
  }

  test("semDedup: first-wins within cells, chains collapse, cross-cell pairs missed") {
    val spark2 = Golden.spark
    import spark2.implicits._
    // unit circle: angle encodes similarity exactly (cos of the angle
    // difference); centroids anchor cell 0 at 0° and cell 1 at 90°
    def v(deg: Double): Seq[Double] =
      Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val cents = Seq((0L, v(0)), (1L, v(90))).toDF("_cid", "_cv")
    val tau = math.cos(math.toRadians(15)) // ≈ 0.966
    val docs = Seq(
      1L -> v(0), 2L -> v(10), 3L -> v(20), // cell 0: 2 ~ 1, 3 ~ 2 but NOT ~ 1
      4L -> v(90), 5L -> v(80),             // cell 1: 5 ~ 4
      6L -> v(44), 7L -> v(46)              // 2° apart but split across cells
    ).toDF("id", "vec")

    val out = Similarity.semDedup(cents, docs, "id", "vec", minSim = tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 dropped by 1; 3 dropped by 2 EVEN THOUGH 3 !~ 1 (chain collapse);
    // 5 dropped by 4; 6/7 both survive — their 0.999 cosine is never
    // examined across the cell boundary (the SemDeDup approximation)
    assert(out.keySet == Set(1L, 4L, 6L, 7L))
    assert(out(1L) == 0L && out(6L) == 0L && out(4L) == 1L && out(7L) == 1L)

    // maxPerCell = 2: only the first two ids per cell generate pairs, so
    // 3 (cell 0) and 7 (cell 1) sit beyond the cap and always survive;
    // capped members still dedup among themselves (2 and 5 still drop)
    val capped = Similarity.semDedup(cents, docs, "id", "vec", minSim = tau, maxPerCell = 2)
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(1L, 3L, 4L, 6L, 7L))
  }

  test("semDedup is partitioning-invariant on the sf0.001 embeddings") {
    val cents = emb.select(col("vec_id").as("_cid"),
        col("embedding").cast("array<double>").as("_cv"))
      .orderBy(col("_cid")).limit(8)
    def survivors(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.semDedup(cents, df, "vec_id", "embedding", minSim = 0.3)
        .collect().map(_.getLong(0)).toSet
    val base = survivors(emb)
    assert(base.nonEmpty && base.size < 500, "threshold must actually drop rows")
    // the survivor set is a pure function of (ids, vectors, codebook) —
    // physical layout must not leak into it
    assert(survivors(emb.repartition(37)) == base)
    assert(survivors(emb.repartition(1)) == base)
  }

  test("embedOutliers: farthest-N per cell, id-ascending ties, the N bound holds per cell") {
    import spark.implicits._
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("_cid", "_cv")
    val pts = Seq(
      (10L, Seq(1.0, 0.0)),   // cell 0, sim 1.0 — the center, never an outlier at N=2
      (11L, Seq(1.0, 0.2)),   // cell 0, sim ~0.981
      (12L, Seq(1.0, 0.9)),   // cell 0, sim ~0.743
      (13L, Seq(1.0, -0.9)),  // cell 0, sim ~0.743 — exact tie with 12, id breaks it
      (20L, Seq(0.0, 1.0)),   // cell 1, sim 1.0
      (21L, Seq(0.3, 1.0))    // cell 1, sim ~0.958
    ).toDF("vec_id", "embedding")
    val got = Similarity.embedOutliers(pts, "vec_id", "embedding", cents, topN = 2)
      .select("vec_id", "cell_id", "far_rank").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    assert(got == Seq((12L, 0L, 1L), (13L, 0L, 2L), (21L, 1L, 1L), (20L, 1L, 2L)),
      "equal-distance outliers must rank by id; the center of a 4-point cell is pruned at N=2")
  }

  test("embedOutliers is partitioning-invariant and bounded by topN per cell") {
    val cents = emb.select(col("vec_id").as("_cid"),
        col("embedding").cast("array<double>").as("_cv"))
      .orderBy(col("_cid")).limit(8)
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      Similarity.embedOutliers(df, "vec_id", "embedding", cents, topN = 16)
        .select(col("vec_id"), col("cell_id"), col("far_rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
    val base = run(emb)
    assert(base.groupBy(_._2).values.forall(_.size <= 16),
      "no cell may emit more than topN rows")
    assert(base.nonEmpty && run(emb.repartition(37)) == base,
      "the outlier set is a pure function of (ids, vectors, codebook)")
  }

  // ---- Similarity.rankedEval ----

  test("rankedEval hand case: recall, MRR, and NDCG at k") {
    import graft.ops.Similarity
    import spark.implicits._
    // query 100: approx ranking (score desc) = [9 miss, 2 hit, 3 hit];
    // query 200: all misses; query 300: perfect leading hit
    val approx = Seq(
      (100L, 9L, 0.9), (100L, 2L, 0.8), (100L, 3L, 0.7),
      (200L, 7L, 0.9), (200L, 8L, 0.8),
      (300L, 1L, 0.99)
    ).toDF("query_id", "vec_id", "sim")
    val exact = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (200L, 1L), (200L, 2L), (200L, 3L),
      (300L, 1L), (300L, 2L), (300L, 3L)
    ).toDF("query_id", "vec_id")
    val got = Similarity.rankedEval(approx, exact, "query_id", "vec_id",
        "sim", ascending = false, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (gains, idcg) = Similarity.ndcgGains(3)
    def nd(x: Double) = math.round(x / idcg * 1e6) / 1e6
    assert(got(100L) == ((2L, 2.0 / 3, 0.5, nd(gains(1) + gains(2)))))
    assert(got(200L) == ((0L, 0.0, 0.0, 0.0)))
    assert(got(300L) == ((1L, 1.0 / 3, 1.0, nd(gains(0)))))
  }

  test("rankedEval ranks by the stated score direction and caps at k") {
    import graft.ops.Similarity
    import spark.implicits._
    // ascending=true (distance-like): the LOWEST score is rank 1; a 4th
    // row past k=3 must not count even though it is a hit
    val approx = Seq(
      (1L, 10L, 0.1), (1L, 11L, 0.2), (1L, 12L, 0.3), (1L, 13L, 0.4)
    ).toDF("query_id", "vec_id", "adist")
    val exact = Seq((1L, 10L), (1L, 13L), (1L, 99L)).toDF("query_id", "vec_id")
    val r = Similarity.rankedEval(approx, exact, "query_id", "vec_id",
        "adist", ascending = true, k = 3).collect()(0)
    // only the rank-1 hit counts (13 sits at rank 4, past k)
    assert(r.getLong(1) == 1L && r.getDouble(3) == 1.0)
  }


  test("semanticDupRateCurve matches per-threshold independent pair runs") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ts = Seq(0.3, 0.6, 0.9)
    val curve = Similarity.semanticDupRateCurve(emb, "vec_id", "embedding",
        dim = 64, nPlanes = 4, thresholds = ts)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = emb.count()
    for (t <- ts) {
      val want = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, nPlanes = 4, minSim = t)
        .select("id_b").distinct().count()
      assert(curve(t) == ((want, total)), s"threshold $t")
    }
    // the sweep is monotone non-increasing in the threshold
    assert(curve(0.3)._1 >= curve(0.6)._1 && curve(0.6)._1 >= curve(0.9)._1)
  }

}
