package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Selectable approx flavors of the percentile family (round-5 verdict
  * #6): at a sketch accuracy above the row count the rank sketch is
  * exact, so the approx flavor must REPLAY the exact operator; at a
  * coarse accuracy the divergence must stay inside the sketch's rank
  * error — quantified here against the exact path at sf0.01, the
  * datasetCardApprox discipline. */
class ApproxStatsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("high-accuracy approx flavors replay the exact operators") {
    // 500 rows << accuracy 10000: approx_percentile degenerates to exact
    // rank selection; note the flavors still differ on interpolation
    // (exact interpolates between neighbors, the sketch returns an
    // observed value), so compare downstream DECISIONS, not quantiles
    val exactOut = Stats.iqrOutliers(docs, "lang", "n_chars")
      .select(col("doc_id")).as[Long].collect().toSet
    val approxOut = Stats.iqrOutliersApprox(docs, "lang", "n_chars",
        accuracy = 10000)
      .select(col("doc_id")).as[Long].collect().toSet
    // fences built from observed values vs interpolated values can flip
    // only rows between the two fence pairs; on this data none flip
    assert(approxOut == exactOut)

    val exScores = Stats.quartileScores(docs, Seq("n_chars"))
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val apScores = Stats.quartileScoresApprox(docs, Seq("n_chars"), accuracy = 10000)
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val scoreDiff = exScores.count { case (id, s) => apScores(id) != s }
    assert(scoreDiff <= (exScores.size * 0.02).toInt,
      s"interpolation-only drift must touch almost no rows: $scoreDiff differ")

    val exH = Stats.equiDepthHistogram(docs, "n_chars", 8)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    val apH = Stats.equiDepthHistogramApprox(docs, "n_chars", 8, accuracy = 10000)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    assert(apH.values.sum == exH.values.sum, "every row lands in some bucket")
    assert(apH.keySet == exH.keySet)
    apH.foreach { case (b, n) =>
      assert(math.abs(n - exH(b)) <= 2, s"bucket $b: $n vs ${exH(b)}") }
  }

  test("coarse-accuracy divergence stays inside the sketch rank error") {
    val n = docs.count()
    // accuracy 20 → rank error ~ n/20 = 5% of rows
    val tol = math.ceil(n / 20.0).toLong

    // equi-depth: bucket populations within the rank error of the exact
    // k-quantile splits; totals conserved
    val exH = Stats.equiDepthHistogram(docs, "n_chars", 5)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    val apH = Stats.equiDepthHistogramApprox(docs, "n_chars", 5, accuracy = 20)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    assert(apH.values.sum == n)
    apH.foreach { case (b, cnt) =>
      assert(math.abs(cnt - exH.getOrElse(b, 0L)) <= 2 * tol,
        s"bucket $b drifted past the sketch error: $cnt vs ${exH.getOrElse(b, 0L)}") }

    // quartile scores: a coarse sketch can shift a score by one step for
    // rows near a quartile, never more, and never for rows far from one
    val ex = Stats.quartileScores(docs, Seq("n_chars"))
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val ap = Stats.quartileScoresApprox(docs, Seq("n_chars"), accuracy = 20)
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    assert(ex.keySet == ap.keySet)
    val diffs = ex.collect { case (id, s) if ap(id) != s => math.abs(ap(id) - s) }
    assert(diffs.forall(_ == 1), "scores can shift by at most one step")
    assert(diffs.size <= 3 * tol, s"${diffs.size} rows shifted — past the rank error")

    // IQR outliers: every verdict flip must sit between the two flavors'
    // fence pairs (the only rows the fence error can reach)
    val exFl = Stats.iqrOutliers(docs, "lang", "n_chars")
      .select(col("doc_id")).as[Long].collect().toSet
    val apFl = Stats.iqrOutliersApprox(docs, "lang", "n_chars", accuracy = 20)
      .select(col("doc_id")).as[Long].collect().toSet
    val flips = (exFl diff apFl) union (apFl diff exFl)
    assert(flips.size <= 3 * tol, s"${flips.size} outlier flips — past the rank error")
  }
}
