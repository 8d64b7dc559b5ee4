package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: operators whose inputs are whole-corpus
  * aggregates (document frequency, corpus size), unlike the row-local
  * [[TextAnalysis]] columns.
  */
object Corpus {

  /** The highest-weighted term per document by tf·idf, with idf as the
    * LINEAR inverse document frequency N/df.
    *
    * Why linear rather than log: N/df is one IEEE division and one
    * multiply — bit-identical across engines, so the scores (and the
    * argmax) are exactly reproducible and cross-engine checkable. Log-idf
    * is a one-line swap (`log(nDocs / df)`) whose last-ulp libm
    * differences across engines make exact score comparison impossible;
    * rankings are unaffected for any monotone idf when comparing terms of
    * equal tf, but tf·idf mixes the two, so the conservative choice is the
    * exactly-reproducible weighting.
    *
    * Scale shape: explode → (doc, term) count → term df join → per-doc
    * argmax via max_by — three hash shuffles on narrow keys, map-side
    * partials everywhere, no window over the corpus. The corpus size is an
    * aggregate scalar cross-joined as a broadcast 1-row frame (never a
    * driver-side collect).
    *
    * Returns (idCol, top_term, score); documents with no non-empty token
    * produce no row. Ties break toward the lexicographically greatest
    * term (deterministic). */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Parallelize.ensure(
        docs.select(col(idCol).as("_id"), col(textCol).as("_t")))
      .select(col("_id"), explode(TextAnalysis.tokens(col("_t"))).as("_term"))
      .filter(col("_term") =!= "")
    val tf = toks.groupBy(col("_id"), col("_term")).agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    val nDocs = docs.select(count_distinct(col(idCol)).as("_n"))
    tf.join(dfreq, Seq("_term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("_score",
        col("_tf") * (col("_n").cast("double") / col("_df").cast("double")))
      .groupBy(col("_id"))
      .agg(max_by(struct(col("_term"), col("_score")),
        struct(col("_score"), col("_term"))).as("_best"))
      .select(col("_id").as(idCol), col("_best._term").as("top_term"),
        col("_best._score").as("score"))
  }
}
