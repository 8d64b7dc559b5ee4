package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy on a content fingerprint (one shuffle on the
  *    fingerprint — never on the full text).
  *  - MinHash + LSH: shingle → k minhashes → band keys → bucket join.
  *    Candidate generation shuffles on small band keys; only candidate
  *    pairs pay the exact-similarity verification.
  *  - n-gram Jaccard: exact pairwise similarity via an inverted shingle
  *    index (explode + self-join on shingle, count-based Jaccard) — no
  *    O(n²) cross join.
  *  - SimHash: 32-bit bit-majority signature; near-dups differ in few bits.
  *
  * The minhash family uses md5 (bit-identical in the DuckDB oracle);
  * simhash uses xxhash64 (fastest 64-bit hash available as a codegen'd
  * built-in).
  */
object Dedup {

  /** Distinct word n-gram shingles of the lower-cased text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(lower(trim(text)), "\\s+")
    val grams = transform(sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
    array_distinct(when(size(w) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** The i-th minhash of a shingle array: min over md5(i || "|" || shingle)
    * (lexicographic min over hex strings — stable across engines). */
  def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(i.toString), lit("|"), s))))

  /** k minhash signature columns named sig0..sig{k-1}. */
  def minhashSignature(sh: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map(i => s"sig$i" -> minhash(sh, i))

  /** LSH banding: concatenate `rowsPerBand` signature values per band into
    * one bucket key per band. Docs sharing any bucket are candidates. */
  def bandKeys(sigs: Seq[Column], rowsPerBand: Int): Seq[Column] =
    sigs.grouped(rowsPerBand).zipWithIndex
      .map { case (g, b) => concat_ws("#", lit(b.toString) +: g: _*) }.toSeq

  /** Exact n-gram Jaccard for all pairs sharing at least one shingle, via
    * inverted index: explode(shingle) → self-join on shingle → common
    * counts → |A∩B| / (|A|+|B|-|A∩B|). Returns (id_a, id_b, jaccard),
    * id_a < id_b. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val withSh = df.select(col(idCol).as("_id"), shingles(col(textCol), n).as("_sh"))
      .withColumn("_size", size(col("_sh")))
    val inv = withSh.select(col("_id"), col("_size"), explode(col("_sh")).as("_s"))
    val a = inv.select(col("_id").as("id_a"), col("_size").as("size_a"), col("_s"))
    val b = inv.select(col("_id").as("id_b"), col("_size").as("size_b"), col("_s"))
    a.join(b, Seq("_s")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("size_a"), col("size_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common") / (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash-LSH candidate pairs verified with exact Jaccard. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, rowsPerBand: Int = 2, n: Int = 3,
                      minJaccard: Double = 0.0): DataFrame = {
    val base = df.select(col(idCol).as("_id"), shingles(col(textCol), n).as("_sh"))
      .withColumn("_size", size(col("_sh")))
    val sigs = minhashSignature(col("_sh"), k)
    val withSigs = sigs.foldLeft(base) { case (d, (name, c)) => d.withColumn(name, c) }
    val banded = withSigs.select(col("_id"), col("_sh"), col("_size"),
      explode(array(bandKeys(sigs.map(s => col(s._1)), rowsPerBand): _*)).as("_bucket"))
    val l = banded.select(col("_bucket"), col("_id").as("id_a"), col("_sh").as("sh_a"), col("_size").as("size_a"))
    val r = banded.select(col("_bucket"), col("_id").as("id_b"), col("_sh").as("sh_b"), col("_size").as("size_b"))
    l.join(r, Seq("_bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"), col("size_a"), col("size_b"))
      .distinct()
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common") / (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 32-bit SimHash: per bit, majority vote over xxhash64(token) bits. */
  def simhash32(text: Column): Column = {
    val t = split(lower(trim(text)), "\\s+")
    val hashes = transform(t, w => xxhash64(w))
    val bits: Seq[Column] = (0 until 32).map { b =>
      val mask = 1L << b
      val ones = size(filter(hashes, h => h.bitwiseAND(lit(mask)) =!= 0L))
      when(ones * 2 >= size(hashes), lit(mask)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
