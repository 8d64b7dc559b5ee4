package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. non-shuffle plans or extreme
  * single-key skew): the big (skewed) side gets a deterministic salt in
  * [0, factor), the small side is replicated `factor` times, and the join
  * key becomes (key, salt) so one hot key spreads over `factor` reducers.
  *
  * The salt is `pmod(hash(<unique cols>), factor)` — deterministic for a
  * given row (reproducible runs), uniform enough to split hot keys.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 factor: Int, saltOn: Seq[String]): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(saltOn.map(col): _*), lit(factor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
