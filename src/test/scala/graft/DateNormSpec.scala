package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateNorm

/** Unit tests for the reference-faithful date semantics
  * (cases derived from carrot-transform tools/date_helpers.py +
  * tools/validation.py behavior, exercised via its test corpus). */
class DateNormSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("raw").select(DateNorm.normalise8601(col("raw")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  private def strict(ss: String*): Seq[String] =
    ss.toDF("raw").select(DateNorm.strictDate(col("raw")).cast("string").as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("normalise8601 basic forms") {
    assert(norm("2020-01-02") == Seq("2020-01-02 00:00:00"))
    assert(norm("2020/01/02") == Seq("2020-01-02 00:00:00"))
    assert(norm("02-01-2020") == Seq("2020-01-02 00:00:00"))
    assert(norm("02/01/2020") == Seq("2020-01-02 00:00:00"))
  }

  test("normalise8601 times") {
    assert(norm("2020-01-02 11:12") == Seq("2020-01-02 11:12:00"))
    assert(norm("2020-01-02 11:12:13") == Seq("2020-01-02 11:12:13"))
    assert(norm("2020-01-02 11:12:13.123456") == Seq("2020-01-02 11:12:13"))
    // malformed time -> midnight (time regex is a prefix match needing HH:MM)
    assert(norm("2020-01-02 1:2") == Seq("2020-01-02 00:00:00"))
    // more than one space -> time part ignored
    assert(norm("2020-01-02 11:12:13 extra") == Seq("2020-01-02 00:00:00"))
  }

  test("normalise8601 quirks kept from the reference") {
    // prefix match tolerates trailing junk
    assert(norm("2020-01-02junk") == Seq("2020-01-02 00:00:00"))
    // no calendar validation at this stage (month 13 passes)
    assert(norm("2020-13-40") == Seq("2020-13-40 00:00:00"))
    // year-first pattern is tried first and prefix-matches, so a day-first
    // string with a 4-digit trailing year parses as year=0102 day=20
    assert(norm("0102-03-2020") == Seq("0102-03-20 00:00:00"))
    // single-digit fields don't match either pattern
    assert(norm("2020-1-2", "bad", "") == Seq(null, null, null))
  }

  test("Normalise8601 expression is bit-identical to the composable form") {
    val corpus = Seq(
      "2020-01-02", "2020/01/02", "02-01-2020", "02/01/2020",
      "2020-01-02 11:12", "2020-01-02 11:12:13", "2020-01-02 11:12:13.123456",
      "2020-01-02 1:2", "2020-01-02 11:12:13 extra", "2020-01-02junk",
      "2020-13-40", "0102-03-2020", "2020-1-2", "bad", "", " ", "  ",
      "2020-01/02", "02/01-2020", "0001-02-03", "9999-12-31 23:59:59",
      "12-34-5678", "2020-01-02 99:99", "2020-01-02 11:12:13.12345",
      "2020-01-02  11:12", "x 11:12", "11:12 2020-01-02", null)
    val df = corpus.toDF("raw")
    val both = df.select(
      DateNorm.normalise8601(col("raw")).as("a"),
      graft.functions.DateExprs.normalise8601(col("raw")).as("b"))
    val rows = both.collect()
    rows.zip(corpus).foreach { case (r, in) =>
      val a = if (r.isNullAt(0)) null else r.getString(0)
      val b = if (r.isNullAt(1)) null else r.getString(1)
      assert(a == b, s"mismatch for input '$in': composable=$a expr=$b")
    }
  }

  test("strictDate accepts the three date-only formats, rejects datetimes") {
    assert(strict("1985-03-01") == Seq("1985-03-01"))
    assert(strict("1985-3-1") == Seq("1985-03-01"))   // strptime tolerates non-padded
    assert(strict("01-03-1985") == Seq("1985-03-01")) // DD-MM-YYYY
    assert(strict("01/03/1985") == Seq("1985-03-01")) // DD/MM/YYYY
    assert(strict("1985-03-01 00:00:00", "2020-02-30", "", "nope") ==
      Seq(null, null, null, null))
  }
}
