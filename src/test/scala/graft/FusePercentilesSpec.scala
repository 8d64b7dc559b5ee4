package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The percentile-fusion optimizer rule: sibling scalar percentiles over
  * one column must collapse to a single array-percentile buffer, with
  * bit-identical results, and everything else must pass through
  * untouched. */
class FusePercentilesSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  /** Count percentile aggregate functions in the executed plan (each
    * appears twice with partial aggregation: partial_percentile +
    * percentile — so an UNFUSED two-percentile agg shows 4). */
  private def percentileCount(df: DataFrame): Int =
    "percentile\\(".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("sibling quartiles fuse into one array-percentile buffer") {
    val df = (1 to 8).map(_.toDouble).map(("g", _)).toDF("g", "v")
      .groupBy("g")
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
    assert(percentileCount(df) == 2, // partial + final of ONE fused function
      df.queryExecution.executedPlan.toString)
    assert(df.queryExecution.optimizedPlan.toString.contains("[0.25,0.5,0.75]"),
      "array percentage literal should appear")
    val r = df.collect().head
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) == ((2.75, 4.5, 6.25)))
  }

  test("the engine's fence operators plan one percentile buffer per group pass") {
    val fences = graft.ops.Stats.iqrOutliers(
      (1 to 20).map(v => ("a", v.toDouble)).toDF("g", "v"), "g", "v")
    assert(percentileCount(fences) == 2,
      fences.queryExecution.executedPlan.toString)
  }

  test("different columns, distinct, and array forms do not fuse") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    // different columns: two independent buffers stay (2 functions -> 4)
    val twoCols = df.agg(
      expr("percentile(a, 0.5)").as("ma"), expr("percentile(b, 0.5)").as("mb"))
    assert(percentileCount(twoCols) == 4)
    assert(twoCols.collect().head.toSeq == Seq(2.0, 20.0))
    // an existing array form is left alone
    val arr = df.agg(expr("percentile(a, array(0.25, 0.75))").as("ps"))
    assert(percentileCount(arr) == 2)
    assert(arr.collect().head.getSeq[Double](0) == Seq(1.5, 2.5))
    // a single scalar percentile is untouched
    val one = df.agg(expr("percentile(a, 0.5)").as("m"))
    assert(percentileCount(one) == 2)
    assert(one.collect().head.getDouble(0) == 2.0)
  }

  test("fused and unfused sessions agree on q43's grouped quartile shapes") {
    // mixed percentages per group over real data — values must match the
    // unfused semantics exactly (the DuckDB oracle for q43/q76/q78/q79
    // is the independent referee; here we pin a hand-computed case)
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 4.0),
      ("y", 10.0), ("y", 20.0)).toDF("g", "v")
      .groupBy("g")
      .agg(expr("percentile(v, 0.25)").as("lo"), expr("percentile(v, 0.75)").as("hi"))
    val got = df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map("x" -> ((1.75, 3.25)), "y" -> ((12.5, 17.5))))
  }
}
