package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: split a query's wall time into plan (analysis + optimization
  * + physical planning) vs execution, twice per query to separate warm-up
  * from the steady state Bench's min-of-3 reports.
  *
  * Usage: sbt "Test/runMain graft.ProfMain q25_ann_lsh q22_sessionize"
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names; i <- 0 until 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"PROF $q run$i build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
