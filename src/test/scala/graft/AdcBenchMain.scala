package graft
object AdcBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]").appName("adcbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q66_pq_adc", "q67_ivf_pq", "q69_ivf_pq_residual", "q87_ann_rerank"); r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
