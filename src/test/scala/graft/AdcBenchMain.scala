package graft

/** Quiet-window (wall, cpu) pin for the ADC query family — the round-10
  * regression watch: q66/q87 best-run CPU grew ~8× round-over-round in the
  * official bench while wall stayed sub-second, and nothing distinguished
  * "co-tenant steal charged to process CPU" from "the plan got hungrier at
  * equal wall". This main measures both per run so the episode signature
  * (cpu ≫ quiet-window cpu at similar wall) is decidable; run it when
  * loadavg is low and record the min row in BASELINE.md.
  */
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
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val load1 = osBean.getSystemLoadAverage
    println(f"loadavg at start: $load1%.1f (quiet window = single digits)")
    val best = scala.collection.mutable.Map.empty[String, (Double, Double)]
    for (q <- Seq("q66_pq_adc", "q67_ivf_pq", "q69_ivf_pq_residual", "q87_ann_rerank"); r <- 1 to 3) {
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      if (best.get(q).forall(_._1 > wall)) best(q) = (wall, cpu)
      println(f"$q run$r: wall $wall%.2f s, cpu $cpu%.2f s")
    }
    for ((q, (w, c)) <- best.toSeq.sortBy(_._1))
      println(f"BEST $q: wall $w%.2f s, cpu $c%.2f s, cpu/wall ${c / w}%.1f")
    spark.stop()
  }
}
