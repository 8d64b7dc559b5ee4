package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev harness for the round-14 optimization loop: time named queries
  * exactly the way Bench does (same session confs, same `.count()` action,
  * min over N runs), print the per-run Spark JOB count (the hidden cost on
  * multi-pass operators — every eager collect/convergence-count is a job),
  * and optionally dump the formatted physical plan per query.
  *
  *   sbt "Test/runMain graft.QBenchMain [--runs N] [--plans DIR[:SUFFIX]] q..."
  *
  * Plans land in DIR/<name>_SUFFIX.txt (default suffix "before").
  */
object QBenchMain {
  def main(args: Array[String]): Unit = {
    var runs = 3
    var plansDir: Option[(String, String)] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--runs" => runs = args(i + 1).toInt; i += 2
        case "--plans" =>
          val parts = args(i + 1).split(":", 2)
          plansDir = Some((parts(0), if (parts.length > 1) parts(1) else "before"))
          i += 2
        case n => names += n; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    println(s"[qbench] loadavg ${Files.readString(Paths.get("/proc/loadavg")).trim}")
    val ordered = names.distinct.sortBy(identity)
    for (name <- ordered) {
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      var bestJobs = -1
      for (r <- 0 until runs) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val c0 = osBean.getProcessCpuTime
        val df = fn(spark, sfDir) // construction: planning + any eager collects
        val tb = (System.nanoTime() - t0) / 1e9
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        Thread.sleep(50) // let the listener bus drain before reading the job count
        val nj = jobs.get()
        if (wall < best) { best = wall; bestJobs = nj }
        println(f"[qbench] $name%-28s run$r wall=$wall%.3f build=$tb%.3f cpu=$cpu%.1f jobs=$nj")
      }
      println(f"[qbench] $name%-28s BEST wall=$best%.3f jobs=$bestJobs")
      plansDir.foreach { case (dir, suffix) =>
        Files.createDirectories(Paths.get(dir))
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(dir, s"${name}_$suffix.txt"), txt)
      }
    }
    println(s"[qbench] loadavg ${Files.readString(Paths.get("/proc/loadavg")).trim}")
    spark.stop()
  }
}
