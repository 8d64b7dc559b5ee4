package graft

/** Dev harness: print the formatted physical plans of named queries
  * (default: the round's new ones) plus an exchange/codegen census —
  * the plan-iteration loop the build brief asks for, runnable any time:
  * sbt "Test/runMain graft.ExplainMain [names...]"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q204_scene_segments", "q206_scene_overlap",
        "q207_crossmodal_audit", "q208_media_card", "q212_dup_consensus")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"==== $n: $exchanges Exchange nodes, $wsc WholeStageCodegen spans ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
