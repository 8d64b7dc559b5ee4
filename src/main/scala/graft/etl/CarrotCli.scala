package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `carrot-transform run` surface
  * (`tools/args.py:340-395`): rules file + input dir + output dir (+ optional
  * DDL/config overrides, last-used-ids seed, person-ID passthrough,
  * summary threshold).
  *
  * Usage:
  *   runMain graft.etl.CarrotCli \
  *     --rules-file R.json --inputs DIR --output DIR \
  *     [--omop-ddl-file F] [--omop-config-file F] \
  *     [--saved-person-id-file F] [--use-input-person-ids N|Y] \
  *     [--last-used-ids-file F] [--log-file-threshold N] [--sep ,]
  */
object CarrotCli {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") => k -> v }.toMap
    def req(k: String): String = opts.getOrElse(k, sys.error(s"missing required option $k"))

    val rulesFile = req("--rules-file")
    val inputDir  = req("--inputs")
    val outDir    = req("--output")
    val ddlFile   = opts.getOrElse("--omop-ddl-file",
      "/root/reference/carrottransform/config/OMOPCDM_postgresql_5.3_ddl.sql")
    val cfgFile   = opts.getOrElse("--omop-config-file",
      "/root/reference/carrottransform/config/config.json")
    val threshold = opts.getOrElse("--log-file-threshold", "0").toLong
    val usePids   = opts.getOrElse("--use-input-person-ids", "N") != "N"
    val sep       = opts.getOrElse("--sep", ",")

    val lastUsed: Map[String, Long] = opts.get("--last-used-ids-file").map { f =>
      // TSV `table \t last_id`, counters resume at last_id + 1 (S6,
      // person_helpers.py:16-24)
      scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
        val parts = l.split("\t"); parts(0) -> parts(1).trim.toLong
      }.toMap
    }.getOrElse(Map.empty)

    // honor an externally-provided master (spark-submit / cluster); default
    // to all local cores when run standalone
    val master = sys.props.get("spark.master").orElse(sys.env.get("SPARK_MASTER")).getOrElse("local[*]")
    val spark = SparkSession.builder()
      .appName("carrot-transform-spark")
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = OmopSchema.fromFiles(ddlFile, cfgFile)
    val rules  = Rules.fromFile(rulesFile, schema)
    val engine = new CarrotEngine(spark, schema, rules,
      src => CsvSource.read(spark, inputDir, src, sep), usePids, lastUsed,
      personTable = opts.get("--person"))

    TsvSink.writeSingleFile(engine.personIds, s"$outDir/person_ids.tsv")
    for ((target, df) <- engine.runOrdered())
      TsvSink.writeSingleFile(df, s"$outDir/$target.tsv")
    TsvSink.writeSingleFile(engine.summary(threshold), s"$outDir/summary_mapstream.tsv")

    spark.stop()
  }
}
