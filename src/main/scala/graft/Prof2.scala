package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

// temporary micro-profiling — not library surface
object Prof2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val cust = spark.read.parquet(s"$dir/customer.parquet").select(
      col("c_custkey").cast("string").as("person_id"),
      concat(lit("19"), lpad((col("c_custkey") % 80 + 10).cast("string"), 2, "0"),
        lit("-01-15")).as("birth_datetime"),
      col("c_custkey").cast("long").as("_row_idx")).repartition(1).cache()
    t("cache fill") { cust.count() }
    t("plain count (1 part)") { cust.count() }
    t("+ trim filter") { cust.filter(trim(col("person_id")) =!= "").count() }
    val sd = graft.functions.DateNorm.strictDate(col("birth_datetime"))
    t("+ strictDate filter") { cust.filter(sd.isNotNull).count() }
    t("+ strictDate filter again") { cust.filter(sd.isNotNull).count() }
    t("strictDate as col") { cust.select(sd.as("d")).count() }
    val w = Window.partitionBy(col("person_id")).orderBy(col("_row_idx"))
    t("+ window dedupe") {
      cust.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).count()
    }
    val n8 = graft.functions.DateNorm.normalise8601(col("birth_datetime"))
    t("normalise8601 select") { cust.select(n8.as("n")).count() }
    spark.stop()
  }
}
