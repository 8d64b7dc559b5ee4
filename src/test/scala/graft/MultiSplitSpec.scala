package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.CsvSource

/** The `_row_idx` file-order contract under MULTI-SPLIT reads.
  *
  * `CsvSource.withRowIdx` uses `monotonically_increasing_id`, whose value
  * order across partitions follows partition index. For a single file read
  * as several splits, Spark packs the splits into FilePartitions sorted by
  * length descending — equal-sized splits of one file (all but the last)
  * keep their offset order under a stable sort, which is what makes
  * partition order == file-offset order. That is an implementation detail
  * of FilePartition packing, not a documented contract: this spec forces a
  * small `maxPartitionBytes` so a CSV splits many ways and fails loudly if
  * a Spark upgrade ever changes the packing (round-1 advice + verdict #4).
  */
class MultiSplitSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark

  private def withTinyPartitions[A](bytes: Long)(f: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try f finally spark.conf.set(key, old)
  }

  test("_row_idx follows file order when one CSV splits into many partitions") {
    val dir = java.nio.file.Files.createTempDirectory("multisplit").toFile
    val rows = 5000
    val distinctIds = 97
    val sb = new StringBuilder("person_id,pos\n")
    for (i <- 0 until rows) sb.append(s"p${i % distinctIds},$i\n")
    val file = new java.io.File(dir, "people.csv")
    java.nio.file.Files.writeString(file.toPath, sb.toString)

    withTinyPartitions(2048) {
      val df = CsvSource.read(spark, dir.toString, "people")
      assert(df.rdd.getNumPartitions > 4,
        s"expected a multi-split read, got ${df.rdd.getNumPartitions} partition(s)")

      // global sort by _row_idx must reproduce exact file line order
      val inIdxOrder = df.orderBy(col(CsvSource.RowIdx))
        .select(col("pos")).collect().map(_.getString(0).toInt)
      assert(inIdxOrder.toSeq == (0 until rows),
        s"file order broken: first diffs at ${inIdxOrder.zipWithIndex.find { case (v, i) => v != i }}")

      // first-wins per key must pick the FIRST file occurrence
      val firstWins = df.groupBy(col("person_id"))
        .agg(min(col(CsvSource.RowIdx)).as("m"))
        .join(df, col("m") === col(CsvSource.RowIdx))
        .select(col("pos")).collect().map(_.getString(0).toInt).sorted
      assert(firstWins.toSeq == (0 until distinctIds))
    }
  }

  test("IdAssign ids equal global key-order ranks on shuffled multi-partition input") {
    // pins the monotonically_increasing_id position decode (round 3): ids
    // must equal the rank of the ordering key regardless of input
    // partitioning, AQE range-coalescing, or input row order
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val keys = rnd.shuffle((0L until 10000L).toVector)
    val df = keys.map(k => (k, s"payload$k")).toDF("k", "p").repartition(17)
    val out = graft.ops.IdAssign.withDenseId(df, "id", 100L, col("k"))
      .select(col("k"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 10000)
    out.foreach { case (k, id) => assert(id == 101L + k, s"key $k got id $id") }
  }

  test("v1 duplications golden still matches under multi-split reads") {
    val td = s"${Golden.RefRoot}/tests/test_data/duplications"
    withTinyPartitions(256) {
      Golden.runCase(td, s"$td/transform-rules.json", td,
        Seq("person", "measurement", "observation"))
    }
  }
}
