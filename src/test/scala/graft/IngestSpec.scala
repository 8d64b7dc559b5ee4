package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Conform, JsonlSource}

/** JSONL ingest + schema conformance: the boundary between heterogeneous
  * arriving data and the one-layout world downstream operators assume. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("jsonl reads pinned-schema lines; corrupt/missing/extra behave predictably") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val p = dir.resolve("part-0.jsonl")
    java.nio.file.Files.write(p, Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2}""",                                   // missing field -> null
      """{"doc_id": 3, "text": "x", "lang": "en"}""",        // extra field -> ignored
      """{"doc_id": 4, "text" BROKEN"""                      // malformed -> quarantined
    ).asJava, java.nio.charset.StandardCharsets.UTF_8)
    val df = JsonlSource.read(spark, p.toString, docSchema)
    val good = JsonlSource.goodRecords(df)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(good == Map(1L -> Some("hello world"), 2L -> None, 3L -> Some("x")))
    val bad = JsonlSource.badRecords(df).collect()
      .map(_.getAs[String](JsonlSource.CorruptCol)).toSeq
    assert(bad == Seq("""{"doc_id": 4, "text" BROKEN"""))
    // pinning must reject a schema that collides with the corrupt column
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, p.toString,
        docSchema.add(JsonlSource.CorruptCol, StringType))
    }
  }

  test("conform casts, fills missing with typed nulls, drops extras, orders like the target") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("tag", StringType)))
    val in = Seq(("7", "1.5", "junk", "zzz"), ("8", "oops", "junk2", "yyy"))
      .toDF("score_src", "score", "extra", "id")
      .withColumnRenamed("score_src", "ignored")
    val out = Conform.conform(in, target)
    assert(out.columns.toSeq == Seq("id", "score", "tag"))
    val rows = out.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    // "zzz" fails the long try_cast -> null id; "oops" fails the double
    // try_cast -> null score; tag missing entirely -> typed null column
    assert(rows == Set(
      (None, Some(1.5), None),
      (None, None, None)))
    intercept[IllegalArgumentException] {
      Conform.conform(in, target, failOnMissing = true)
    }
    intercept[IllegalArgumentException] {
      Conform.conform(in, target, failOnExtra = true)
    }
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
