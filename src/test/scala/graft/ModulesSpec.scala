package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._
import graft.ops.Sessionize
import graft.streaming.EventStream

/** Specs for the JDBC facade (embedded Derby), streaming sessionization
  * (batch-mode flatMapGroupsWithState vs the window-function formulation),
  * the multi-source-person validation, and last-used-ids seeding. */
class ModulesSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  test("jdbc round-trip via embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Seq(("1", "alpha"), ("2", ""), ("3", "gamma")).toDF("ID", "NAME")
    Jdbc.writeTable(df, url, "People")
    val back = Jdbc.readTable(spark, url, "PEOPLE")
    assert(back.columns.toSeq == Seq("id", "name"))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq("1", "alpha"), Seq("2", ""), Seq("3", "gamma")))
  }

  test("streaming sessionize agrees with the batch window formulation") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:10:00", 2.0),
      (1L, "2024-01-01 02:00:00", 3.0), // > 30 min gap -> new session
      (2L, "2024-01-01 00:00:00", 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("event_id", col("value").cast("long"))

    val batch = Sessionize.sessionStats(events, "user_id", "ts", "event_id", "value", 1800L)
      .select("user_id", "n_events", "sum_value").orderBy("user_id", "n_events")
      .collect().map(_.toSeq).toSeq

    val ds = events.select(col("user_id"), col("ts"), col("value")).as[EventStream.Event]
    // batch-mode flatMapGroupsWithState never times out, so the final open
    // session per user stays in state; compare the CLOSED session plus
    // reconstruct totals
    val streamed = EventStream.sessionize(ds, 1800L * 1000).collect()
    assert(streamed.map(s => (s.user_id, s.n_events, s.sum_value)).toSet ==
      Set((1L, 2L, 3.0))) // the closed first session of user 1
    assert(batch == Seq(Seq(1L, 1L, 3.0), Seq(1L, 2L, 3.0), Seq(2L, 1L, 5.0)))
  }

  test("windowed streaming aggregation over a memory stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val df = mem.toDF().toDF("ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val agg = EventStream.windowedAgg(df, "10 minutes", "5 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("winagg").start()
    mem.addData(("2024-01-01 00:01:00", "click", 1.0), ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:07:00", "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("winagg").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet ==
      Set(("click", 2L), ("view", 1L)))
  }

  test("stream-static enrichment joins each microbatch against the dim, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val q = EventStream.enrich(stream, dim, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    mem.addData((1L, 10.0), (2L, 20.0), (3L, 30.0)) // user 3 not in dim
    q.processAllAvailable()
    mem.addData((1L, 11.0))                          // second microbatch
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    q.stop()
    assert(rows == Set((1L, 10.0, "gold"), (2L, 20.0, "free"), (1L, 11.0, "gold")))
    // stateless: the progress log reports no state store rows
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
  }

  test("outlier gate: history-trained fences filter the stream, stateless, unseen keys pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // history for key "a": 1..11 and 100 → fences [-4.5, 17.5] (q76's arithmetic)
    val history = ((1 to 11).map(v => ("a", v.toDouble)) :+ ("a", 100.0)).toDF("k", "v")
    val mem = MemoryStream[(String, Double)]
    val stream = mem.toDF().toDF("k", "v")
    val q = EventStream.outlierGate(stream, history, "k", "v")
      .writeStream.outputMode("append").format("memory").queryName("gated").start()
    mem.addData(("a", 5.0), ("a", 50.0), ("b", 999.0)) // 50 anomalous; "b" has no history
    q.processAllAvailable()
    val kept = spark.table("gated").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(kept == Set(("a", 5.0), ("b", 999.0)))
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    q.stop()
    // alerting flavor: only the anomaly survives
    val mem2 = MemoryStream[(String, Double)]
    val q2 = EventStream.outlierGate(mem2.toDF().toDF("k", "v"), history, "k", "v",
        keep = "outliers")
      .writeStream.outputMode("append").format("memory").queryName("alerts").start()
    mem2.addData(("a", 5.0), ("a", 50.0), ("b", 999.0))
    q2.processAllAvailable()
    val alerts = spark.table("alerts").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    q2.stop()
    assert(alerts == Set(("a", 50.0)))
  }

  test("bloom gate: stateless row-local front door, history dups dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val history = (0 until 100).map(i => (i.toLong, s"seen document $i body"))
      .toDF("id", "text")
    val bloom = graft.ops.Dedup.bloomSnapshot(history, "text",
      expectedItems = 100, fpp = 0.001)
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.bloomGateStream(mem.toDF().toDF("id", "text"), "text", bloom)
      .writeStream.outputMode("append").format("memory").queryName("bloomed").start()
    mem.addData((1000L, "seen document 7 body"), (1001L, "genuinely new content one"),
      (1002L, "seen document 42 body"), (1003L, "genuinely new content two"))
    q.processAllAvailable()
    val kept = spark.table("bloomed").collect().map(_.getLong(0)).toSet
    // both dups definitively dropped (no false negatives); at fpp 1e-3 the
    // two novel docs pass (a flake here would be a 1-in-500k event)
    assert(kept == Set(1001L, 1003L))
    // stateless: no state store rows
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    q.stop()
  }

  test("foreachBatch sink runs batch operators per microbatch, idempotent dirs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.sinkBatches(mem.toDF().toDF("k", "text"), out, ckpt) {
      batch => batch.dropDuplicates("k") // any batch operator composes here
    }
    mem.addData((1L, "a"), (1L, "a-dup"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out).select("k").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L)) // in-batch dup dropped, batches appended
  }

  test("streaming funnel emits progress rows and agrees with the batch funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[(Long, String, String)]
    val ds = mem.toDF().toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[EventStream.TypedEvent]
    val q = EventStream.funnelStream(ds, steps, maxGapSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory").queryName("funnel").start()
    // batch 1: u1 view+click; u2 click only (reached 0); u3 nothing relevant
    mem.addData((1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-01 00:10:00", "click"),
      (2L, "2024-01-01 00:00:00", "click"), (3L, "2024-01-01 00:00:00", "error"))
    q.processAllAvailable()
    // batch 2: u1 purchases INSIDE the window and completes; u2 views
    // (progress 0 → 1 emits); a u1 click re-arrival changes nothing (no row)
    mem.addData((1L, "2024-01-01 00:30:00", "purchase"), (1L, "2024-01-01 00:31:00", "click"),
      (2L, "2024-01-01 00:40:00", "view"))
    q.processAllAvailable()
    val rows = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    q.stop()
    // progress log: u1 1→2 within batch 1 emits once (final state of the
    // batch), then 3 on completion; u2 emits 0 then 1; u3 never appears
    assert(rows.sorted == Seq((1L, 2), (1L, 3), (2L, 0), (2L, 1)))
    // final per-user state equals the batch operator over the full history
    val all = Seq(
      (1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-01 00:10:00", "click"),
      (2L, "2024-01-01 00:00:00", "click"), (3L, "2024-01-01 00:00:00", "error"),
      (1L, "2024-01-01 00:30:00", "purchase"), (1L, "2024-01-01 00:31:00", "click"),
      (2L, "2024-01-01 00:40:00", "view"))
      .toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val batchFinal = Sessionize.funnel(all, "user_id", "ts", "event_type",
        steps, maxGapSeconds = Some(3600L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamFinal = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(streamFinal == batchFinal)
  }

  test("streaming dedup drops later duplicates and keeps state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val df = mem.toDF().toDF("doc_id", "ts_s", "text")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val deduped = EventStream.dedupStream(
      EventStream.qualityGate(df, "text", minTokens = 2), "ts", Seq("fp"), "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedupstream").start()
    mem.addData(
      (1L, "2024-01-01 00:00:00", "the quick brown fox"),
      (2L, "2024-01-01 00:01:00", "the quick brown fox"),  // dup of 1
      (3L, "2024-01-01 00:02:00", "an entirely different doc"),
      (4L, "2024-01-01 00:03:00", "x"))                    // fails quality gate
    q.processAllAvailable()
    mem.addData((5L, "2024-01-01 00:04:00", "the quick brown fox")) // dup, later batch
    q.processAllAvailable()
    val ids = spark.table("dedupstream").select("doc_id").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 3L))
  }

  test("event-time sessionize closes a session without a later event for its key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val ds = mem.toDF().toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("value")).as[EventStream.Event]
    val sessions = EventStream.sessionizeEventTime(ds, gapMs = 30000L)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("etsess").start()
    // batch 1: user 1's only activity — two events 10s apart
    mem.addData((1L, "2024-01-01 00:00:10", 1.0), (1L, "2024-01-01 00:00:20", 2.0))
    q.processAllAvailable()
    assert(spark.table("etsess").isEmpty) // session still open
    // batches 2+3: OTHER-key events push the watermark past user 1's
    // last + gap (00:00:50); user 1 never sends another event
    mem.addData((2L, "2024-01-01 00:05:00", 9.0))
    q.processAllAvailable()
    mem.addData((2L, "2024-01-01 00:10:00", 9.0))
    q.processAllAvailable()
    val rows = spark.table("etsess")
      .select("user_id", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    // user 1's session closed with NO later user-1 event (the point of the
    // test); user 2's first session closed by its own second event's gap cut
    assert(rows.toSet == Set((1L, 2L, 3.0), (2L, 1L, 9.0)))
  }

  test("multi-source person rules abort (mireda_key_error)") {
    val td  = s"${Golden.RefRoot}/tests/test_data/mireda_key_error"
    val err = intercept[IllegalArgumentException] {
      val rules = Rules.fromFile(s"$td/original_rules.json", Golden.schema)
      new CarrotEngine(spark, Golden.schema, rules,
        src => CsvSource.read(spark, td, src),
        personTable = Some("demographics_mother_gold"))
    }
    assert(err.getMessage.contains("can only come from the person file"))
    assert(err.getMessage.contains("demographics_child_gold.csv"))
  }

  test("stream-stream interval join pairs events within the delay bound only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, String)]
    val buys   = MemoryStream[(Long, String)]
    val l = clicks.toDF().toDF("uid", "cts_s").withColumn("cts", to_timestamp(col("cts_s")))
    val r = buys.toDF().toDF("buid", "bts_s").withColumn("bts", to_timestamp(col("bts_s")))
    val joined = EventStream.intervalJoin(l, "uid", "cts", r, "buid", "bts", "5 minutes")
      .select("uid", "cts_s", "bts_s")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ivjoin").start()
    clicks.addData((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:00"))
    buys.addData(
      (1L, "2024-01-01 00:03:00"),  // within 5 min of user 1's click
      (1L, "2024-01-01 00:09:00"),  // too late
      (2L, "2023-12-31 23:59:00"))  // before the click
    q.processAllAvailable()
    val rows = spark.table("ivjoin").collect().map(r => (r.getLong(0), r.getString(2)))
    q.stop()
    assert(rows.toSet == Set((1L, "2024-01-01 00:03:00")))
  }

  test("KMeans-trained IVF probing all cells equals exact search") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
    val cents = graft.ops.Similarity.ivfTrain(emb, "embedding", nCentroids = 4)
    assert(cents.count() == 4)
    // nProbe == nCentroids degrades IVF to exact search: per query, the
    // result must equal brute-force top-k
    def n(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue()
    val ivf = graft.ops.Similarity.ivfTopKWith(cents, emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", nProbe = 4, k = 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (n(r, 0), n(r, 1))).toSet
    val brute = queries.select(col("vec_id").as("qid"), col("embedding").as("qv")).collect().flatMap { qr =>
      graft.ops.Similarity.topK(
          emb.filter(col("vec_id") =!= n(qr, 0)), "vec_id", "embedding",
          spark.createDataFrame(java.util.List.of(qr), qr.schema).select(col("qv")), "qv", 5)
        .collect().map(r => (n(qr, 0), n(r, 0)))
    }.toSet
    assert(ivf == brute)
  }

  test("person mapped from a table that is not --person aborts (wrong-person-table)") {
    // reference tests/test_args.py:87-111 (WrongInputException)
    val rules = Rules.fromFile(
      s"${Golden.RefRoot}/tests/test_data/wrong-person-table-rules.json", Golden.schema)
    val err = intercept[IllegalArgumentException] {
      new CarrotEngine(spark, Golden.schema, rules,
        src => sys.error("unused"),
        personTable = Some("demographics_mother_gold.csv"))
    }
    assert(err.getMessage.contains("can only come from the person file"))
    assert(err.getMessage.contains("src_PERSON.csv"))
  }

  test("rules with no person mappings abort") {
    // reference tests/test_data/args/no-person-rules.json (NoPersonMappings)
    val rules = Rules.fromFile(
      s"${Golden.RefRoot}/tests/test_data/args/no-person-rules.json", Golden.schema)
    val err = intercept[RuntimeException] {
      new CarrotEngine(spark, Golden.schema, rules, src => sys.error("unused"))
    }
    assert(err.getMessage.contains("no person table mapping"))
  }

  test("SQL functions registered via SparkSessionExtensions") {
    // exercise the injection wiring, then register on the live session's
    // registry the same way withExtensions would at session build
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.NGramShingles].getName, "ngram_shingles"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NGramShingles(args.head,
          args(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value.asInstanceOf[Int]))
    val r = spark.sql("SELECT ngram_shingles('a b c d', 2) AS sh").collect()(0).getSeq[String](0)
    assert(r == Seq("a b", "b c", "c d"))
  }

  test("use-input-person-ids passes source IDs through") {
    val td = s"${Golden.RefRoot}/tests/test_data/integration_test1"
    val rules = Rules.fromFile(s"${Golden.RefRoot}/tests/test_V2/rules-v2.json", Golden.schema)
    val eng = new CarrotEngine(spark, Golden.schema, rules,
      src => CsvSource.read(spark, td, src), useInputPersonIds = true)
    val ids = eng.personLookup.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ids("321") == "321" && ids("289") == "289")
    val pids = eng.run()("person").select("person_id").collect().map(_.getString(0)).toSet
    assert(pids.subsetOf(Set("321", "789345", "6789", "289")))
  }

  test("last-used-ids seed offsets auto-numbering") {
    val td = s"${Golden.RefRoot}/tests/test_data/integration_test1"
    val rules = Rules.fromFile(s"${Golden.RefRoot}/tests/test_V2/rules-v2.json", Golden.schema)
    val eng = new CarrotEngine(spark, Golden.schema, rules,
      src => CsvSource.read(spark, td, src), lastUsedIds = Map("measurement" -> 100L))
    val ids = eng.run()("measurement").select(col("measurement_id").cast("long")).collect().map(_.getLong(0)).sorted
    assert(ids.head == 101L && ids.length == 4)
  }

  test("budget gate: streaming admissions equal batch per-group selection across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream.BudgetDoc
    implicit val sq = spark.sqlContext
    val budgets = Map("en" -> 10L, "de" -> 3L) // "fr" absent → admits nothing
    val mem = MemoryStream[BudgetDoc]
    val q = EventStream.budgetGate(mem.toDS(), budgets)
      .writeStream.outputMode("append").format("memory").queryName("budgetgate").start()
    mem.addData(BudgetDoc("en", 1L, 4L), BudgetDoc("en", 2L, 5L),
      BudgetDoc("de", 1L, 2L), BudgetDoc("fr", 1L, 1L))
    q.processAllAvailable()
    // en doc 3 overflows (9+2>10) and CLOSES the group: doc 4 would fit
    // under first-fit but the batch prefix rule rejects it
    mem.addData(BudgetDoc("en", 3L, 2L), BudgetDoc("en", 4L, 1L), BudgetDoc("de", 2L, 1L))
    q.processAllAvailable()
    // zero-cost docs: fit an exactly-spent open group, never a closed one
    mem.addData(BudgetDoc("de", 3L, 0L), BudgetDoc("en", 5L, 0L))
    q.processAllAvailable()
    val admitted = spark.table("budgetgate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // per-group state is two scalars: one state row per group seen
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal <= 3))
    q.stop()
    assert(admitted == Set(("en", 1L, 4L), ("en", 2L, 9L),
      ("de", 1L, 2L), ("de", 2L, 3L), ("de", 3L, 3L)))

    // the batch operator on the union, ranked by arrival (doc_id), must
    // select the identical documents
    val docs = Seq(("en", 1L, 4L), ("en", 2L, 5L), ("de", 1L, 2L), ("fr", 1L, 1L),
      ("en", 3L, 2L), ("en", 4L, 1L), ("de", 2L, 1L), ("de", 3L, 0L), ("en", 5L, 0L))
      .toDF("group", "doc_id", "cost")
    val batch = graft.ops.BudgetSelect.selectByBudgetPerGroup(
        docs, "group", "cost", budgets, col("doc_id").asc)
      .select("group", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batch == admitted.map(t => (t._1, t._2)))
  }
}
