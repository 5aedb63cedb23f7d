package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Enrich, Exporter, JobConfig, Pipeline, TranscriptJob}
import graft.sinks.GraftTable
import graft.sources.Transcripts
import graft.streaming.{MeterDelta, StreamJobs}

/** End-to-end: transcripts -> pipeline -> enrich -> fan-out sinks, plus the
  * streaming variants and the scaling invariants (stable ordering, per-sink
  * counts).
  */
class PipelineE2ESpec extends SparkSuite {
  import spark.implicits._

  private lazy val transcripts = Transcripts.generate(spark, nConvs = 300, seed = 42L)

  test("generator is deterministic and Zipf-skewed") {
    val a = transcripts.agg(sum(xxhash64($"conv_id", $"turn_idx", $"text"))).as[Long].collect().head
    val b = Transcripts.generate(spark, 300, 42L)
      .agg(sum(xxhash64($"conv_id", $"turn_idx", $"text"))).as[Long].collect().head
    assert(a == b)
    val sizes = transcripts.groupBy("conv_id").count().select(max("count"), min("count"))
      .collect().head
    assert(sizes.getLong(0) > 20 * sizes.getLong(1)) // heavy tail present
  }

  test("enrich attaches role lookup + first-match tool glob rules") {
    val logs = Transcripts.toLogFrame(transcripts)
    val enriched = Enrich.roleToolEnrich(logs)
    val row = enriched.filter($"role" === "assistant").select(
      $"attributes_string".getItem("actor_kind"),
      $"attributes_string".getItem("direction")).collect().head
    assert(row.getString(0) == "model" && row.getString(1) == "outbound")
    val toolRow = enriched.filter($"tool" === "bash").select(
      $"attributes_string".getItem("tool_class"),
      $"attributes_string".getItem("tool_risk")).collect().head
    assert(toolRow.getString(0) == "shell" && toolRow.getString(1) == "high")
    // rows without a tool get no tool_class
    val noTool = enriched.filter($"tool" === "")
      .filter(map_contains_key($"attributes_string", "tool_class")).count()
    assert(noTool == 0)
  }

  test("glob translation (path.Match semantics)") {
    assert("browser_v2".matches(Enrich.globToRegex("browser*")))
    assert(!"web/browser".matches(Enrich.globToRegex("browser*"))) // * doesn't cross '/'
    assert("a.c".matches(Enrich.globToRegex("a?c")))
    assert(!"abc".matches(Enrich.globToRegex("a.c"))) // literal dot escaped
  }

  test("full job: 5 sinks committed with lineage; stable turn ordering") {
    val dir = java.nio.file.Files.createTempDirectory("graft-job").toString
    val counts = TranscriptJob.run(spark, transcripts, dir,
      SparkEntry.transcriptPipeline, JobConfig(layoutPartitions = 4))
    assert(counts("logs_v2") == transcripts.count()) // every turn lands (default route)
    assert(counts("logs_v2_resource") > 0 && counts("tag_attributes_v2") > 0)
    assert(counts("logs_attribute_keys") > 0 && counts("logs_resource_keys") > 0)

    // stable-ordering invariant: within every file, read order == sorted
    // order by (conv_id, turn_idx)
    val main = GraftTable.read(spark, s"$dir/logs_v2")
    import org.apache.spark.sql.expressions.Window
    val byFile = main.withColumn("file", input_file_name())
      .withColumn("seq", monotonically_increasing_id())
    val wRead = Window.partitionBy("file").orderBy("seq")
    val wSort = Window.partitionBy("file").orderBy("conv_id", "turn_idx")
    val disorder = byFile
      .withColumn("r1", row_number().over(wRead))
      .withColumn("r2", row_number().over(wSort))
      .filter($"r1" =!= $"r2").count()
    assert(disorder == 0)

    // per-turn text equality under (conv_id, turn_idx): body == input text
    val joined = main.select($"conv_id", $"turn_idx", $"body")
      .join(transcripts.select($"conv_id", $"turn_idx", $"text"), Seq("conv_id", "turn_idx"))
    assert(joined.filter($"body" =!= $"text").count() == 0)
    assert(joined.count() == transcripts.count())

    // resume: re-running writes nothing new for completed route partitions
    val counts2 = TranscriptJob.run(spark, transcripts, dir,
      SparkEntry.transcriptPipeline, JobConfig(layoutPartitions = 4), resume = true)
    assert(counts2("logs_v2") == counts("logs_v2"))
  }

  test("streaming: same pipeline over readStream + windowed meter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    transcripts.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(transcripts.schema).parquet(dir)
    val main = StreamJobs.pipelineStream(stream, SparkEntry.transcriptPipeline)
    assert(main.isStreaming)
    val meter = StreamJobs.meter(main, "30 minutes", "10 minutes")
    val q = meter.writeStream.outputMode("update")
      .format("memory").queryName("graft_meter_test").start()
    try {
      q.processAllAvailable()
      val agg = spark.sql(
        "SELECT sum(n_records) FROM graft_meter_test").as[Long].collect().head
      assert(agg == transcripts.count())
    } finally q.stop()
  }

  test("streaming sessionization: out-of-order turns merge into their " +
      "session; watermark finalizes and emits closed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val turns = in.toDF().toDF("conv_id", "turn_idx", "sec")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L)).drop("sec")
    val sessions = StreamJobs.sessionStream(turns, gap = "600 seconds",
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions").start()
    try {
      // batch 1: conv 1 turns at 0s/30s, conv 2 at 10s
      in.addData(Seq((1L, 0L, 0L), (1L, 1L, 30L), (2L, 0L, 10L)))
      q.processAllAvailable()
      assert(spark.table("graft_sessions").count() == 0) // nothing closed yet
      // batch 2: conv 1 turn 3 opens a NEW session at 700s (gap 670 > 600)
      // AND the late turn 2 at 60s arrives out of order, merging into the
      // still-open first session. The 700s turn advances the watermark to
      // 700, which finalizes conv 1's first session ([0, 660)) and
      // conv 2's ([10, 610)) — processAllAvailable runs the follow-up
      // micro-batch that emits them.
      in.addData(Seq((1L, 3L, 700L), (1L, 2L, 60L)))
      q.processAllAvailable()
      assert(spark.table("graft_sessions").count() == 2)
      // a watermark-advancing turn finalizes conv 1's 700s restart too
      in.addData(Seq((9L, 0L, 5000L)))
      q.processAllAvailable()
      val got = spark.table("graft_sessions")
        .orderBy("conv_id", "start_epoch_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getAs[Long]("duration_us"))).toSeq
      assert(got == Seq(
        (1L, 3L, 0L, 2L, 60000000L),   // 0s..60s incl. the late turn
        (1L, 1L, 3L, 3L, 0L),          // the 700s restart
        (2L, 1L, 0L, 0L, 0L)))
      // conv 9's session is still open — not emitted in append mode
      assert(!got.exists(_._1 == 9L))
    } finally q.stop()
  }

  test("meter delta-flush: per-trigger deltas sum to the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (route, record_size) rows fed over 3 micro-batches = 3 flush ticks
    val in = MemoryStream[(String, Long)]
    val logsShaped = in.toDF().toDF("route", "record_size")
    // stateTtl = None here ONLY because a live ProcessingTimeTimeout query
    // re-runs empty batches to service timers, livelocking
    // processAllAvailable; the default (TTL on) path is asserted in the
    // "meter delta state TTL" test below via TestGroupState
    val deltas = StreamJobs.meterDeltas(logsShaped, dimCols = Seq("route"),
      stateTtl = None)
    val q = deltas.writeStream.outputMode("append")
      .format("memory").queryName("graft_meter_deltas").start()
    val batches = Seq(
      Seq(("r1", 10L), ("r1", 20L), ("r2", 5L)),
      Seq(("r1", 1L)),
      Seq(("r2", 7L), ("r2", 8L)))
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val rows = spark.table("graft_meter_deltas")
        .orderBy("dimensions", "cumulative_count").collect()
      // r1: flush1 (2 records, 30 bytes), flush2 (1, 1); r2: flush1 (1, 5),
      // flush3 (2, 15) — a tick with no data for a key emits nothing
      val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
      assert(got == Seq(
        ("r1", 2L, 30L, 2L, 30L),
        ("r1", 1L, 1L, 3L, 31L),
        ("r2", 1L, 5L, 1L, 5L),
        ("r2", 2L, 15L, 3L, 20L)))
      // delta temporality: per-key deltas sum to the plain batch aggregate
      val all = batches.flatten
      for (k <- Seq("r1", "r2")) {
        val deltaSum = got.filter(_._1 == k).map(_._3).sum
        assert(deltaSum == all.filter(_._1 == k).map(_._2).sum)
        assert(got.filter(_._1 == k).map(_._2).sum == all.count(_._1 == k))
      }
    } finally q.stop()
  }

  test("meterConnectorStream: resource-dim keyed signoz.meter.log.* frames per flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Map[String, String], Long)]
    val logsShaped = in.toDF().toDF("resources_string", "record_size")
    val frames = StreamJobs.meterConnectorStream(logsShaped, Seq("role"), "cid-9",
      stateTtl = None) // None: live-timer livelock, see delta-flush test note
    val q = frames.writeStream.outputMode("append")
      .format("memory").queryName("graft_meter_frames").start()
    try {
      in.addData(Seq(
        (Map("role" -> "user"), 10L),
        (Map("role" -> "user"), 20L),
        (Map("other" -> "x"), 5L))) // role absent -> empty attrs key
      q.processAllAvailable()
      val rows = spark.table("graft_meter_frames").collect()
        .map(r => (r.getAs[String]("metric_name"), r.getAs[Map[String, String]]("attrs"),
          r.getAs[Double]("value"), r.getAs[String]("temporality"),
          r.getAs[Map[String, String]]("scope_attrs"))).toSet
      assert(rows == Set(
        ("signoz.meter.log.count", Map("role" -> "user"), 2.0, "Delta", Map("connector_id" -> "cid-9")),
        ("signoz.meter.log.size", Map("role" -> "user"), 30.0, "Delta", Map("connector_id" -> "cid-9")),
        ("signoz.meter.log.count", Map.empty[String, String], 1.0, "Delta", Map("connector_id" -> "cid-9")),
        ("signoz.meter.log.size", Map.empty[String, String], 5.0, "Delta", Map("connector_id" -> "cid-9"))))
    } finally q.stop()
  }

  test("meter delta state TTL: idle dimension keys are evicted on timeout") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // the DEFAULT path must be the evicting one (reference purges state at
    // every flush; unbounded retention is the opt-in deviation)
    assert(StreamJobs.DefaultStateTtl.isDefined)
    val fn = StreamJobs.meterDeltaFn(StreamJobs.DefaultStateTtl)
    // batch 1: key gets data -> delta emitted, state kept, timeout armed
    val live = TestGroupState.create[(Long, Long)](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    val out1 = fn(Seq("r1"), Iterator((Seq("r1"), 10L), (Seq("r1"), 20L)), live).toSeq
    assert(out1 == Seq(MeterDelta("r1", 2L, 30L, 2L, 30L)))
    assert(live.get == ((2L, 30L)))
    assert(live.getTimeoutTimestampMs.isPresent) // TTL armed
    // idle timeout tick: state REMOVED (the reference's resetState parity —
    // high-cardinality dimension tuples cannot accumulate forever), nothing
    // emitted
    val timedOut = TestGroupState.create[(Long, Long)](
      optionalState = org.apache.spark.api.java.Optional.of((2L, 30L)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 30 * 60 * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = true)
    assert(fn(Seq("r1"), Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved, "idle state must be evicted")
    // a returning key restarts its cumulative totals from zero
    val reborn = TestGroupState.create[(Long, Long)](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L + 30 * 60 * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    val out2 = fn(Seq("r1"), Iterator((Seq("r1"), 3L)), reborn).toSeq
    assert(out2 == Seq(MeterDelta("r1", 1L, 3L, 1L, 3L)))
    // the None opt-out keeps NoTimeout semantics: no timer is ever armed
    val noTtl = TestGroupState.create[(Long, Long)](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    StreamJobs.meterDeltaFn(None)(Seq("r2"), Iterator((Seq("r2"), 5L)), noTtl)
    assert(!noTtl.isRemoved && noTtl.get == ((1L, 5L)))
  }

  test("probabilistic sampling is deterministic and roughly proportional") {
    val s = StreamJobs.sampleByKey(transcripts, "conv_id", 0.25)
    val n = s.select("conv_id").distinct().count()
    val total = transcripts.select("conv_id").distinct().count()
    assert(n > total / 5 && n < total / 3)
    assert(s.count() == StreamJobs.sampleByKey(transcripts, "conv_id", 0.25).count())
  }

  test("cardinality guard: high-distinct keys land in the skip set") {
    val logs = Transcripts.toLogFrame(transcripts)
      .withColumn("attributes_string",
        map(lit("request_id"), concat(lit("req-"), $"conv_id", $"turn_idx"),
          lit("env"), lit("prod")))
    val main = Exporter.logsV2(logs)
    val tags = Exporter.tagAttributes(main)
    val skip = Exporter.computeSkipKeys(tags, maxDistinctValues = 50)
    assert(skip.contains("request_id:tag:string"))
    assert(!skip.exists(_.startsWith("env:")))
  }

  test("streaming ingest dedup: in-stream, cross-batch, and historical " +
      "duplicates all dropped on the normalized key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // historical corpus keyed by the SAME normalized key as the stream
    val hist = Seq("known alpha doc", "known beta doc").toDF("text")
      .withColumn("nk", graft.ops.TextOps.normalizeForDedup($"text"))
    val filter = graft.ops.Dedup.bloomBuild(hist, textCol = "nk")
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L)).drop("sec")
    val out = StreamJobs.ingestDedupStream(docs, filter,
      watermarkDelay = "600 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_ingest").start()
    try {
      // batch 1: fresh doc, a CASE/punct variant of a historical doc
      // (bloom-dropped via the normalized key), an in-batch duplicate
      in.addData(Seq(
        (1L, "brand new doc", 0L),
        (2L, "Known  ALPHA doc!!", 5L),
        (3L, "brand new doc", 8L)))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate inside the watermark + a fresh doc
      in.addData(Seq(
        (4L, "BRAND new doc?", 20L),
        (5L, "another fresh doc", 30L)))
      q.processAllAvailable()
      // round 6 (ADVICE): flagged rows are EMITTED with maybe_dup=true
      // instead of silently dropped — a Bloom false positive would
      // otherwise be an unrecoverable loss of a genuinely-new document;
      // downstream exact-verifies the flagged sliver (the batch
      // Dedup.bloomIncremental contract).
      val rows = spark.table("graft_ingest").select("doc_id", "maybe_dup")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // one representative of the in-batch pair {1,3} (which one survives
      // is unspecified within a micro-batch) and the fresh doc 5 are
      // definitely-new; the historical variant 2 is emitted FLAGGED;
      // 4 stays watermark-state-dropped
      assert(rows.size == 3 && rows.contains(5L) && rows(5L) == false)
      assert(rows(2L) == true)
      assert((rows.keySet - 5L - 2L).subsetOf(Set(1L, 3L)))
      assert((rows.keySet - 5L - 2L).forall(rows(_) == false))
    } finally q.stop()
  }
}
