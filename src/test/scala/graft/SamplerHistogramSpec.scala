package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Histogram
import graft.streaming.TailSampler
import graft.streaming.TailSampler.{NumericFilter, Policy, StringFilter}

/** Golden tests for the tail-sampler policy tree (mirroring
  * `signoztailsampler/evaluator_test.go` cases), the exponential histogram,
  * HexToInt, and the metadata flattener's array-index rule.
  */
class SamplerHistogramSpec extends SparkSuite {
  import spark.implicits._

  private def rows(attrs: Map[String, String]*): org.apache.spark.sql.DataFrame =
    graft.model.LogFrames.withDefaults(
      attrs.zipWithIndex.map { case (m, i) =>
        (s"c$i", i, f"deadbeefdeadbeefdeadbeefdeadbe$i%02x", m)
      }.toDF("conv_id", "turn_idx", "trace_id", "attributes_string"))

  private def decide(policies: Seq[Policy], attrs: Map[String, String]*): Seq[Int] =
    rows(attrs: _*).select(TailSampler.decision(policies,
      col("trace_id"), col("attributes_string"), col("attributes_number")).as("d"))
      .collect().toSeq.map(_.getInt(0))

  test("policy filter gates sampling; no match -> NoResult -> default sample") {
    // TestEvalPolicy: source=unknown, 100% -> Sampled when attr matches
    val p = Policy("test-policy", samplingPercentage = 100,
      stringFilters = Seq(StringFilter("source", Seq("unknown"))))
    // matching trace -> sampled by the policy; non-matching -> NoResult ->
    // processor default (sample) — assert via evaluate() directly
    val d = rows(Map("source" -> "unknown"), Map("source" -> "other"))
      .select(TailSampler.evaluate(p, col("trace_id"),
        col("attributes_string"), col("attributes_number")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(d == Seq(1, -1))
  }

  test("sampling percentage 0 -> NotSampled, 100 -> Sampled (TestEvalPolicyWithZeroPercent)") {
    def p(pct: Double) = Policy("p", pct,
      stringFilters = Seq(StringFilter("source", Seq("unknown"))))
    assert(decide(Seq(p(100)), Map("source" -> "unknown")) == Seq(1))
    assert(decide(Seq(p(0)), Map("source" -> "unknown")) == Seq(0))
    // 99%: overwhelmingly sampled (the reference test accepts rare misses)
    val many = (0 until 50).map(_ => Map("source" -> "unknown"))
    val sampled = decide(Seq(p(99)), many: _*).count(_ == 1)
    assert(sampled >= 45)
  }

  test("sub-policy wins over root sampler (TestEvalSubPolicy)") {
    val root = Policy("root", samplingPercentage = 0,
      stringFilters = Seq(StringFilter("source", Seq("unknown"))),
      subPolicies = Seq(
        Policy("sub", samplingPercentage = 100,
          stringFilters = Seq(StringFilter("host", Seq("hostA"))))))
    // sub matches -> Sampled; sub misses -> root's 0% -> NotSampled
    assert(decide(Seq(root),
      Map("source" -> "unknown", "host" -> "hostA"),
      Map("source" -> "unknown", "host" -> "other")) == Seq(1, 0))
  }

  test("filterOp AND: any failed filter -> NoResult (TestEvalPolicyWithAndFilter)") {
    val root = Policy("root", samplingPercentage = 0,
      stringFilters = Seq(StringFilter("source", Seq("unknown"))),
      subPolicies = Seq(
        Policy("sub", samplingPercentage = 100, filterOp = "and",
          stringFilters = Seq(
            StringFilter("host", Seq("hostA")),
            StringFilter("region", Seq("us-east-1"))))))
    assert(decide(Seq(root),
      Map("source" -> "unknown", "host" -> "hostA", "region" -> "us-east-1"),
      Map("source" -> "unknown", "host" -> "hostA"), // missing region -> sub NoResult
      Map("source" -> "unknown", "host" -> "other", "region" -> "us-east-1")
    ) == Seq(1, 0, 0))
  }

  test("priority orders sub-policies; numeric filter; invert match") {
    val root = Policy("root", samplingPercentage = 0,
      stringFilters = Seq(StringFilter("source", Seq("unknown"))),
      subPolicies = Seq(
        Policy("low", samplingPercentage = 0, priority = 2,
          stringFilters = Seq(StringFilter("env", Seq("prod")))),
        Policy("high", samplingPercentage = 100, priority = 1,
          stringFilters = Seq(StringFilter("env", Seq("prod"))))))
    // both subs match; priority 1 wins -> Sampled
    assert(decide(Seq(root), Map("source" -> "unknown", "env" -> "prod")) == Seq(1))

    val num = Policy("n", samplingPercentage = 100,
      numericFilters = Seq(NumericFilter("status", 400, 599)))
    val df = graft.model.LogFrames.withDefaults(Seq(
      ("c0", 0, "aa", Map("status" -> 404.0)),
      ("c1", 1, "bb", Map("status" -> 200.0)))
      .toDF("conv_id", "turn_idx", "trace_id", "attributes_number"))
    val d = df.select(TailSampler.evaluate(num, col("trace_id"),
      col("attributes_string"), col("attributes_number")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(d == Seq(1, -1))

    val inv = Policy("i", samplingPercentage = 100,
      stringFilters = Seq(StringFilter("source", Seq("internal"), invert = true)))
    val dInv = rows(Map("source" -> "internal"), Map("source" -> "ext"))
      .select(TailSampler.evaluate(inv, col("trace_id"),
        col("attributes_string"), col("attributes_number")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(dInv == Seq(-1, 1)) // inverted: matches everything EXCEPT internal
  }

  test("probabilistic threshold matches Go big.Float scaling") {
    assert(TailSampler.thresholdBits(100.0) == -1L) // MaxUint64
    assert(TailSampler.thresholdBits(50.0) == Long.MaxValue) // 2^63 - 1 (floor)
    assert(TailSampler.thresholdBits(0.0) == 0L)
  }

  test("exponential histogram: hand-computed buckets") {
    // values 1..8 for one key; min=1, max=8 -> span=3 octaves;
    // scale = floor(log2(159/3)) = 5; index = ceil(log2(v)*32) - 1
    val df = Seq(1.0, 2.0, 3.0, 4.0, 8.0, 0.0, -1.0).map(("k", _)).toDF("key", "v")
    val out = Histogram.exponential(df, col("v"), Seq("key"))
      .collect().map(r => (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toMap
    val scale = Histogram.exponential(df, col("v"), Seq("key"))
      .select("scale").head().getInt(0)
    assert(scale == 5)
    def idx(v: Double): Long =
      math.ceil(math.log(v) / math.log(2.0) * (1L << scale)).toLong - 1
    assert(out(Some(idx(2.0))) == 1L)
    assert(out(Some(idx(3.0))) == 1L)
    assert(out(Some(idx(8.0))) == 1L)
    assert(out(None) == 2L) // zero bucket: 0.0 and -1.0
    // all buckets fit in maxSize at the chosen scale
    val idxs = out.keys.flatten
    assert(idxs.max - idxs.min + 1 <= 160)
  }

  test("HexToInt: OTTL semantics incl. 0x prefix and error path") {
    val df = graft.model.LogFrames.fromBodies(spark,
      Seq("0xFF", "ff", "0X1a", "nothex", ""))
    val vals = df.select(graft.operators.ExprLang.stringExpr("HexToInt(body)").as("v"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(vals(0).contains("255") && vals(1).contains("255") && vals(2).contains("26"))
    assert(vals(3).isEmpty && vals(4).isEmpty)
  }

  test("HexToInt: 16-digit values parse like Go ParseInt(s,16,64)") {
    // 0x0123456789abcdef = 81985529216486895; max = 7fffffffffffffff;
    // 16-digit values above int64 max are ParseInt range errors -> null;
    // leading zeros are value-neutral (Go accepts any number of them), so
    // the 17-digit "0x00123456789abcdef" parses to the SAME value
    val df = graft.model.LogFrames.fromBodies(spark,
      Seq("0x0123456789abcdef", "7fffffffffffffff", "8000000000000000",
        "ffffffffffffffff", "0x00123456789abcdef"))
    val vals = df.select(graft.operators.ExprLang.stringExpr("HexToInt(body)").as("v"))
      .collect().map(r => Option(r.getString(0))).toSeq
    // double domain: 81985529216486895 rounds to ...896 (documented deviation)
    assert(vals(0).exists(_.startsWith("8198552921648689")), vals(0))
    assert(vals(1).exists(_.startsWith("922337203685477580")), vals(1))
    assert(vals(2).isEmpty && vals(3).isEmpty)
    assert(vals(4) == vals(0), vals(4))
  }

  test("metadata flattener: array-index rule (utils/flatten/flatten.go:24-30)") {
    import org.apache.spark.sql.catalyst.util.MapData
    val w = new graft.functions.JsonTypedMapsWorker(
      flatten = true, maxDepth = 10, enablePaths = true, pathPrefix = "",
      unquoteFirst = false, flattenArrays = true)
    val row = w.parse(UTF8String.fromString(
      """{"a": [{"b": 1}, "s"], "c": {"d": [true]}}"""))
    val strings = row.getMap(0)
    val numbers = row.getMap(1)
    val bools = row.getMap(2)
    def keysOf(m: MapData): Set[String] =
      (0 until m.numElements()).map(i => m.keyArray().getUTF8String(i).toString).toSet
    assert(keysOf(numbers) == Set("a.0.b"))
    assert(keysOf(strings) == Set("a.1"))
    assert(keysOf(bools) == Set("c.d.0"))
  }

  // ---- decision-wait streaming form ---------------------------------------

  import graft.streaming.TailSampler.{SpanBuf, TraceDecision}

  private def span(tid: String, sid: String, attrs: Map[String, String] = Map.empty,
      nums: Map[String, Double] = Map.empty): SpanBuf =
    SpanBuf(tid, sid, attrs, nums)

  test("row evaluator is bit-equivalent to the batch Column tree (strict, " +
      "regex, invert, numeric, and-op, sub-policy priority, probabilistic)") {
    val policies = Seq(
      Policy("errors", 0, priority = 0, filterOp = "and",
        stringFilters = Seq(
          StringFilter("source", Seq("unknown")),
          StringFilter("path", Seq("^/internal"), regexMatch = true))),
      Policy("keep-vips", 100, priority = 1,
        stringFilters = Seq(StringFilter("tier", Seq("basic"), invert = true)),
        numericFilters = Seq(NumericFilter("latency_ms", 100, 5000)),
        subPolicies = Seq(
          Policy("sub-never", 0, priority = 0,
            stringFilters = Seq(StringFilter("drop", Seq("yes")))),
          Policy("sub-prob", 37.5, priority = 1,
            stringFilters = Seq(StringFilter("sample", Seq("maybe")))))),
      Policy("half", 50, priority = 2,
        stringFilters = Seq(StringFilter("half", Seq("on")))))
    val cases: Seq[(Map[String, String], Map[String, Double])] = Seq(
      (Map("source" -> "unknown", "path" -> "/internal/x"), Map.empty),
      (Map("source" -> "unknown"), Map.empty), // and-op fails
      (Map("tier" -> "gold"), Map("latency_ms" -> 200.0)),
      (Map("tier" -> "basic"), Map("latency_ms" -> 200.0)),
      (Map("tier" -> "gold", "drop" -> "yes"), Map("latency_ms" -> 150.0)),
      (Map("tier" -> "gold", "sample" -> "maybe"), Map("latency_ms" -> 150.0)),
      (Map("half" -> "on"), Map.empty),
      (Map.empty, Map.empty)) // nothing matches -> default sample
    val traced = cases.zipWithIndex.map { case ((s, n), i) =>
      (f"deadbeefdeadbeefdeadbeefdeadbe$i%02x", s, n)
    }
    val batch = graft.model.LogFrames.withDefaults(
      traced.toDF("trace_id", "attributes_string", "attributes_number"))
      .select(col("trace_id"), TailSampler.decision(policies, col("trace_id"),
        col("attributes_string"), col("attributes_number")).as("d"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    traced.foreach { case (tid, s, n) =>
      val row = TailSampler.decisionRow(policies, tid, Seq(span(tid, "s1", s, n)))
      assert(row == batch(tid), s"trace $tid: row=$row batch=${batch(tid)}")
    }
    // sanity: the case set exercises both decisions
    assert(batch.values.toSet == Set(0, 1))
  }

  test("decision-wait: spans buffer across micro-batches, the tick decides " +
      "over ALL buffered spans, late spans inherit the decision") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // and-op policy whose two filters are satisfied by DIFFERENT spans of
    // the same trace: only the buffered-trace evaluation (reference
    // semantics — filters scan every span of the trace) can sample it
    val policies = Seq(
      Policy("pair", 100, filterOp = "and", stringFilters = Seq(
        StringFilter("a", Seq("1")), StringFilter("b", Seq("2")))),
      Policy("drop-all", 0, priority = 1,
        stringFilters = Seq(StringFilter("x", Seq("y")))))
    val fn = TailSampler.decisionWaitFn(policies, "30 seconds", Some("10 minutes"))
    def st(opt: Option[TraceDecision], t: Long, timedOut: Boolean) =
      TestGroupState.create[TraceDecision](
        optionalState = opt.map(org.apache.spark.api.java.Optional.of[TraceDecision])
          .getOrElse(org.apache.spark.api.java.Optional.empty[TraceDecision]()),
        timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
        batchProcessingTimeMs = t,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
        hasTimedOut = timedOut)
    val tid = "deadbeefdeadbeefdeadbeefdeadbeef"
    val s1 = span(tid, "s1", Map("a" -> "1"))
    val s2 = span(tid, "s2", Map("b" -> "2"))

    // batch 1: first span arrives -> buffered, wait timer armed, no output
    val g1 = st(None, 1000L, timedOut = false)
    assert(fn(tid, Iterator(s1), g1).isEmpty)
    assert(g1.get == TraceDecision(decided = false, 1, Seq(s1)))
    assert(g1.getTimeoutTimestampMs.isPresent)

    // batch 2 (out-of-order sibling): appended, timer NOT reset
    val g2 = st(Some(g1.get), 5000L, timedOut = false)
    assert(fn(tid, Iterator(s2), g2).isEmpty)
    assert(g2.get.buffered == Seq(s1, s2))
    assert(!g2.getTimeoutTimestampMs.isPresent, "buffering must not re-arm the timer")

    // decision tick: and-op satisfied only by the UNION of buffered spans
    // -> Sampled, both spans released, buffer cleared, retention armed
    val g3 = st(Some(g2.get), 31000L, timedOut = true)
    assert(fn(tid, Iterator.empty, g3).toSeq == Seq(s1, s2))
    assert(g3.get == TraceDecision(decided = true, 1, Nil))

    // late span: forwarded immediately under the retained Sampled decision
    val late = span(tid, "s3", Map("c" -> "3"))
    val g4 = st(Some(g3.get), 40000L, timedOut = false)
    assert(fn(tid, Iterator(late), g4).toSeq == Seq(late))

    // a NotSampled trace: buffered spans dropped at the tick, late spans
    // dropped under the retained decision
    val tid2 = "00000000000000000000000000000002"
    val d1 = span(tid2, "d1", Map("x" -> "y"))
    val g5 = st(Some(TraceDecision(decided = false, 1, Seq(d1))), 31000L, timedOut = true)
    assert(fn(tid2, Iterator.empty, g5).isEmpty)
    assert(g5.get.decision == 0)
    val g6 = st(Some(g5.get), 40000L, timedOut = false)
    assert(fn(tid2, Iterator(span(tid2, "d2", Map("x" -> "y"))), g6).isEmpty)

    // retention expiry on a decided trace: state removed (dropTrace)
    val g7 = st(Some(g3.get), 700000L, timedOut = true)
    assert(fn(tid, Iterator.empty, g7).isEmpty)
    assert(g7.isRemoved)

    // single-span trace with neither filter set -> no policy matches ->
    // default Sampled at the tick
    val tid3 = "00000000000000000000000000000003"
    val n1 = span(tid3, "n1")
    val g8 = st(Some(TraceDecision(decided = false, 1, Seq(n1))), 31000L, timedOut = true)
    assert(fn(tid3, Iterator.empty, g8).toSeq == Seq(n1))
  }
}
