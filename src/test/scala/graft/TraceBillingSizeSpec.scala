package graft

import org.apache.spark.sql.functions._

import graft.model.{SpanFrames, SpanSchema}
import graft.pipeline.TraceExporter

/** `record_size` ports the traces billing sizer (pkg/metering/v1/traces.go
  * SizePerSpan); every expected total below is a golden from the reference's
  * own traces_test.go, reproduced over the ptracesgen.Generate inputs
  * (traces.go generator: resource.N=test attrs, span.N names, fixed 16/8-byte
  * ids, start==end, events event.N). The generator stamps time.Now(); any
  * 19-digit nano timestamp yields the same size, so tests pin T0.
  */
class TraceBillingSizeSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1672531200L * 1000000000L // 19 decimal digits, like now()
  private val TID = "35423845464646373938303338313033" // hex of "5B8EFFF798038103"
  private val SID = "4545453139423745" // hex of "EEE19B7E"

  private def gen(spanCount: Int, resAttrs: Map[String, String], kind: Int,
      eventCount: Int = 0, attrsS: Map[String, String] = Map.empty,
      attrsN: Map[String, Double] = Map.empty,
      attrsB: Map[String, Boolean] = Map.empty) = {
    val rows = (0 until spanCount).map { i =>
      (s"span.$i", TID, SID, SID, kind, resAttrs, attrsS, attrsN, attrsB)
    }
    val df = rows.toDF("name", "trace_id", "span_id", "parent_span_id", "kind",
      "resources_string", "attributes_string", "attributes_number", "attributes_bool")
      .withColumn("start_ts", lit(T0))
      .withColumn("end_ts", lit(T0))
    val withEvents =
      if (eventCount == 0) df
      else df.withColumn("events", expr(
        s"transform(sequence(0, ${eventCount - 1}), " +
          s"j -> named_struct('name', concat('event.', j), 'ts_ns', ${T0}L, " +
          "'attrs', map()))").cast(SpanSchema.eventType))
    SpanFrames.withDefaults(withEvents)
  }

  private def totalSize(df: org.apache.spark.sql.DataFrame): Long =
    TraceExporter.spansV3(df).agg(sum(col("record_size"))).head.getLong(0)

  test("TestTracesSizeWithNoEvents: 1 span, Producer, resource.0=test -> 406") {
    assert(totalSize(gen(1, Map("resource.0" -> "test"), kind = 4)) == 406L)
  }

  test("TestTracesSizeWithNoEventAndSigNozResource: workspace attr excluded -> 406") {
    assert(totalSize(gen(1, Map("resource.0" -> "test",
      "signoz.workspace.internal.test" -> "signoz-test"), kind = 4)) == 406L)
  }

  test("TestTracesSizeWithEvents: 2 events -> 540") {
    assert(totalSize(gen(1, Map("resource.0" -> "test"), kind = 4, eventCount = 2)) == 540L)
  }

  test("TestTracesSizeWith2SpansAnd2EventsAnd2ResourceAttributes -> 1120") {
    assert(totalSize(gen(2, Map("resource.0" -> "test", "resource.1" -> "test"),
      kind = 4, eventCount = 2)) == 1120L)
  }

  test("TestTracesSizeWith2SpansAnd2EventsAnd2ResourceAttributesAndAttributes -> 1368") {
    val df = gen(2, Map("resource.0" -> "test", "resource.1" -> "test"), kind = 3,
      eventCount = 2,
      attrsS = Map("string" -> "attribute"),
      attrsN = Map("float64" -> 342.5, "int64" -> 342.0), // int64 attr -> double split
      attrsB = Map("bool" -> false))
    assert(totalSize(df) == 1368L)
    // per-span size is uniform
    val each = TraceExporter.spansV3(df).select(col("record_size")).collect()
    assert(each.map(_.getLong(0)).toSeq == Seq(684L, 684L))
  }

  test("TestTracesSizeWithBoolAttributes -> 451") {
    assert(totalSize(gen(1, Map("resource.0" -> "test"), kind = 3,
      attrsB = Map("bool1" -> false, "bool2" -> true))) == 451L)
  }
}
