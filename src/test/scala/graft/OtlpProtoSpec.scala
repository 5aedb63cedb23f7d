package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.sources.{LogSources, OtlpProto}

/** Golden tests for the OTLP-protobuf logs decode (the Kafka receiver's
  * default `otlp_proto` encoding, `unmarshaler.go:75-84`). The expected
  * payloads are hand-encoded with a minimal writer below, mirroring the
  * public OTLP proto field numbers — the same semantics
  * `plog.ProtoUnmarshaler` implements.
  */
class OtlpProtoSpec extends SparkSuite {
  import spark.implicits._

  // ---- minimal protobuf writer --------------------------------------------
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)
  private def bytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, b.length); out.write(b)
  }
  private def strField(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    bytesField(out, field, s.getBytes("UTF-8"))
  private def varintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    tag(out, field, 0); varint(out, v)
  }
  private def fixed64Field(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    tag(out, field, 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def fixed32Field(out: ByteArrayOutputStream, field: Int, v: Int): Unit = {
    tag(out, field, 5)
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
  }
  private def msg(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f(out)
    out.toByteArray
  }

  // AnyValue encoders
  private def avStr(s: String) = msg(o => strField(o, 1, s))
  private def avBool(b: Boolean) = msg(o => varintField(o, 2, if (b) 1 else 0))
  private def avInt(l: Long) = msg(o => varintField(o, 3, l))
  private def avDouble(d: Double) =
    msg(o => fixed64Field(o, 4, java.lang.Double.doubleToLongBits(d)))
  private def avArr(vs: Array[Byte]*) =
    msg(o => bytesField(o, 5, msg(a => vs.foreach(v => bytesField(a, 1, v)))))
  private def kv(k: String, v: Array[Byte]) =
    msg(o => { strField(o, 1, k); bytesField(o, 2, v) })

  private def logsData(resourceAttrs: Seq[Array[Byte]], scopeName: String,
      records: Seq[Array[Byte]]): Array[Byte] =
    msg { o =>
      bytesField(o, 1, msg { rl => // ResourceLogs
        bytesField(rl, 1, msg { res => // Resource
          resourceAttrs.foreach(a => bytesField(res, 1, a))
        })
        bytesField(rl, 2, msg { sl => // ScopeLogs
          bytesField(sl, 1, msg { sc => // InstrumentationScope
            strField(sc, 1, scopeName)
            strField(sc, 2, "v1")
          })
          records.foreach(rec => bytesField(sl, 2, rec))
        })
      })
    }

  test("otlp_proto: full LogRecord decode with typed attribute split") {
    val rec = msg { r =>
      fixed64Field(r, 1, 123456789L) // time_unix_nano
      varintField(r, 2, 9) // severity_number INFO
      strField(r, 3, "INFO")
      bytesField(r, 5, avStr("hello world"))
      bytesField(r, 6, kv("k1", avStr("v1")))
      bytesField(r, 6, kv("n1", avInt(42)))
      bytesField(r, 6, kv("d1", avDouble(1.5)))
      bytesField(r, 6, kv("b1", avBool(true)))
      bytesField(r, 6, kv("arr", avArr(avStr("x"), avInt(2))))
      fixed32Field(r, 8, 1) // flags
      bytesField(r, 9, (1 to 16).map(_.toByte).toArray) // trace_id
      bytesField(r, 10, (0xa1 to 0xa8).map(_.toByte).toArray) // span_id
      fixed64Field(r, 11, 987654321L) // observed_time_unix_nano
    }
    val payload = logsData(
      Seq(kv("service.name", avStr("svc-a")), kv("r.num", avInt(7))),
      "scope1", Seq(rec))

    val rows = OtlpProto.parseLogsData(payload)
    assert(rows.size == 1)
    val row = rows.head
    assert(row.timestamp == 123456789L && row.observed_timestamp == 987654321L)
    assert(row.severity_number == 9 && row.severity_text == "INFO")
    assert(row.body == "hello world")
    assert(row.attributes_string == Map("k1" -> "v1", "arr" -> "[\"x\",2]"))
    assert(row.attributes_number == Map("n1" -> 42.0, "d1" -> 1.5))
    assert(row.attributes_bool == Map("b1" -> true))
    // resource attrs force-stringified (the sink's own rule)
    assert(row.resources_string == Map("service.name" -> "svc-a", "r.num" -> "7"))
    assert(row.trace_id == "0102030405060708090a0b0c0d0e0f10")
    assert(row.span_id == "a1a2a3a4a5a6a7a8")
    assert(row.trace_flags == 1)
    assert(row.scope_name == "scope1" && row.scope_version == "v1")
  }

  test("otlp_proto: non-string bodies stringify; zero ids stay empty") {
    val recs = Seq(
      msg(r => bytesField(r, 5, avInt(42))),
      msg(r => bytesField(r, 5, avDouble(2.5))),
      msg { r =>
        bytesField(r, 5, avBool(false))
        bytesField(r, 9, new Array[Byte](16)) // all-zero trace id -> ""
      })
    val rows = OtlpProto.parseLogsData(logsData(Seq.empty, "s", recs))
    assert(rows.map(_.body) == Seq("42", "2.5", "false"))
    assert(rows(2).trace_id == "")
  }

  test("otlp_proto: unknown fields are skipped (forward compatibility)") {
    val rec = msg { r =>
      strField(r, 3, "WARN")
      varintField(r, 99, 123) // unknown varint field
      bytesField(r, 98, "junk".getBytes("UTF-8")) // unknown bytes field
    }
    val rows = OtlpProto.parseLogsData(logsData(Seq.empty, "s", Seq(rec)))
    assert(rows.size == 1 && rows.head.severity_text == "WARN")
  }

  test("fromKafka otlp_proto: DataFrame adapter yields LogRow frames") {
    val payload = logsData(
      Seq(kv("host", avStr("h1"))), "sc",
      Seq(msg { r =>
        bytesField(r, 5, avStr("line one"))
        varintField(r, 2, 17)
        strField(r, 3, "ERROR")
      }))
    val df = Seq(payload, Array[Byte](0x7f, 0x00)) // second message malformed
      .toDF("value")
    val logs = LogSources.fromKafka(df, "otlp_proto")
    val got = logs.select("body", "severity_text", "severity_number",
      "resources_string").collect()
    assert(got.length == 1) // malformed message dropped
    assert(got.head.getString(0) == "line one")
    assert(got.head.getString(1) == "ERROR" && got.head.getInt(2) == 17)
    assert(got.head.getMap[String, String](3).toMap == Map("host" -> "h1"))
    // the decoded frame runs the NORMAL pipeline unchanged
    val routed = graft.pipeline.Pipeline.compile(
      SparkEntry.transcriptPipeline)(logs)
    assert(routed.count() == 1)
  }
}
