package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One exemplar candidate held in the aggregation buffer. Total order:
  * (value, trace_id, span_id) compared lexicographically — value first,
  * byte-order UTF8String tie-breaks — so the kept set and its output order
  * are deterministic even under duplicate latency values.
  */
final case class ExemplarEntry(value: Double, traceId: UTF8String,
    spanId: UTF8String)

object ExemplarEntry {
  /** DESCENDING order (largest first) used for output and retention. */
  val desc: Ordering[ExemplarEntry] = new Ordering[ExemplarEntry] {
    def compare(a: ExemplarEntry, b: ExemplarEntry): Int = {
      val c = java.lang.Double.compare(b.value, a.value)
      if (c != 0) return c
      val t = b.traceId.compareTo(a.traceId)
      if (t != 0) t else b.spanId.compareTo(a.spanId)
    }
  }
}

/** Bounded top-k exemplar aggregate: keeps the k largest (value, trace_id,
  * span_id) tuples per group and evaluates to an array of structs sorted
  * largest-first.
  *
  * Spark-first restatement of the spanmetrics processor's exemplar
  * collection (`processor/signozspanmetricsprocessor/processor.go:1084` —
  * every span in the flush window appends `{traceID, spanID, value}` to its
  * metric key, attached at flush by `setExemplars`, processor.go:1452-1474,
  * which skips empty trace ids, then reset per tick). A flush window is
  * seconds; a batch bucket at 10^12-turn scale can hold millions of spans,
  * so the batch analogue caps the set deterministically at the k HIGHEST
  * latencies (exemplars exist to link slow outliers back to traces).
  *
  * Scale shape: a TypedImperativeAggregate, so the plan is an
  * ObjectHashAggregate with map-side partial top-k — each partition ships
  * at most k entries per key to the reduce side, vs a window-rank plan
  * shuffling and sorting EVERY span row. Rows with a null/empty trace id
  * never enter the buffer (reference `traceID.IsEmpty()` skip).
  */
final case class TopKExemplars(
    value: Expression, traceId: Expression, spanId: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[ExemplarEntry]] {

  require(k > 0, "TopKExemplars requires k > 0")

  private type Buf = scala.collection.mutable.ArrayBuffer[ExemplarEntry]

  override def children: Seq[Expression] = Seq(value, traceId, spanId)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKExemplars.outType

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  /** Insert keeping at most k entries: only materializes/copies the UTF8
    * strings (which point into reused row buffers) when the entry is
    * actually retained.
    */
  private def insert(buf: Buf, v: Double, trace: UTF8String, span: UTF8String,
      copy: Boolean): Buf = {
    if (buf.length == k) {
      // full: compare against the current minimum (last after a sort pass
      // is not maintained — scan; k is small by design)
      var minIdx = 0
      var i = 1
      while (i < buf.length) {
        if (ExemplarEntry.desc.compare(buf(i), buf(minIdx)) > 0) minIdx = i
        i += 1
      }
      val cand = ExemplarEntry(v, trace, span)
      if (ExemplarEntry.desc.compare(cand, buf(minIdx)) < 0)
        buf(minIdx) =
          if (copy) ExemplarEntry(v, trace.clone(), span.clone()) else cand
      buf
    } else {
      buf += (if (copy) ExemplarEntry(v, trace.clone(), span.clone())
              else ExemplarEntry(v, trace, span))
      buf
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = value.eval(input)
    if (v == null) return buf
    val t = traceId.eval(input).asInstanceOf[UTF8String]
    if (t == null || t.numBytes() == 0) return buf // reference IsEmpty skip
    val s = spanId.eval(input).asInstanceOf[UTF8String]
    insert(buf, v.asInstanceOf[Double], t,
      if (s == null) UTF8String.EMPTY_UTF8 else s, copy = true)
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(e => insert(buf, e.value, e.traceId, e.spanId, copy = false))
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sorted(ExemplarEntry.desc)
    new GenericArrayData(sorted.map { e =>
      new GenericInternalRow(Array[Any](e.traceId, e.spanId, e.value))
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { e =>
      out.writeDouble(e.value)
      val t = e.traceId.getBytes
      out.writeInt(t.length); out.write(t)
      val s = e.spanId.getBytes
      out.writeInt(s.length); out.write(s)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new Buf(math.min(n, k) + 1)
    var i = 0
    while (i < n) {
      val v = in.getDouble
      val tl = in.getInt; val t = new Array[Byte](tl); in.get(t)
      val sl = in.getInt; val s = new Array[Byte](sl); in.get(s)
      buf += ExemplarEntry(v, UTF8String.fromBytes(t), UTF8String.fromBytes(s))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKExemplars =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKExemplars =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKExemplars =
    copy(value = newChildren(0), traceId = newChildren(1), spanId = newChildren(2))

  override def prettyName: String = "top_k_exemplars"
}

object TopKExemplars {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("trace_id", StringType, nullable = false),
    StructField("span_id", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  def apply(value: Column, traceId: Column, spanId: Column, k: Int): Column =
    ExpressionUtils.column(new TopKExemplars(
      ExpressionUtils.expression(value), ExpressionUtils.expression(traceId),
      ExpressionUtils.expression(spanId), k).toAggregateExpression())
}
