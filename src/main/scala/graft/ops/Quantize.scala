package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for vector-index compression: symmetric per-vector
  * int8 (the standard faiss/SQ8-style scheme — scale by max|x|, round to
  * [-127, 127]). 4x smaller vectors change what fits in executor memory and
  * broadcast thresholds at 100 TB; the ops stay `transform`-free where it
  * matters — quantization is a one-off index-build step, so the HOFs here
  * are off the query hot path by construction (the hot path reads the
  * already-quantized column).
  */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127 (0-vectors get scale 0 and
    * quantize to all-zero).
    */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x))) / 127.0

  /** Quantized vector (array<int> in [-127,127]); `scale` from
    * [[int8Scale]].
    */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, 0)
        .otherwise(round(x / scale).cast("int")))

  /** Dequantized vector (array<double>). */
  def int8Dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Max absolute reconstruction error per vector — the quantization-audit
    * metric (bounded by scale/2 for symmetric rounding).
    */
  def maxAbsError(vec: Column, q: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, int8Dequantize(q, scale), (a, b) => abs(a - b)),
      lit(0.0d), (acc, x) => greatest(acc, x))
}
