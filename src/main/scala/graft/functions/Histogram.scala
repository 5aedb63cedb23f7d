package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit-bounds histogram aggregation, the spanmetrics shape:
  * bucket index = lowest i with bounds(i) >= value, else len(bounds)
  * (`processor/signozspanmetricsprocessor/processor.go:1071-1086`,
  * Go `sort.SearchFloat64s`). The bucketing is a codegen'd CASE chain; the
  * aggregation is a plain groupBy count with map-side partials.
  */
object Histogram {

  /** Default latency bounds (ms) from the spanmetrics processor defaults. */
  val defaultLatencyBoundsMs: Seq[Double] = Seq(
    2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 1400, 2000, 5000, 10000, 15000)

  /** Bucket index column for explicit bounds. */
  def bucketIndex(value: Column, bounds: Seq[Double]): Column = {
    require(bounds == bounds.sorted, "bounds must be ascending")
    bounds.zipWithIndex.foldRight(lit(bounds.length): Column) { case ((b, i), acc) =>
      when(value <= b, lit(i)).otherwise(acc)
    }
  }

  /** Per-key bucket counts: one row per (keys..., bucket_idx, bucket_le). */
  def explicitBounds(df: DataFrame, value: Column, bounds: Seq[Double],
      keys: Column*): DataFrame = {
    val le = bounds.zipWithIndex.map { case (b, i) => i -> b.toString }.toMap +
      (bounds.length -> "+Inf")
    df.withColumn("bucket_idx", bucketIndex(value, bounds))
      .withColumn("bucket_le", element_at(typedlit(le), col("bucket_idx")))
      .groupBy(keys :+ col("bucket_idx") :+ col("bucket_le"): _*)
      .agg(count(lit(1)).as("n"))
  }
}
