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

  /** Base-2 exponential histogram, the spanmetrics expHistograms shape
    * (`processor.go:1087-1103` feeding the OTel `structure.Histogram` with
    * `DefaultMaxSize` = 160 buckets, auto-downscaled so every observation
    * fits): bucket i at scale s covers `(2^(i/2^s), 2^((i+1)/2^s)]`, i.e.
    * index = ceil(log2(v) * 2^s) - 1.
    *
    * Spark restatement of the auto-scaling: the per-key scale is the largest
    * s <= maxScale with `(idx(max) - idx(min) + 1) <= maxSize` — computed
    * from a per-key min/max aggregate instead of the reference's one-by-one
    * downscale-on-overflow (same final scale, since downscaling halves the
    * index range until it fits). Two shuffles total: the min/max pre-pass
    * and the (key, bucket) count; both have map-side partials. Zero and
    * negative values land in the spec's zero bucket (`bucket_idx` NULL,
    * `zero_count` semantics).
    */
  def exponential(df: DataFrame, value: Column, keyCols: Seq[String],
      maxSize: Int = 160, maxScale: Int = 20): DataFrame = {
    val keys = keyCols.map(col)
    val pos = df.withColumn("__pos", when(value.cast("double") > 0, value.cast("double")))
    val ranges = pos.groupBy(keys: _*)
      .agg(min(col("__pos")).as("__min"), max(col("__pos")).as("__max"))
      .withColumn("__span", log2(col("__max")) - log2(col("__min")))
      .withColumn("scale",
        when(col("__min").isNull, lit(maxScale)) // all-zero key: scale moot
          .otherwise(least(lit(maxScale),
            floor(log2((lit(maxSize) - 1) / greatest(col("__span"), lit(1e-9))))
              .cast("int"))))
      .select(keys :+ col("scale"): _*)
    val withScale = pos.join(ranges, keyCols) // same-key join, AQE-broadcast
    withScale
      .withColumn("bucket_idx",
        when(col("__pos").isNotNull,
          ceil(log2(col("__pos")) * pow(lit(2.0), col("scale"))).cast("long") - 1))
      .groupBy(keys :+ col("scale") :+ col("bucket_idx"): _*)
      .agg(count(lit(1)).as("n"))
  }
}
