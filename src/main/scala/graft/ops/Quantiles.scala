package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state distribution quantiles via a fixed-width histogram CDF —
  * the corpus-analytics answer to "p50/p90/p99 token count per language"
  * at 100 TB, where exact `percentile()` is an unbounded
  * TypedImperativeAggregate buffer (the dep-graph scale lesson,
  * TraceExporter.scala) and `approx_percentile`'s KLL sketch is
  * Spark-internal (not reproducible by another engine).
  *
  * The histogram form is BOTH bounded and exact-cross-engine: one
  * (group, bucket)-keyed aggregation with map-side partials whose group
  * count is `groups x buckets` regardless of corpus size, then a
  * per-group CDF walk over at most `buckets` rows. The reported quantile
  * is the LOWER BOUND of the bucket containing the rank-`ceil(p*n/100)`
  * element — deterministic integer arithmetic all the way (rank =
  * `(n*p + 99) div 100`), so DuckDB reproduces every output bit-for-bit.
  * Resolution is `bucketWidth`, the explicit accuracy/state trade every
  * production histogram (Prometheus, HDR) makes.
  *
  * Values must be non-negative and < 2^53 (token counts, byte sizes,
  * durations): bucket = floor(v / width) is then exact in doubles on
  * both engines.
  */
object Quantiles {

  /** Per-group histogram quantiles. Output: grp, n, p&lt;p&gt; (bucket lower
    * bound) for each requested percentile.
    */
  def histogramQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
      bucketWidth: Long, percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(bucketWidth > 0 && percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100))
    val counts = df
      .select(groupCol.as("grp"),
        floor(valueCol.cast("double") / lit(bucketWidth.toDouble))
          .cast("long").as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // post-aggregation the data is groups x buckets rows — the windows
    // run over a bounded table, never the corpus
    val cdf = counts
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
    val qCols = percentiles.map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 99) div 100"),
        col("bucket") * bucketWidth)).as(s"p$p")
    }
    cdf.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}
