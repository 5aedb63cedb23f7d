package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus drift monitoring — the data-quality analogue of the reference's
  * telemetry pipelines: compare two corpus slices (two ingest days, two
  * sources, a canary vs baseline) on feature distributions and alarm on
  * divergence before a bad batch reaches training.
  *
  * Everything is EXACT INTEGER arithmetic so the statistic is bit-identical
  * on any engine and row order: the two-sample Kolmogorov–Smirnov distance
  * over an integer feature is reported as `ks_num = max_x |cum0(x)·n1 -
  * cum1(x)·n0|` (the usual D = ks_num/(n0·n1) — divide at the caller); the
  * categorical L1 (total-variation×2) distance as `sum_c |c0(c)·n1 -
  * c1(c)·n0|`.
  *
  * Scale shape: one distinct-value aggregation (map-side combined) then a
  * single-partition ordered window over DISTINCT feature values — state is
  * |distinct values| (token counts, score buckets), not corpus size; the
  * corpus itself is never sorted. Quantize continuous features to integer
  * buckets first (e6 convention) to keep the distinct set bounded.
  */
object Drift {

  /** One row: (ks_num, n0, n1) for integer feature `feature` between
    * side = 0 and side = 1 rows.
    */
  def ksDrift(df: DataFrame, feature: Column, side: Column): DataFrame = {
    val counts = df.select(feature.cast("long").as("v"), side.cast("int").as("s"))
      .groupBy("v")
      .agg(sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = counts.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum0", sum(col("c0")).over(w))
      .withColumn("cum1", sum(col("c1")).over(w))
      .crossJoin(broadcast(totals))
      .agg(max(abs(col("cum0") * col("n1") - col("cum1") * col("n0"))).as("ks_num"),
        first(col("n0")).as("n0"), first(col("n1")).as("n1"))
  }

  /** One row: (l1_num, n0, n1) — categorical L1 distance numerator over
    * `category` between the two sides (missing categories count as 0).
    */
  def l1Drift(df: DataFrame, category: Column, side: Column): DataFrame = {
    val counts = df.select(category.as("c"), side.cast("int").as("s"))
      .groupBy("c")
      .agg(sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = counts.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    counts.crossJoin(broadcast(totals))
      .agg(sum(abs(col("c0") * col("n1") - col("c1") * col("n0"))).as("l1_num"),
        first(col("n0")).as("n0"), first(col("n1")).as("n1"))
  }
}
