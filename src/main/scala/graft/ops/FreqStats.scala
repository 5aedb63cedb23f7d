package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CountMinAgg, MisraGriesAgg}

/** Bounded-state frequency statistics for corpus analytics: heavy-hitter
  * tokens/domains/templates and per-token frequency estimates, without a
  * full-cardinality groupBy shuffle.
  *
  * Scale notes (100 TB):
  *  - an exact `groupBy(token).count()` over an exploded word column
  *    shuffles EVERY occurrence keyed by the token — fine for a report,
  *    wrong as a first pass over 10^13 tokens;
  *  - [[heavyHitters]] runs ONE Misra-Gries aggregation (k-counter buffer,
  *    map-side partials, mergeable-summaries merge) to shrink the problem
  *    to ≤ k candidates, then verifies ONLY those with an exact count
  *    whose shuffle carries the candidate sliver — the final answer is
  *    exact and partitioning-invariant (the sketch is order-dependent,
  *    the verified output is not);
  *  - [[countMin]] is fully deterministic (commutative adds, matrix-add
  *    merges) so estimates are bit-identical across engines and
  *    partitionings; buckets use the md5/conv derivation shared with the
  *    Bloom filter so the DuckDB oracle rebuilds the same d x w matrix.
  */
object FreqStats {

  /** d md5-derived bucket indices for a token (one per CMS row). */
  def cmsBuckets(token: Column, d: Int, w: Int): Column =
    array((0 until d).map(r =>
      conv(substring(md5(concat(lit(r.toString), lit("|"), token)), 1, 15),
        16, 10).cast("long") % w): _*)

  /** Exact heavy hitters (true frequency > phi * n) found with bounded
    * state: MG candidates first, exact verification second. Requires
    * k ≥ 1/phi so the MG guarantee (any item with freq > n/(k+1)
    * survives) covers the threshold.
    */
  def heavyHitters(items: DataFrame, itemCol: Column, phi: Double,
      k: Int): DataFrame = {
    require(k >= math.ceil(1.0 / phi).toInt,
      s"k=$k too small for phi=$phi: MG guarantees only freq > n/(k+1)")
    val head = items.agg(MisraGriesAgg(itemCol, k).as("c"),
      count(lit(1)).as("n")).head
    val n = head.getLong(1)
    val cands = head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (cands.isEmpty) return items.sparkSession.emptyDataFrame
      .select(lit("").as("item"), lit(0L).as("cnt")).limit(0)
    items.filter(itemCol.isin(cands: _*))
      .groupBy(itemCol.as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(n.toDouble))
  }

  /** Count-min estimates for a probe set: builds the d x w matrix in one
    * aggregation (buffer = the matrix, exchange moves partitions x d x w
    * longs), explodes it to (r, bucket, cnt) rows, and reads each probe's
    * estimate as the min over its d buckets. `probes` must be small
    * (it broadcasts). Returns (item, est, exact).
    */
  def countMin(items: DataFrame, itemCol: Column, probes: DataFrame,
      probeCol: Column, d: Int = 4, w: Int = 1024): DataFrame = {
    val matrix = items
      .agg(CountMinAgg(cmsBuckets(itemCol, d, w), d, w).as("m"))
      .select(posexplode(col("m")).as(Seq("idx", "cnt")))
      .select((col("idx") / w).cast("int").as("r"),
        (col("idx") % w).cast("long").as("bucket"), col("cnt"))
    val probePos = probes.select(probeCol.as("item"))
      .select(col("item"), posexplode(cmsBuckets(col("item"), d, w))
        .as(Seq("r", "bucket")))
    val est = probePos.join(matrix, Seq("r", "bucket"))
      .groupBy(col("item")).agg(min(col("cnt")).as("est"))
    val exact = items.groupBy(itemCol.as("item"))
      .agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("item"), "left")
      .select(col("item"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"))
  }
}
