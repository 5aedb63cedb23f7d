package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring for corpus-vs-query ranking (Robertson &
  * Spärck Jones probabilistic relevance framework; the Okapi BM25 form with
  * the standard k1/b parameterization and the Lucene-style non-negative
  * idf `ln(1 + (N - df + 0.5)/(df + 0.5))`).
  *
  * Scale shape (100 TB):
  *  - TRAIN is two map-side-combine aggregations: one corpus scan for
  *    (N, sum dl) and one shuffle on words restricted to the query terms
  *    (an `isin` filter pushes the term set into the scan projection, so
  *    the shuffle carries only query-term hits, not the corpus vocabulary);
  *  - SCORE is a single whole-stage-codegen projection over the
  *    driver-held model (term -> idf literals baked into the plan) — zero
  *    shuffle, zero join, scan speed. A join formulation would shuffle
  *    every token of the corpus against the term table.
  *
  * Determinism across engines (the DuckDB-oracle constraint): every
  * floating-point step is either IEEE exactly-rounded from identical
  * operand trees (divisions, the avgdl ratio) or quantized per term to
  * `round(score * 1e6)` BIGINT before any cross-row sum — the only
  * transcendental (the idf log) differs by at most 1 ulp between Java and
  * DuckDB, which vanishes at e6 quantization except on measure-zero
  * half-boundary values.
  */
object Relevance {

  /** Driver-small BM25 model: (term, df) pairs + corpus stats. */
  final case class Bm25Model(
      terms: Array[(String, Long)],
      nDocs: Long,
      avgdl: Double,
      k1: Double = 1.2,
      b: Double = 0.75)

  private def words(t: Column): Column = split(trim(t), "\\s+")

  /** The `k` highest-document-frequency words (df DESC, word ASC — the
    * deterministic tie order every engine reproduces). Used as a
    * self-contained stand-in for a user query set in tests/benchmarks.
    */
  def topDfTerms(docs: DataFrame, textCol: Column, idCol: Column, k: Int): Array[String] =
    docs.select(idCol.as("__id"), explode(array_distinct(words(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(k)
      .collect().map(_.getString(0))

  /** Corpus-stats pass: N, avgdl, and df for exactly the query terms. */
  def bm25Train(docs: DataFrame, textCol: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Bm25Model = {
    val stats = docs.agg(
      sum(TextOps.wsTokenCount(textCol).cast("long")).as("sumdl"),
      count(lit(1)).as("n")).head()
    val (sumDl, n) = (stats.getLong(0), stats.getLong(1))
    val df = docs.select(explode(array_distinct(words(textCol))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("w").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // integer sums are order-independent; the single division is IEEE
    // exactly rounded, so DuckDB's CAST(SUM .. AS DOUBLE)/CAST(COUNT ..)
    // reproduces the identical double
    Bm25Model(terms.map(t => t -> df.getOrElse(t, 0L)).toArray, n,
      sumDl.toDouble / n.toDouble, k1, b)
  }

  /** Per-document score columns over a pre-split token array column `ws`
    * and its length `dl`: (n_matched, bm25_e6). One codegen projection;
    * per-term scores quantize to e6 BIGINT before the cross-term sum.
    *
    * Feed `ws` through [[graft.functions.OptimizerFence]] in a separate
    * select: CollapseProject would otherwise inline the split() into every
    * per-term CountInSet, re-tokenizing the document once per query term.
    */
  def bm25Columns(m: Bm25Model, ws: Column, dl: Column): Seq[(String, Column)] = {
    val dlD = dl.cast("double")
    val perTerm = m.terms.map { case (t, df) =>
      // idf is a plan literal (Java log); the oracle recomputes it with
      // DuckDB's ln from the same df — ≤1 ulp apart, absorbed by e6 rounding
      val idf = math.log((m.nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val tf = graft.functions.CountInSet(ws, Seq(t)).cast("double")
      val score = lit(idf) * ((tf * lit(m.k1 + 1.0)) /
        (tf + lit(m.k1) * (lit(1.0 - m.b) + lit(m.b) * (dlD / lit(m.avgdl)))))
      (tf, when(tf > 0, round(score * 1e6, 0).cast("long")).otherwise(lit(0L)))
    }
    Seq(
      "n_matched" -> perTerm.map { case (tf, _) =>
        when(tf > 0, 1L).otherwise(0L) }.reduce(_ + _).as("n_matched"),
      "bm25_e6" -> perTerm.map(_._2).reduce(_ + _))
  }
}
