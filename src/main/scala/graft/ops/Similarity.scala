package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector and
  * one columnar pass (aggregate/zip_with dot products, codegen'd), then a
  * top-k sort. Scale path: LSH bucketing via deterministic random
  * hyperplanes — candidates share the query's bucket (probe neighbors by
  * also matching buckets at hamming distance 1), shrinking the scanned set
  * by ~2^planes.
  */
object Similarity {

  /** Dot product of two float-array columns (double math). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash of the indices mapped to [-0.5, 0.5). Engine-portable and
    * seed-stable — no RNG state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat(lit(s"p$plane-"), dim.cast("string"))), 1, 6), 16, 10)
      .cast("double") / lit(16777216.0)) - lit(0.5)

  /** Sign bits of `planes` hyperplane projections packed into a long. */
  def hyperplaneSignature(v: Column, planes: Int): Column = {
    val dims = sequence(lit(0), size(v) - 1)
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, dims, (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force cosine top-k against a single query vector (broadcast). */
  def bruteForceTopK(embs: DataFrame, query: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__q")))
    embs.crossJoin(q)
      .withColumn("cosine", cosine(col(vecCol), col("__q")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** LSH-bucketed ANN: scan only vectors whose hyperplane bucket matches the
    * query's (or differs by one bit — multiprobe), then exact cosine top-k
    * within candidates.
    */
  def lshTopK(embs: DataFrame, query: DataFrame, k: Int, planes: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val sigged = embs.withColumn("__sig", hyperplaneSignature(col(vecCol), planes))
    val qSig = broadcast(query
      .select(col(vecCol).as("__q"), hyperplaneSignature(col(vecCol), planes).as("__qsig")))
    val cand = sigged.crossJoin(qSig)
      // multiprobe: exact bucket or hamming distance 1
      .filter(bit_count(col("__sig").bitwiseXOR(col("__qsig"))) <= 1)
    cand.withColumn("cosine", cosine(col(vecCol), col("__q")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cosine"))
  }
}
