package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorKernels, VectorKernelsImpl}

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector and
  * one columnar pass (codegen'd single-loop cosine kernel), then a top-k
  * sort (TakeOrderedAndProject, no full sort).
  *
  * Scale path: LSH bucketing via deterministic hyperplanes. The signature is
  * a codegen kernel over a driver-precomputed plane matrix (round 1 paid
  * planes x dims md5 calls PER ROW). The query's probe buckets (exact +
  * hamming-1 multiprobe) are computed DRIVER-side from the query vector, so
  * the scan filter is a literal `sig IN (...)` — no crossJoin, and when the
  * signature is persisted as a partition column ([[buildSigIndex]]) the
  * filter prunes partitions/files before any vector is read.
  */
object Similarity {

  /** Dot product of two float-array columns (double math, codegen kernel). */
  def dot(a: Column, b: Column): Column = VectorKernels.dot(a, b)

  def norm(a: Column): Column = sqrt(VectorKernels.dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(VectorKernels.cosine(a, b), 6)

  /** Sign bits of `planes` hyperplane projections packed into a long. */
  def hyperplaneSignature(v: Column, planes: Int): Column =
    VectorKernels.hyperplaneSig(v, planes)

  /** Driver-side signature of one vector (for literal probe filters). */
  def signatureOf(vec: Seq[Float], planes: Int): Long = {
    val m = VectorKernelsImpl.planeMatrix(planes, vec.length)
    var bits = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < vec.length) { proj += vec(i).toDouble * m(p)(i); i += 1 }
      if (proj >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Exact bucket + all hamming-distance-1 neighbors (multiprobe set). */
  def probeBuckets(sig: Long, planes: Int): Seq[Long] =
    sig +: (0 until planes).map(b => sig ^ (1L << b))

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

  /** LSH-bucketed ANN: the query vector is collected (one row), its probe
    * buckets become a literal IN filter, and only bucket-matching vectors
    * pay the exact cosine. One scan, no join. With a persisted signature
    * column (see [[buildSigIndex]]) the IN filter is a pushed-down partition
    * predicate and non-matching files are never read.
    */
  def lshTopK(embs: DataFrame, query: DataFrame, k: Int, planes: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val qRow = query.select(col(vecCol)).head()
    val qVec = qRow.getSeq[Float](0)
    val buckets = probeBuckets(signatureOf(qVec, planes), planes)
    val qLit = typedlit(qVec.toArray)
    embs
      .withColumn("__sig", hyperplaneSignature(col(vecCol), planes))
      .filter(col("__sig").isin(buckets: _*))
      .withColumn("cosine", cosine(col(vecCol), qLit))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** One-time signature index: the embedding table rewritten partitioned by
    * its LSH bucket. Queries against it ([[lshTopKIndexed]]) turn the probe
    * set into partition pruning — at 100 TB, a 2^planes fan-out means each
    * query touches ~ (planes+1) / 2^planes of the data.
    *
    * The shuffle on `sig` before the write is load-bearing: without it,
    * EVERY write task holds writers for up to 2^planes dynamic partitions
    * (tasks x buckets small files, and the per-task writer churn measured
    * 20x+ super-linear on this host). Clustered by sig, each task writes
    * only its own buckets — total files = max(buckets, shuffle partitions).
    */
  def buildSigIndex(embs: DataFrame, path: String, planes: Int = 8,
      vecCol: String = "embedding"): Unit =
    embs.withColumn("sig", hyperplaneSignature(col(vecCol), planes))
      .repartition(col("sig"))
      .write.mode("overwrite").partitionBy("sig").parquet(path)

  /** ANN over a signature index: literal probe-bucket filter on the
    * partition column → Catalyst partition pruning (verify via
    * `.inputFiles` or the scan's PartitionFilters in explain).
    */
  def lshTopKIndexed(spark: SparkSession, indexPath: String, query: DataFrame,
      k: Int, planes: Int = 8, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val qVec = query.select(col(vecCol)).head().getSeq[Float](0)
    val buckets = probeBuckets(signatureOf(qVec, planes), planes)
    val qLit = typedlit(qVec.toArray)
    spark.read.parquet(indexPath)
      .filter(col("sig").isin(buckets: _*))
      .withColumn("cosine", cosine(col(vecCol), qLit))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cosine"))
  }
}
