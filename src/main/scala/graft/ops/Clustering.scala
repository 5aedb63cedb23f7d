package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NearestCentroid

/** SemDeDup-style semantic clustering for training-data curation (Abbas et
  * al. 2023 cluster corpus embeddings with k-means, then dedup/sample
  * within clusters; Lloyd's k-means itself per MacQueen/Lloyd, public):
  * fixed-iteration, deterministically-initialized k-means over an
  * embedding column.
  *
  * Scale shape: each iteration is ONE broadcast codegen pass (the k×dim
  * centroid table rides in the kernel reference object — never a join) +
  * one (cluster, dim) aggregation whose group count is k×dim regardless of
  * corpus size; map-side partial aggregation means the shuffle moves
  * O(partitions × k × dim) rows, not O(corpus). Driver state is k×dim
  * doubles. At 100 TB with k=64k SemDeDup-scale clusters the same plan
  * holds (the kernel loop is k×dim flops/row — IVF-index the centroids
  * inside the worker if k grows past ~10^5).
  *
  * Determinism across engines (oracle constraint):
  *  - init = the k lowest-id vectors (float->double, exact both engines);
  *  - per-(vec, centroid) distance folds squared diffs dimension-ASCENDING
  *    with plain IEEE adds -> bit-identical doubles vs DuckDB's ordered
  *    list_reduce; argmin compares round(dist*1e6) BIGINTs, ties to the
  *    lower cluster id;
  *  - updated centroid means quantize to 6 decimals (HALF_UP both
  *    engines) before the next pass, so cross-row float-sum order noise
  *    cannot propagate;
  *  - empty clusters keep their previous centroid.
  */
object Clustering {

  /** Returns (vec_id, cluster, dist_e6) after `iters` Lloyd iterations. */
  def kmeans(
      embs: DataFrame,
      idCol: Column,
      vecCol: Column,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    val init: Array[Array[Double]] = embs
      .select(idCol.as("vec_id"), vecCol.as("v"))
      .orderBy(col("vec_id").asc).limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    var centroids = init
    var assigned: DataFrame = null
    var it = 0
    while (it < iters) {
      assigned = embs.select(
        idCol.as("vec_id"), vecCol.as("v"),
        NearestCentroid(vecCol, centroids.map(_.toSeq).toSeq).as("a"))
      if (it < iters - 1) {
        val sums = assigned
          .select(col("a.cluster").as("cl"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cl"), col("pos"))
          .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = centroids.map(_.clone()) // empty clusters keep previous
        sums.foreach { r =>
          val cl = r.getInt(0)
          next(cl)(r.getInt(1)) = BigDecimal(r.getDouble(2) / r.getLong(3))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        centroids = next
      }
      it += 1
    }
    assigned.select(col("vec_id"), col("a.cluster").as("cluster"),
      col("a.dist_e6").as("dist_e6"))
  }
}
