package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism helper (guide §2: derive partitioning from
  * the input, never a constant tuned for one deployment).
  *
  * A small parquet input (single row group) plans as ONE scan task, so a
  * compute-heavy per-row kernel stage (shingling, md5 featurization,
  * decode) serializes on one core of the whole host. `widen` repartitions
  * by a deterministic key ONLY when the planned scan parallelism is below
  * the session's default parallelism; on a production-sized input the scan
  * is already wide and this is a no-op — no constant partition counts, no
  * behavior change at scale. Hash partitioning on the id keeps the
  * row-to-partition map deterministic under task retry (no round-robin /
  * rand keys, SPARK-38388).
  */
object Par {
  def widen(df: DataFrame, by: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical planning only — no job runs
    val planned = df.rdd.getNumPartitions
    if (planned * 2 <= target) df.repartition(target, by) else df
  }
}
