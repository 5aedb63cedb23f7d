package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Dsir, TextOps}

/** Round-6 dev probe: stage-isolated timings for the heavy 100x scaleup
  * rows over the materialized /tmp/graft_scaleup corpora (guide §1.4).
  */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p6] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val d = spark.read.parquet("/tmp/graft_scaleup/docs_500000")
    d.count() // warm page cache

    // epoch_mix decomposition
    val score = TextOps.qualityColumns(col("text"))
      .collectFirst { case ("quality_score", c) => c }.get
    time("quality score only (500k)") {
      d.select(graft.functions.Materialize(score).as("q"))
        .agg(sum(col("q"))).collect()
      0L
    }
    time("epoch_mix full (500k)")(
      Curation.epochMix(d,
        Seq(("hi", 0.71, 2.5), ("mid", 0.66, 1.0), ("low", 0.0, 0.25)))
        .agg(count(lit(1)).as("n"), sum(col("doc_id") * col("copy_idx")).as("ck"))
        .select(col("n") + col("ck")).collect().head.getLong(0))

    // window-hash family
    time("dedup_spans (500k)")(
      Dedup.removeDuplicateSpans(d, w = 8)
        .agg(sum(col("n_kept_tokens"))).collect().head.getLong(0))
    time("substr_windows (500k)")(
      Dedup.duplicateWindowStats(d, w = 8)
        .agg(sum(col("n_dup_windows"))).collect().head.getLong(0))

    // dsir at 500k
    time("dsir train (500k)")(
      { Dsir.trainSplit(d, pmod(col("doc_id"), lit(7)) === 0, col("text"),
          buckets = 1024); 0L })

    // decontaminate at 500k
    time("decontaminate (500k)")(
      Curation.contaminated(d, d.filter(col("doc_id") % 97 === 0), n = 5)
        .agg(count(lit(1))).collect().head.getLong(0))

    // minhash at 500k
    time("dup_clusters_cc (500k)")(
      Dedup.dupClusters(Dedup.minhashCandidates(d, shingleN = 3, k = 16,
        bands = 4, maxBandGroup = 256)).agg(count(lit(1))).collect().head.getLong(0))

    time("dedup_minhash (500k)")(
      Dedup.minhashCandidates(d, shingleN = 3, k = 16, bands = 4,
        maxBandGroup = 256).agg(count(lit(1))).collect().head.getLong(0))

    spark.stop()
  }
}
