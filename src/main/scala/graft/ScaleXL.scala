package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.pipeline.{Exporter, Pipeline}
import graft.sources.{DataGen, Transcripts}

/** XL scale ladder — one-off evidence beyond the per-round scaleup battery:
  * the flagship parse→route→export pipeline at THREE input decades
  * (sf0.1-equivalent ~1.66 M turns → ~25 M → ~100 M turns / ~4 GB of
  * transcript parquet), and the two headline dedup shapes at 4× the
  * battery's 100× corpus (2 M docs). Near-flat rows/sec across the ladder
  * is the "would this hold at 1000×?" statement: per-query overhead
  * amortizes away and no shuffle path degrades super-linearly as the input
  * grows another 4×.
  *
  * Standalone: `runMain graft.ScaleXL` (env `SPARK_GRAFT_XL_CONVS` overrides
  * the top rung). Prints ONE JSON line; the full object also goes to
  * `SCALEXL.json` in the cwd.
  */
object ScaleXL {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def materialize(spark: SparkSession, path: String, files: Int)(
      gen: => DataFrame): DataFrame = {
    if (!new java.io.File(s"$path/_SUCCESS").exists)
      gen.repartition(files).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private def dirBytes(path: String): Long = {
    val d = new java.io.File(path)
    Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
  }

  /** Warm once, then best of 2 (same discipline as ScaleUp.op). */
  private def best2(run: => Long): (Long, Double) = {
    run
    val r = (1 to 2).map(_ => timed(run))
    (r.head._1, r.map(_._2).min)
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // A fixed-cores local box under-partitions the XL rung: at 10^12 turns a
    // cluster's shuffle partition count scales with total cores, so the
    // ladder exposes it as a tunable (see BASELINE.md XL section).
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-scale-xl")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val workDir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_scaleup"
    val xlConvs = sys.env.getOrElse("SPARK_GRAFT_XL_CONVS", "24000000").toLong

    // flagship ladder: reuse the battery's materialized 400k/6M tables,
    // add the XL rung (`SPARK_GRAFT_XL_ONLY=1` runs just the top rung for
    // partition-count experiments)
    val rungList =
      if (sys.env.contains("SPARK_GRAFT_XL_ONLY")) Seq(xlConvs)
      else Seq(400000L, 6000000L, xlConvs)
    val rungs = rungList.map { convs =>
      val files = math.max(32, (convs / 100000L).toInt.min(256))
      val t = materialize(spark, s"$workDir/transcripts_$convs", files)(
        Transcripts.generate(spark, convs, seed = 42L))
      val turns = t.count()
      val bytes = dirBytes(s"$workDir/transcripts_$convs")
      val (out, sec) = best2(ScaleRun.forceEval(Exporter.logsV2(
        Pipeline.compile(SparkEntry.transcriptPipeline)(Transcripts.toLogFrame(t)))))
      System.err.println(f"[xl] flagship convs=$convs turns=$turns " +
        f"bytes=$bytes sec=$sec%.2f tput=${turns / sec}%.0f turns/s out=$out")
      (convs, turns, bytes, sec, out)
    }

    val dedupJson = if (sys.env.contains("SPARK_GRAFT_XL_ONLY")) "" else {
      // dedup pair at 4x the battery's 100x corpus
      val docs2m = materialize(spark, s"$workDir/docs_2000000", 64)(
        DataGen.documents(spark, 2000000L))
      val (exOut, exSec) = best2(
        Dedup.exact(docs2m).agg(count(lit(1)), sum(col("n_docs")))
          .collect().head.getLong(0))
      System.err.println(f"[xl] dedup_exact_2m sec=$exSec%.2f out=$exOut")
      val (mhOut, mhSec) = best2(
        Dedup.minhashCandidates(docs2m, maxBandGroup = 256)
          .agg(count(lit(1))).collect().head.getLong(0))
      System.err.println(f"[xl] dedup_minhash_2m sec=$mhSec%.2f out=$mhOut")
      f""","dedup_exact_2m":{"sec":$exSec%.2f,"docs_per_sec":${2000000 / exSec}%.0f,"out":$exOut},""" +
        f""""dedup_minhash_2m":{"sec":$mhSec%.2f,"docs_per_sec":${2000000 / mhSec}%.0f,"out":$mhOut}"""
    }

    val rungJson = rungs.map { case (convs, turns, bytes, sec, out) =>
      f""""flagship_${convs}":{"turns":$turns,"bytes":$bytes,""" +
        f""""sec":$sec%.2f,"turns_per_sec":${turns / sec}%.0f,"out":$out}"""
    }.mkString(",")
    // ladder linearity: time ratio / rows ratio between consecutive rungs
    def lin(a: (Long, Long, Long, Double, Long), b: (Long, Long, Long, Double, Long)) =
      (b._4 / a._4) / (b._2.toDouble / a._2)
    val linJson = rungs match {
      case Seq(r0, r1, r2) =>
        f""","ladder_linearity_mid":${lin(r0, r1)}%.3f,""" +
          f""""ladder_linearity_top":${lin(r1, r2)}%.3f"""
      case _ => ""
    }
    val json = f"""{"metric":"xl_ladder","cores":$cores,""" +
      f""""shuffle_partitions":$shuffleParts,$rungJson$linJson$dedupJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALEXL.json"), json)
    println(json)
    spark.stop()
  }
}
