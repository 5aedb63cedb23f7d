package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): times individual declared
  * queries with the SAME methodology as the frozen [[Bench]] part 2 (one
  * shared session, `df.count()` as the action, shuffle.partitions = cores)
  * so numbers are comparable to BENCH.json, and optionally dumps
  * `.explain("formatted")` per query for the plans/r06 artifacts.
  *
  * Usage:
  *   runMain graft.BenchExtra q_a,q_b[,...] [reps] [planTag]
  *     - query list, or "top" (the 12 slowest of BENCH_r05), or "all"
  *     - reps: timed repetitions per query (default 1; min reported)
  *     - planTag: if set, writes plans/r06/<query>_<planTag>.txt
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object BenchExtra {
  val top: Seq[String] = Seq(
    "q_containment", "q_ngram_jaccard", "q_dsir", "q_semdedup", "q_dedup_pr",
    "q_conv_containment", "q_bpe", "q_firehose_metrics", "q_decontaminate",
    "q_dup_clusters", "q_conv_neardup", "q_countmin")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names: Seq[String] = args.headOption.getOrElse("top") match {
      case "top" => top
      case "all" => SparkEntry.queries.keys.toSeq.sorted
      case s => s.split(",").toSeq
    }
    val reps = if (args.length > 1) args(1).toInt else 1
    val planTag = if (args.length > 2) Some(args(2)) else None

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup as Bench part 2
    try SparkEntry.queries.get("q_token_counts").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }

    planTag.foreach(_ => new java.io.File("/root/repo/plans/r06").mkdirs())
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      planTag.foreach { tag =>
        try {
          val txt = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"/root/repo/plans/r06/${name}_$tag.txt", "UTF-8")
          try w.println(txt) finally w.close()
        } catch { case e: Throwable =>
          System.err.println(s"[extra] explain $name failed: $e")
        }
      }
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[extra] $name failed: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        dt
      }
      println(f"[extra] $name%-24s min=${times.min}%7.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
      name -> times.min
    }
    println(f"[extra] TOTAL(min) = ${results.map(_._2).sum}%.3f s over ${results.size} queries")
    spark.stop()
  }
}
