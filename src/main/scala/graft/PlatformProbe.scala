package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Platform scaling ceiling probe: a pure-CPU codegen job (hash over a
  * synthetic range — no input, no shuffle beyond one tiny agg, ~zero memory
  * traffic) at `local[cores]`. Whatever efficiency THIS job loses from N to
  * 4N threads is the host's parallel ceiling (vCPU oversubscription, SMT
  * siblings, frequency scaling), not the engine's. Used to sanity-check the
  * BENCH scaling artifact against the environment.
  */
object PlatformProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"platform-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.ansi.enabled", "false") // sum(hash) wraps by design
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // fresh DataFrame per execution: re-collecting the same instance would
      // reuse its already-computed shuffle map stage and skip all the work
      def df = spark.range(0, 2000000000L, 1, 256)
        .select(sum(xxhash64(col("id"), col("id") + 1, col("id") + 2)).as("s"))
      df.collect() // warm: codegen + JIT
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"CPUPROBE cores=$cores bestSec=${times.min}%.2f " +
        s"samples=${times.map(t => f"$t%.2f").mkString(",")}")
    } finally spark.stop()
  }
}
