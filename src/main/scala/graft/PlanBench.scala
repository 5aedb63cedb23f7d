package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Exporter, Pipeline}
import graft.sources.Transcripts

/** Diagnoses Catalyst planning cost of the full pipeline plan. */
object PlanBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = Transcripts.generate(spark, 1000, 42L)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[plan] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def nodeCount(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Long = {
      var n = 0L
      def walk(t: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Unit = {
        n += 1
        t.children.foreach(c => walk(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]]))
        t match {
          case q: org.apache.spark.sql.catalyst.plans.QueryPlan[_] =>
            q.expressions.foreach(walk)
          case _ => ()
        }
      }
      walk(p); n
    }
    val logs = Transcripts.toLogFrame(input)
    val routed = time("compile")(Pipeline.compile(SparkEntry.transcriptPipeline)(logs))
    val an = time("analyze routed")(routed.queryExecution.analyzed)
    println("[plan] analyzed routed nodes: " + nodeCount(an))
    val opt = time("optimize routed")(routed.queryExecution.optimizedPlan)
    println("[plan] optimized routed nodes: " + nodeCount(opt))
    time("plan routed")(routed.queryExecution.executedPlan)
    // the FULL flagship path including the enrich stage (round-3 verdict
    // #5's audit target: zero non-codegen operators WITH enrich in the plan)
    val main0 = Exporter.logsV2(graft.pipeline.Enrich.roleToolEnrich(routed))
    val an2 = time("analyze logsV2+barrier")(main0.queryExecution.analyzed)
    println("[plan] analyzed logsV2 nodes: " + nodeCount(an2))
    val opt2 = time("optimize logsV2+barrier")(main0.queryExecution.optimizedPlan)
    println("[plan] optimized logsV2 nodes: " + nodeCount(opt2))
    time("plan logsV2+barrier")(main0.queryExecution.executedPlan)
    // execute THIS QueryExecution first (count() would plan a separate
    // aggregation query): with the enrich broadcast join in the plan AQE
    // wraps it in AdaptiveSparkPlan, and codegen collapse only appears in
    // the FINAL plan after the run
    time("run logsV2")(println("[plan] rows=" + main0.queryExecution.toRdd.count()))
    auditExecuted("logsV2", main0)

    // traces + metrics exporter slices: same audit — the span shaping and
    // the fingerprint-chain projections are pure kernels and must stay in
    // one codegen region each (no higher-order functions / CodegenFallback)
    import org.apache.spark.sql.functions.{col, sum, xxhash64}
    val ev = graft.sources.DataGen.events(spark, 1000L)
    val spans = graft.pipeline.TraceExporter.spansV3(TraceQueries.spansFrom(ev))
      .select(xxhash64(col("span_id"), col("references"),
        col("resource_fingerprint"), col("http_host")).as("h"))
    time("run spansV3")(println("[plan] span rows=" +
      spans.queryExecution.toRdd.count()))
    auditExecuted("spansV3", spans)
    val samples = graft.pipeline.MetricsExporter.samplesV4(
      graft.pipeline.MetricsExporter.scalarPoints(MetricQueries.gaugesFrom(ev)))
      .select(xxhash64(col("fingerprint"), col("unix_milli"), col("value")).as("h"))
    time("run samplesV4")(println("[plan] sample rows=" +
      samples.queryExecution.toRdd.count()))
    auditExecuted("samplesV4", samples)
    spark.stop()
  }

  /** Post-execution codegen audit of the AQE-final plan: counts wholestage
    * regions and prints every operator left outside codegen.
    */
  private def auditExecuted(label: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val ep = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println(s"[plan] $label executed plan string size: " + ep.toString.length)
    val planStr = ep.toString
    val codegenIds = "\\*\\((\\d+)\\)".r.findAllMatchIn(planStr).map(_.group(1)).toSet
    // root line + `+- ` + `:- ` children (left sides of joins render as :-)
    def opLines = planStr.linesIterator.zipWithIndex.collect {
      case (l, i) if i == 0 || l.contains("+- ") || l.contains(":- ") => l
    }
    val interpretedNodes = opLines.count(l => !l.contains("*("))
    println(s"[plan] $label wholestage regions: " + codegenIds.size +
      " " + codegenIds.toSeq.sorted.mkString("[", ",", "]") +
      ", non-codegen operators: " + interpretedNodes +
      ", top: " + planStr.linesIterator.take(1).mkString)
    opLines.filter(l => !l.contains("*("))
      .foreach(l => println(s"[plan] $label NON-CODEGEN: " + l.trim))
  }
}
