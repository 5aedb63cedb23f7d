package graft

import org.apache.spark.sql.SparkSession

/** Executed-plan sweep over EVERY SparkEntry query: runs each at the given
  * scale factor and audits the AQE-final plan for (a) SortAggregate — the
  * silent HashAggregate downgrade a var-length/complex aggregation buffer
  * triggers (sorts every partition; see Dedup.scala:125) — and (b) operators
  * left outside whole-stage codegen. Known-legitimate nodes (shuffles,
  * sort-merge-join sorts, ObjectHashAggregate for the bounded top-k
  * TypedImperativeAggregate, InMemoryTableScan, capped-pairs Window) are
  * listed but not counted as findings.
  *
  * Usage: runMain graft.PlanSweep [sfDir]  (default /root/testdata/sf0.001)
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-plan-sweep")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var sortAggs = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.count() // execute so AQE finalizes the plan
        val ep = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val planStr = ep.toString
        val sa = planStr.linesIterator.count(_.contains("SortAggregate"))
        sortAggs += sa
        // operator lines: the root (line 0) plus every tree-drawn child —
        // `+- ` AND `:- ` (left children of binary nodes like joins)
        val opLines = planStr.linesIterator.zipWithIndex.filter { case (l, i) =>
          i == 0 || l.contains("+- ") || l.contains(":- ")
        }.map(_._1).toSeq
        val nonCodegen = opLines
          .filter(l => !l.contains("*("))
          // strip ALL leading tree-drawing characters (nested join branches
          // render as ":  +- Exchange"), not just one prefix
          .map(_.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-' || c == '|')
            .takeWhile(_ != ' '))
        val regions = "\\*\\((\\d+)\\)".r.findAllMatchIn(planStr).map(_.group(1)).toSet
        println(s"[sweep] $name: regions=${regions.size} sortAgg=$sa " +
          s"nonCodegen=${nonCodegen.groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted.mkString("{", ", ", "}")}")
        if (sa > 0)
          planStr.linesIterator.filter(_.contains("SortAggregate"))
            .foreach(l => println(s"[sweep] $name SORTAGG: " + l.trim.take(160)))
      } catch { case e: Throwable =>
        println(s"[sweep] $name: FAILED ${e.getMessage}")
      }
    }
    println(s"[sweep] TOTAL SortAggregates across all queries: $sortAggs")
    spark.stop()
  }
}
