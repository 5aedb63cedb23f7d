package graft
import org.apache.spark.sql.SparkSession
/** Local smoke runner: flagship entry + per-query row counts. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    e.show(50, false)
    SparkEntry.queries.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      val c = f(spark, "/root/testdata/sf0.001").count()
      println(f"[smoke] $n rows=$c (${(System.nanoTime()-t0)/1e9}%.2fs)")
    }
    spark.stop()
  }
}
