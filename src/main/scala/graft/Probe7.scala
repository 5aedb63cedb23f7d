package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-6 dev probe: kernel-vs-composed quality score at full precision. */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id").isin(1L, 36L, 1425L, 2723L, 3651L))
    val k = TextOps.qualityColumns(col("text")).toMap
    val c = TextOps.qualityColumnsComposed(col("text")).toMap
    docs.select(col("doc_id"),
        k("quality_score").as("k_score"), c("quality_score").as("c_score"),
        k("alpha_ratio").as("k_alpha"), c("alpha_ratio").as("c_alpha"),
        k("stopword_ratio").as("k_stop"), c("stopword_ratio").as("c_stop"),
        k("punct_ratio").as("k_punct"), c("punct_ratio").as("c_punct"))
      .collect().foreach { r =>
        println(s"[p7] doc=${r.getLong(0)} kScore=${r.getDouble(1)} cScore=${r.getDouble(2)}")
        println(s"[p7]   alpha k=${java.lang.Double.toString(r.getDouble(3))} c=${java.lang.Double.toString(r.getDouble(4))} bits=${java.lang.Double.doubleToLongBits(r.getDouble(3))}/${java.lang.Double.doubleToLongBits(r.getDouble(4))}")
        println(s"[p7]   stop k=${r.getDouble(5)} c=${r.getDouble(6)} punct k=${r.getDouble(7)} c=${r.getDouble(8)}")
        // recompute x both ways on the driver
        val a = r.getDouble(3); val s0 = r.getDouble(5); val p0 = r.getDouble(7)
        val x = a * 0.5 + math.min(s0 * 4.0, 1.0) * 0.3 +
          (1.0 - math.min(p0 * 5.0, 1.0)) * 0.2
        println(s"[p7]   x=${java.lang.Double.toString(x)} " +
          s"valueOf=${java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)} " +
          s"scalaBD=${scala.math.BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)}")
      }
    spark.stop()
  }
}
