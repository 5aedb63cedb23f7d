package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: attributes the otlp_proto decode cost between the protobuf
  * wire walk itself and the typed-flatMap Encoder boundary (Scala Map ->
  * Catalyst conversion), against the pure-scan baseline on the same binary
  * column. Decides whether promoting the decode to a Generator expression
  * (direct UnsafeRow writes) is worth it: if parse-only ~= full decode,
  * the boundary is cheap and a Generator buys nothing.
  *
  * Input: the ScaleUp kafka table (`/tmp/graft_scaleup/kafka_logs_<n>`).
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_scaleup/kafka_logs_6000000"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.columnarReaderBatchSize", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = spark.read.parquet(path)
    val bytes = df.agg(sum(length(col("value")))).collect().head.getLong(0)

    def timed(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DECODE_PROBE $name sec=$sec%.2f mb_per_sec=${bytes / 1e6 / sec}%.1f out=$out")
    }

    timed("scan_baseline") {
      df.agg(sum(length(col("value")))).collect().head.getLong(0)
    }
    // parse-only: full wire walk, rows counted executor-side, ONE long per
    // message crosses the Encoder boundary
    timed("parse_only") {
      df.select(col("value")).as[Array[Byte]]
        .mapPartitions { it =>
          var n = 0L
          it.foreach { b =>
            try n += graft.sources.OtlpProto.parseLogsData(b).size
            catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => () }
          }
          Iterator.single(n)
        }.reduce(_ + _)
    }
    // full decode: every row (incl. 4 map columns) crosses the boundary
    timed("full_decode") {
      graft.sources.LogSources.fromKafka(df, "otlp_proto").count()
    }
    spark.stop()
  }
}
