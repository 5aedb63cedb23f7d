package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Dedup}

/** Round-6 dev probe: stage-isolated timings for the slow queries
  * (guide §1.4 — noop-sink / count isolation per subtree).
  */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val embs = spark.read.parquet(s"$d/embeddings.parquet")
    docs.count(); embs.count() // warm

    // ---- q_semdedup decomposition
    val model = Clustering.kmeansModel(embs, col("vec_id"), col("embedding"), 8, 2)
    time("kmeansModel again")(
      { Clustering.kmeansModel(embs, col("vec_id"), col("embedding"), 8, 2); 0L })
    locally {
      // inlined semDedup stages
      val assigned = model.assigned
      val keyed = assigned.select(col("vec_id").as("id"), col("cluster"),
        col("v"), col("dist_e6"))
      val edges = Dedup.probeCappedPairs(keyed.select("id", "cluster", "v"),
          Seq("cluster"), 256, carry = Seq("v"))
        .withColumn("cosine", graft.ops.Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.35)
        .select("a", "b")
      time("semdedup edges")(edges.count())
      time("semdedup edges rep2")(edges.count())
      var comp: org.apache.spark.sql.DataFrame = null
      time("semdedup CC call (eager)")(
        { comp = Dedup.connectedComponents(edges); 0L })
      time("semdedup CC count")(comp.count())
      time("semdedup CC call rep2")(
        { Dedup.connectedComponents(edges); 0L })
      locally {
        import org.apache.spark.sql.expressions.Window
        val compSel = comp.select(col("id"), col("label").as("component"))
        val w = Window.partitionBy(col("component"))
          .orderBy(col("dist_e6").desc, col("id").asc)
        val members = keyed.join(compSel, Seq("id"))
          .withColumn("keep", row_number().over(w) === 1)
        val singles = keyed.join(compSel.select("id"), Seq("id"), "left_anti")
          .withColumn("component", lit(null).cast("long"))
          .withColumn("keep", lit(true))
        val out = members.unionByName(singles).select(col("id").as("vec_id"),
          col("cluster"), col("dist_e6"), col("component"), col("keep"))
        time("semdedup tail (members+singles)")(out.count())
      }
      time("semdedup full")(Dedup.semDedup(model.assigned, threshold = 0.35).count())
      time("semdedup full rep2")(Dedup.semDedup(model.assigned, threshold = 0.35).count())
    }

    // ---- q_dup_clusters decomposition
    val bandRows = Dedup.minhashBandRows(docs, shingleN = 3, k = 16, bands = 4)
    time("minhash bandRows")(bandRows.count())
    time("minhash bandRows rep2")(bandRows.count())
    val capped = Dedup.probeCappedPairs(bandRows, Seq("band"), 256)
    time("minhash cappedPairs")(capped.count())
    time("minhash cappedPairs rep2")(capped.count())
    val cand = Dedup.minhashCandidates(docs, shingleN = 3, k = 16, bands = 4,
      maxBandGroup = 256)
    time("minhash candidates")(cand.count())
    time("minhash candidates rep2")(cand.count())
    time("dup_clusters full")(Dedup.dupClusters(cand).count())

    // ---- firehose + countmin
    val ev = spark.read.parquet(s"$d/events.parquet")
    println(s"[p6] events scan partitions = ${ev.rdd.getNumPartitions}")
    val fn1 = SparkEntry.queries("q_firehose_metrics")
    time("q_firehose_metrics")(fn1(spark, d).count())
    time("q_firehose_metrics rep2")(fn1(spark, d).count())
    val fn2 = SparkEntry.queries("q_countmin")
    time("q_countmin")(fn2(spark, d).count())
    val fn3 = SparkEntry.queries("q_conv_neardup")
    time("q_conv_neardup")(fn3(spark, d).count())
    val fn4 = SparkEntry.queries("q_dedup_minhash")
    time("q_dedup_minhash")(fn4(spark, d).count())
    spark.stop()
  }
}
