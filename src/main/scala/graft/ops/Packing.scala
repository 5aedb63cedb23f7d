package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget context windows ("concat-and-chunk": the corpus is
  * conceptually concatenated in a deterministic order and cut every
  * `tokenBudget` tokens; a document's bin is where its first token lands).
  *
  * Scale stance: one GLOBAL running sum is a single-partition sort — the
  * classic scale killer — so packing is sharded: documents hash into
  * `shards` independent streams and each shard packs in parallel (what a
  * real 100 TB pipeline does anyway: pack per output file). The
  * within-shard running sum is a window partitioned BY shard, so Spark
  * runs `shards` windows concurrently off one shuffle, and the shard
  * count — not the corpus size — bounds each sort.
  */
object Packing {

  /** Per-document bin assignment: (shard, bin, tok_offset) columns added.
    * Deterministic: shard = doc_id % shards (content-stable), order within
    * a shard = doc_id. `tokens` is any token-count column (e.g.
    * [[TextOps.wsTokenCount]]).
    */
  def packSequences(docs: DataFrame, tokens: Column, tokenBudget: Int,
      shards: Int, idCol: String = "doc_id"): DataFrame = {
    require(tokenBudget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      // bin = where the doc's FIRST token lands in the concatenated stream
      .withColumn("tok_offset", col("tok_end") - col("n_tokens"))
      .withColumn("bin", (col("tok_offset") / tokenBudget).cast("long"))
      .drop("tok_end")
  }

  /** Bin-level stats (docs per window, fill level) — the packing audit a
    * pipeline runs before training.
    */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  /** Length-bucketed batch assembly with a padding-waste audit — the
    * "sorted batching" a padded-batch trainer runs: group samples of
    * similar length into fixed-size batches so each batch pads to ITS
    * max, not the corpus max.
    *
    * Buckets are power-of-two length ranges (bucket = bit-length of the
    * token count, clamped at `maxBucket`) — fixed boundaries, no
    * quantile pass, and exactly reproducible on any engine via
    * `length(bin(n))`. A global length sort is a single-partition
    * window (the scale killer), so batching is SHARDED like
    * [[packSequences]]: samples hash into `shards` independent streams
    * per bucket, each (bucket, shard) forms batches locally off one
    * shuffle — what a multi-writer 100 TB pipeline does anyway. Within
    * a shard, samples are taken longest-first so near-equal lengths
    * share a batch; batch padding = batch_size × its max length.
    *
    * Emits the per-bucket audit: sample/batch counts, real vs padded
    * token totals, waste fraction.
    */
  def lengthBucketBatches(samples: DataFrame, tokens: Column,
      batchSize: Int, shards: Int, idCol: String = "conv_id",
      orderCol: String = "turn_idx", maxBucket: Int = 16): DataFrame = {
    require(batchSize > 0 && shards > 0 && maxBucket > 0)
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tokens").desc, col(idCol), col(orderCol))
    samples
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("bucket", least(lit(maxBucket),
        length(bin(greatest(col("n_tokens"), lit(1))))).cast("int"))
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("batch",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("bucket"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("toks"))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_samples"),
        count(lit(1)).as("n_batches"),
        sum(col("toks")).as("sum_tokens"),
        sum(col("n") * col("max_len")).as("padded_tokens"))
      .withColumn("waste_pct",
        round((col("padded_tokens") - col("sum_tokens")).cast("double") /
          col("padded_tokens"), 6))
  }

  /** Within-document retrieval chunking (the RAG prep step): fixed
    * `chunkTokens` windows starting every `stride` tokens (overlap =
    * chunkTokens - stride), every token covered, the final chunk clipped
    * short. Chunk count K = max(0, ceil((n - chunkTokens)/stride)) + 1, so
    * a document at or under the chunk size emits exactly one chunk. Stable
    * ids: chunk_id = md5(doc_id ":" k) survives re-chunking runs. Pure
    * generate + projection — zero shuffle, scan-speed at any corpus size.
    */
  def ragChunks(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = split(trim(col(textCol)), "\\s+")
    val kMax = greatest(lit(0),
      ((size(col("t")) - lit(chunkTokens) + lit(stride) - 1) / lit(stride))
        .cast("int"))
    docs.select(col(idCol), t.as("t"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0), kMax)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride + 1).as("start_tok"),
        slice(col("t"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("c"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size(col("c")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(":", col(idCol), col("chunk_idx"))).as("chunk_id"),
        md5(concat_ws(" ", col("c"))).as("chunk_md5"))
  }
}
