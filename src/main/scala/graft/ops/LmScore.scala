package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model perplexity scoring for training-data quality
  * filtering (Wenzek et al. 2019 score CommonCrawl docs with a KenLM 5-gram
  * and keep the low-perplexity tail; the same shape with an offline,
  * deterministic, self-contained model): TRAIN a capped bigram LM over a
  * corpus, then SCORE every document with one broadcast pass.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the training pass is two map-side-combine aggregations (unigram +
  *    bigram counts) followed by driver-side top-k; `vocabSize`/`bigramCap`
  *    bound the collected model regardless of corpus size, and the
  *    deterministic (count DESC, term ASC) order makes the cap reproducible
  *    across partitionings and engines;
  *  - the scoring pass is a single whole-stage-codegen projection over a
  *    broadcast model — zero shuffle, scan speed; the join formulation
  *    would shuffle every token of the corpus.
  *
  * Determinism across engines (the oracle constraint): each bigram term is
  * quantized to a fixed-point `round(log2(p) * 1e6)` BIGINT before summing,
  * so the per-doc sum is exact integer arithmetic — immune to float
  * summation order — and only the final `2^(-avg)` is floating point
  * (rounded to 4 decimals). Rounding is half-away-from-zero on both
  * engines (BigDecimal HALF_UP == DuckDB round).
  *
  * Model definition (documented; Laplace instead of CCNet's Kneser-Ney
  * because the model must be reproducible in plain SQL):
  *  - vocab = top-`vocabSize` whitespace tokens, OOV -> `<unk>`;
  *  - p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V + 1), where c(w1) is the
  *    mapped unigram count and V+1 counts `<unk>`;
  *  - bigrams beyond `bigramCap` (count DESC, gram ASC) score as unseen.
  */
object LmScore {

  /** Driver-small trained model (bounded by vocabSize/bigramCap). */
  final case class BigramLm(
      vocab: Array[String],
      uniCounts: Array[(String, Long)],
      biCounts: Array[(String, Long)],
      vTot: Long) // |vocab| + 1 (<unk>)

  private def words(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** Two aggregation passes + deterministic driver-side top-k. */
  def train(
      corpus: DataFrame,
      textCol: Column,
      vocabSize: Int = 20,
      bigramCap: Int = 10000): BigramLm = {
    val ws = words(textCol)
    val uni = corpus.select(explode(ws).as("w")).filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val vocab = uni.orderBy(col("c").desc, col("w").asc).limit(vocabSize)
      .collect().map(_.getString(0))

    // mapped tokens (OOV -> <unk>), then per-doc adjacent pairs. The fence
    // stops CollapseProject from inlining the map transform into BOTH
    // element_at calls of the pair transform — inlined, the mapped array is
    // recomputed per pair index, turning the pass O(tokens^2) per doc
    // (measured 11.7 s vs 0.9 s at sf0.1).
    val mapped = transform(ws,
      w => when(w.isin(vocab.toSeq: _*), w).otherwise(lit("<unk>")))
    val uniMapped = corpus.select(explode(mapped).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val mappedDf = corpus
      .select(graft.functions.OptimizerFence(mapped).as("mw"))
    val mw = col("mw")
    // sequence(1, 0) is DESCENDING in Spark, so guard docs with < 2 tokens
    val grams = mappedDf
      .select(explode(when(size(mw) >= 2, transform(
        sequence(lit(1), size(mw) - 1),
        i => concat_ws(" ", element_at(mw, i), element_at(mw, i + 1))))
        .otherwise(array().cast("array<string>"))).as("g"))
      .filter(length(col("g")) > 1)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g").asc).limit(bigramCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    BigramLm(vocab, uniMapped, grams, vocab.length + 1L)
  }

  /** Scoring columns over a trained model: struct kernel + final ppl. */
  def scoreColumns(lm: BigramLm, textCol: Column): Seq[(String, Column)] = {
    val s = graft.functions.LmScoreStats(textCol, lm)
    val nB = s.getField("n_bigrams")
    val ppl = when(nB > 0,
      round(pow(lit(2.0),
        -s.getField("sum_logp_e6").cast("double") / (nB * lit(1e6))), 4))
      .otherwise(lit(0.0))
    Seq(
      "n_tokens" -> s.getField("n_tokens"),
      "n_oov" -> s.getField("n_oov"),
      "n_bigrams" -> nB,
      "sum_logp_e6" -> s.getField("sum_logp_e6"),
      "ppl" -> ppl)
  }
}
