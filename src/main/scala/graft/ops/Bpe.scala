package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeStats

/** Byte-pair-encoding tokenizer trained on the corpus itself (Sennrich et
  * al. 2016 — the subword vocabulary construction used by GPT-2/LLaMA-class
  * pipelines for token accounting and sequence budgeting).
  *
  * Scale shape (the 100-TB argument):
  *  - TRAIN touches the corpus exactly ONCE — a map-side-combine word-count
  *    aggregation whose output is bounded by the vocabulary, not the corpus;
  *    every one of the k merge iterations then runs over that bounded dict
  *    (pair explode + count + top-1), which is the published trick that
  *    makes BPE training tractable: pair statistics only depend on (word,
  *    freq), never on token positions in documents;
  *  - ENCODE is one whole-stage-codegen projection with the merge table
  *    broadcast inside the kernel reference object — zero shuffle, zero
  *    joins, scan speed — and per-word memoization makes the per-row cost
  *    proportional to distinct words per partition.
  *
  * Determinism across engines (the oracle constraint): each iteration picks
  * the max-count pair with (count DESC, pair-string ASC) tie-break over the
  * same `|a| |b|` pipe-delimited pair format the DuckDB oracle groups on;
  * merge application is greedy leftmost non-overlapping — exactly string
  * `replace` semantics on the pipe-delimited form, so the oracle replicates
  * the whole trainer AND encoder with nested `replace()` calls.
  */
object Bpe {

  /** Driver-small learned model: merge pairs in rank order. */
  final case class BpeModel(merges: Array[(String, String)])

  /** One corpus pass (word dict) + `numMerges` bounded-dict iterations.
    * A merge is only adopted while its pair count ≥ `minPairCount`
    * (matching the oracle's `WHERE c >= 2` guard).
    */
  def train(
      corpus: DataFrame,
      textCol: Column,
      numMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    // ONE distributed corpus pass builds the (word, freq) dict — bounded
    // by the vocabulary, not the corpus, i.e. the same driver-smallness
    // contract as the NB/BM25/DSIR model collects. The k merge iterations
    // then run LOCALLY over the collected dict, reusing the very same
    // BpeWorker the distributed form evaluated per row, so pair counts and
    // the (count DESC, pair ASC) tie-break are bit-identical (symbols are
    // [a-z| ]-ASCII, where Java string order == UTF8 binary order).
    // Round 6: each Spark-side iteration cost ~0.5 s of Catalyst planning
    // + codegen against ~milliseconds of actual dict work, 6 iterations
    // deep — the training loop now costs one aggregation job total.
    val dict = corpus
      .select(explode(
        regexp_extract_all(lower(textCol), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val worker = new graft.functions.BpeWorker(merges.toArray)
      val counts = new java.util.HashMap[String, Long]()
      dict.foreach { case (w, f) =>
        val syms = worker.encodeSyms(w)
        var i = 0
        while (i < syms.length - 1) {
          val p = "|" + syms(i) + "| |" + syms(i + 1) + "|"
          counts.merge(p, f, (a, b) => a + b)
          i += 1
        }
      }
      var bestP: String = null
      var bestC = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue >= minPairCount &&
            (e.getValue > bestC ||
              (e.getValue == bestC && (bestP == null || e.getKey < bestP)))) {
          bestP = e.getKey
          bestC = e.getValue
        }
      }
      if (bestP == null) done = true
      else {
        val parts = bestP.substring(1, bestP.length - 1).split("\\| \\|", 2)
        merges += ((parts(0), parts(1)))
      }
    }
    BpeModel(merges.toArray)
  }

  /** Encoding columns over a trained model: one codegen kernel pass. */
  def encodeColumns(model: BpeModel, textCol: Column): Seq[(String, Column)] = {
    val s = BpeStats(textCol, model.merges.toSeq)
    Seq(
      "n_words" -> s.getField("n_words"),
      "n_tokens" -> s.getField("n_tokens"),
      "tokens" -> s.getField("tokens"))
  }
}
