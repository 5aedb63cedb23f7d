package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 line-level cleaning + Gopher document-level rules — the published
  * heuristic filter battery (Raffel et al. 2020 §2.2 "Colossal Clean
  * Crawled Corpus"; Rae et al. 2021 §A1.1) that public training-data
  * pipelines run over raw web text before anything else.
  *
  * All statistics come from ONE [[graft.functions.C4Stats]] kernel pass
  * (line split + word walk shared across every signal, whole-stage
  * codegen); the doc-level flags are plain Catalyst column arithmetic over
  * the struct. Zero shuffle — at 100 TB this battery is a scan-speed
  * projection, and a `cleanCorpus` keep-filter pushes straight into the
  * scan.
  *
  * Every fraction rounds to 6 decimals (HALF_UP on both engines) before
  * any threshold compare, so keep-decisions are bit-identical
  * cross-engine.
  */
object CleanFilters {

  /** Gopher's required-stopword set (§A1.1: "contains at least two of ..."). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document C4 columns from a [[graft.functions.C4Stats]] struct `s`
    * and the raw text: line counts, the reconstructed kept page (md5 so the
    * oracle compares it byte-exact), and the page-level keep flag
    * (≥3 kept lines, no '{', no "lorem ipsum" — C4's page drops).
    */
  def c4Columns(s: Column, text: Column): Seq[(String, Column)] = Seq(
    "n_lines" -> s.getField("n_lines"),
    "n_kept" -> s.getField("n_kept"),
    "kept_chars" -> length(s.getField("kept_text")).cast("long"),
    "kept_md5" -> md5(s.getField("kept_text")),
    "c4_keep" -> (s.getField("n_kept") >= 3 &&
      !text.contains("{") && !lower(text).contains("lorem ipsum")))

  /** Per-document Gopher rule columns from the same struct: word-count
    * bounds, mean word length, symbol-to-word ratio (# + "..."), bullet /
    * ellipsis line fractions, alpha-word fraction, required-stopword count,
    * and the conjunction keep flag.
    */
  def gopherColumns(s: Column, text: Column): Seq[(String, Column)] = {
    val nWords = s.getField("n_words")
    val nLines = s.getField("n_lines")
    val meanWordLen = when(nWords > 0,
      round(s.getField("word_chars").cast("double") / nWords, 4)).otherwise(lit(0.0))
    val nHash = size(regexp_extract_all(text, lit("#"), lit(0)))
    val nEll = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = when(nWords > 0,
      round((nHash + nEll).cast("double") / nWords, 6)).otherwise(lit(0.0))
    val bulletFrac = when(nLines > 0,
      round(s.getField("n_bullet_lines").cast("double") / nLines, 6)).otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      round(s.getField("n_ellipsis_lines").cast("double") / nLines, 6)).otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      round(s.getField("n_alpha_words").cast("double") / nWords, 6)).otherwise(lit(0.0))
    val nStop = graft.functions.CountInSet(
      split(graft.functions.FastLower(text), "\\s+"), gopherStopwords).cast("long")
    val keep = nWords.between(50, 100000) &&
      meanWordLen.between(3.0, 10.0) &&
      symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 &&
      ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 &&
      nStop >= 2
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanWordLen,
      "symbol_ratio" -> symbolRatio,
      "bullet_frac" -> bulletFrac,
      "ellipsis_frac" -> ellipsisFrac,
      "alpha_word_frac" -> alphaFrac,
      "n_stopwords" -> nStop,
      "gopher_keep" -> keep)
  }

  /** Cleaned corpus: C4 page keep AND Gopher keep, with the text replaced
    * by the C4 line-filtered reconstruction. One kernel pass, the filter
    * and projection fused into the scan.
    */
  def cleanCorpus(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withS = docs.withColumn("__s",
      graft.functions.OptimizerFence(graft.functions.C4Stats(col(textCol))))
    val c4 = c4Columns(col("__s"), col(textCol)).toMap
    val go = gopherColumns(col("__s"), col(textCol)).toMap
    withS.filter(c4("c4_keep") && go("gopher_keep"))
      .withColumn(textCol, col("__s").getField("kept_text"))
      .drop("__s")
  }
}
