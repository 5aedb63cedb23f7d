package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeStats, BpeWorker}
import graft.ops.Bpe

/** BPE trainer/encoder goldens — hand-computed merges on a closed corpus,
  * greedy-leftmost merge semantics, the min-pair-count stop, and the
  * doc-level encode kernel.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("merge application is greedy leftmost non-overlapping") {
    val w = new BpeWorker(Array(("a", "a")))
    // 'aaa': merge (0,1) -> aa, then continue AFTER it: (aa, a) is not
    // (a, a), so the tail 'a' survives — string-replace semantics
    assert(w.encodeSyms("aaa").toSeq == Seq("aa", "a"))
    assert(w.encodeSyms("aaaa").toSeq == Seq("aa", "aa"))
    val w2 = new BpeWorker(Array(("a", "b")))
    assert(w2.encodeSyms("abab").toSeq == Seq("ab", "ab"))
    // rank order matters: (a,b) first starves a later (b,c)
    val w3 = new BpeWorker(Array(("a", "b"), ("b", "c")))
    assert(w3.encodeSyms("abc").toSeq == Seq("ab", "c"))
    val w4 = new BpeWorker(Array(("b", "c"), ("a", "b")))
    assert(w4.encodeSyms("abc").toSeq == Seq("a", "bc"))
  }

  test("train: hand-computed merges, tie-break, and min-count stop") {
    // dict: aaab f=3, ab f=1, caab f=1
    //  iter1: (a,a)=7 (a,b)=5 (c,a)=1          -> merge (a,a)
    //  iter2: (a,b)=4 (aa,a)=3 (c,aa)=1 (aa,b)=1 -> merge (a,b)
    //  iter3: (aa,ab)=3 (c,aa)=1 (aa,b)=1        -> merge (aa,ab)
    //  iter4: all counts < 2                     -> stop early
    val docs = Seq("aaab aaab ab", "aaab caab").toDF("text")
    val m = Bpe.train(docs, col("text"), numMerges = 10)
    assert(m.merges.toSeq == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("encode columns: pre-tokenize, per-word encode, doc concat") {
    val docs = Seq("aaab aaab ab", "aaab caab").toDF("text")
    val m = Bpe.train(docs, col("text"), numMerges = 10)
    val cols = Bpe.encodeColumns(m, col("text"))
    // mixed case + punctuation exercise the [a-z]+ pre-tokenizer
    val out = Seq((1L, "Aaab ab! caab"), (2L, ""), (3L, "zzz"))
      .toDF("doc_id", "text")
      .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 5L, "aaab ab c aa b")))
    assert(out(1) == ((2L, 0L, 0L, "")))
    // unseen letters stay character-level
    assert(out(2) == ((3L, 1L, 3L, "z z z")))
  }

  test("kernel null/empty safety and struct shape") {
    val m = Bpe.BpeModel(Array(("e", "r")))
    val df = Seq(Tuple1(Option.empty[String]), Tuple1(Some("river")))
      .toDF("text")
      .select(BpeStats(col("text"), m.merges.toSeq).as("s"))
      .select(col("s.n_words"), col("s.n_tokens"), col("s.tokens"))
      .collect()
    assert(df(0).getLong(0) == 0L && df(0).getLong(1) == 0L && df(0).getString(2) == "")
    assert(df(1).getString(2) == "r i v er")
  }
}
