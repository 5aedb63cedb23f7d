package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Golden equivalence: the round-6 ShingleArray codegen kernel vs the
  * original composed-column form (the executable spec the DuckDB oracle
  * replicates) — adversarial whitespace/duplicate cases plus seeded random
  * corpora, for every shingle width the queries use (3, 5, 13).
  */
class ShinglesSpec extends SparkSuite {

  private val edge = Seq(
    "",                         // empty -> single "" shingle
    " ",                        // space-only: trim -> "" -> [""]
    "\t",                       // tab survives the (space-only) trim
    "\ta b c d",                // leading tab -> leading "" token
    "a b c d\t",                // trailing tab
    "a", "a b", "a b c",        // below / at width 3
    "a  b   c  d",              // multi-space runs
    "a b c a b c a b c",        // duplicate shingles -> distinct collapses
    "  padded with spaces  ",
    "x\ny\nz w",                // newlines are \s+ separators
    "ünïcode tökens ünïcode tökens more")

  private def randTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(20260822L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x", "yy", "", " ")
    (0 until n).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
  }

  test("ShingleArray kernel == composed column form (edge + random, n=3/5/13)") {
    import spark.implicits._
    val df = (edge ++ randTexts(300)).toDF("text")
    for (n <- Seq(3, 5, 13)) {
      val both = df.select(
        TextOps.shingles(col("text"), n).as("k"),
        TextOps.shinglesComposed(col("text"), n).as("c"))
      val bad = both.filter(not(col("k") <=> col("c"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.take(3).mkString("; ")}")
    }
  }

  test("ShingleArray kernel: null text -> null") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a b c d")).toDF("text")
    val r = df.select(TextOps.shingles(col("text"), 3).as("k")).collect()
    assert(r(0).isNullAt(0))
    assert(!r(1).isNullAt(0))
  }
}
