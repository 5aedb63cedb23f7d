package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property-style randomized cross-checks (seeded, deterministic): each
  * round-5 row kernel vs an independent naive reference implementation,
  * hundreds of adversarial random cases beyond the table-driven goldens.
  * Pure JVM — no Spark session needed, so the whole suite runs in
  * milliseconds.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("AC blocklist == naive all-positions matcher (400 random cases)") {
    import graft.functions.AcWorker
    val rnd = new scala.util.Random(20260820L)
    val alphabet = "ab "
    def randStr(max: Int): String =
      (0 until rnd.nextInt(max + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var i = 0
    while (i < 400) {
      val nPhrases = 1 + rnd.nextInt(8)
      // distinct non-empty phrases (duplicates would double-count in the
      // naive matcher but collapse onto one trie node in the automaton)
      val phrases = Iterator.continually(randStr(5)).filter(_.nonEmpty)
        .distinct.take(nPhrases).toSeq
      val text = randStr(60)
      // naive: every (start, pid) substring occurrence
      val naive = for {
        (p, pid) <- phrases.zipWithIndex
        start <- 0 to text.length - p.length
        if text.regionMatches(start, p, 0, p.length)
      } yield (start, pid)
      val nMatches = naive.size.toLong
      val nDistinct = naive.map(_._2).distinct.size.toLong
      val first =
        if (naive.isEmpty) (-1L, -1L)
        else { val m = naive.minBy { case (s, p) => (s, p) }; (m._1.toLong, m._2.toLong) }
      val r = new AcWorker(phrases.toArray).compute(UTF8String.fromString(text))
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((nMatches, nDistinct, first._1, first._2)),
        s"phrases=$phrases text='$text'")
      i += 1
    }
  }

  test("winnow == brute distinct-argmin over all windows (300 random cases)") {
    import graft.functions.WinnowWorker
    val rnd = new scala.util.Random(7L)
    val alphabet = "abc"
    var i = 0
    while (i < 300) {
      val k = 1 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(4)
      val text = (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      def h48(g: String): Long = java.lang.Long.parseLong(md5hex(g).take(12), 16)
      val n = text.length - k + 1
      val brute: Seq[Long] =
        if (n < w) Seq.empty
        else {
          val hs = (0 until n).map(j => h48(text.substring(j, j + k)))
          (0 to n - w).map(s => (s until s + w).minBy(j => (hs(j), -j)))
            .distinct.sorted.map(hs)
        }
      val got = new WinnowWorker(k, w)
        .compute(UTF8String.fromString(text)).toLongArray().toSeq
      assert(got == brute, s"k=$k w=$w text='$text'")
      i += 1
    }
  }

  test("char entropy == naive recompute (300 random cases)") {
    import graft.functions.CharEntropyWorker
    val rnd = new scala.util.Random(99L)
    val worker = new CharEntropyWorker
    val LN2 = math.log(2.0)
    var i = 0
    while (i < 300) {
      val text = (0 until rnd.nextInt(80))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val n = text.length.toLong
      val counts = text.groupBy(identity).map { case (_, v) => v.length.toLong }
      val hSum = if (n == 0) 0L else counts.map { kc =>
        kc * BigDecimal(math.log(n.toDouble / kc) / LN2 * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      val r = worker.compute(UTF8String.fromString(text))
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
        ((n, counts.size.toLong, hSum)), s"text='$text'")
      i += 1
    }
  }

  test("JL projection == naive sign-matrix multiply (200 random cases)") {
    import graft.functions.VectorKernelsImpl
    val rnd = new scala.util.Random(123L)
    var i = 0
    while (i < 200) {
      val dIn = 1 + rnd.nextInt(16)
      val dOut = 1 + rnd.nextInt(6)
      val v = Array.fill(dIn)((rnd.nextInt(2001) - 1000) / 512.0f)
      val signs = Array.tabulate(dIn, dOut) { (a, b) =>
        if ("02468ace".contains(md5hex(s"jl:$a:$b").head)) 1 else -1
      }
      val naive = Array.tabulate(dOut) { j =>
        (0 until dIn).map { a =>
          signs(a)(j) * BigDecimal(v(a).toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
      }
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any))
      val got = VectorKernelsImpl.jlProject(arr, dOut).toLongArray()
      assert(got.toSeq == naive.toSeq, s"dIn=$dIn dOut=$dOut")
      i += 1
    }
  }
}
