package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NamedGroupMatcher

/** Measures whether the reference's optional regex/grok memoization cache
  * (`signozlogspipeline/stanza/operator/operators/regex/cache.go:23-55` —
  * FIFO, <=65535 entries, per-operator) would pay off in this engine, where
  * regex extraction is a vectorized codegen kernel instead of a per-op Go
  * loop. Pure-JVM micro-benchmark (no Spark): the flagship hotrod pattern
  * over synthetic lines at several duplicate rates, direct vs a FIFO memo
  * keyed by the input string — the exact structure the reference caches.
  *
  * SURVEY §4 deferred the cache with "vectorized regex is fast; measure
  * first"; the measured numbers land in BASELINE.md and close the question.
  */
object MemoProbe {

  private final class FifoMemo(cap: Int) {
    private val m = new java.util.LinkedHashMap[String, AnyRef](1024, 0.75f, false) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, AnyRef]): Boolean =
        size() > cap
    }
    def getOrCompute(k: String)(f: => AnyRef): AnyRef = {
      val hit = m.get(k)
      if (hit != null) hit
      else { val v = f; m.put(k, v); v }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = 2000000
    val matcher = new NamedGroupMatcher(SparkEntry.hotrodRegexFast)
    def line(i: Int): String =
      s"2024-01-01T00:00:00.${i % 1000}Z\tINFO\tdriver/server.go:85\tmsg $i\t{\"retry_no\":${i % 9}}"

    // 0/50/95%: distinct set exceeds the 65535 cap (FIFO thrash — what a
    // high-cardinality log stream does to the cache); 99%: 20k distinct,
    // the cache genuinely fits — memoization's best case
    for (dupPct <- Seq(0, 50, 95, 99)) {
      val distinct = math.max(1, n * (100 - dupPct) / 100)
      val lines = Array.tabulate(n)(i => line(i % distinct))
      val utf8 = lines.map(UTF8String.fromString)

      def direct(): Long = {
        var acc = 0L
        var i = 0
        while (i < n) {
          val r = matcher.extract(utf8(i)); if (r != null) acc += r.numElements()
          i += 1
        }
        acc
      }
      def memoized(): Long = {
        val memo = new FifoMemo(65535)
        var acc = 0L
        var i = 0
        while (i < n) {
          val r = memo.getOrCompute(lines(i))(matcher.extract(utf8(i)))
          if (r != null) acc += r.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements()
          i += 1
        }
        acc
      }
      direct(); memoized() // warm both paths
      def best(f: () => Long): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
      val d = best(() => direct())
      val m = best(() => memoized())
      println(f"[memo] dup=$dupPct%3d%% direct=${n / d / 1e6}%.2f Mrows/s " +
        f"memo=${n / m / 1e6}%.2f Mrows/s ratio(memo/direct)=${d / m}%.2f")
    }
  }
}
