package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tail-sampler policy tree (`processor/signoztailsampler/evaluator.go:13-157`,
  * `processor.go:181-215`), compiled into one Column decision tree over
  * trace-group rows:
  *
  *  - a policy = filters (string/numeric attribute matchers, AND/OR) +
  *    priority-ordered sub-policies + a sampling method derived from the
  *    percentage (0 -> never, 100 -> always, else probabilistic by FNV-1a
  *    hash of salt+trace-id bytes against a 2^64-scaled threshold,
  *    `internal/sampling/probabilistic.go:54-83`);
  *  - Evaluate: any-filter-match gates the policy; `and` returns NoResult
  *    the moment any filter misses (evaluator.go:102-124); sub-policies are
  *    evaluated in priority order and the first non-NoResult decision wins,
  *    else the policy's own sampler decides (evaluator.go:126-157);
  *  - across top-level policies, the first Sampled/NotSampled wins and
  *    no-policy-matched defaults to Sampled (processor.go:181-215).
  *
  * Decisions are encoded as int columns: 1 Sampled, 0 NotSampled,
  * -1 NoResult.
  */
object TailSampler {

  final case class StringFilter(key: String, values: Seq[String],
      regexMatch: Boolean = false, invert: Boolean = false)
  final case class NumericFilter(key: String, min: Long, max: Long)
  final case class Policy(
      name: String,
      samplingPercentage: Double,
      priority: Int = 0,
      filterOp: String = "", // "and" | "or" | "" (or)
      stringFilters: Seq[StringFilter] = Nil,
      numericFilters: Seq[NumericFilter] = Nil,
      subPolicies: Seq[Policy] = Nil)

  private val Sampled = lit(1)
  private val NotSampled = lit(0)
  private val NoResult = lit(-1)

  /** Go big.Float threshold: ratio scaled to [0, MaxUint64], as Long bits. */
  def thresholdBits(samplingPercentage: Double): Long = {
    val ratio = BigDecimal(samplingPercentage / 100.0)
    val max = BigDecimal(BigInt("18446744073709551615"))
    val t = (max * ratio).toBigInt
    (t & BigInt("ffffffffffffffff", 16)).longValue
  }

  /** FNV-1a over salt bytes ++ trace-id bytes (hex-decoded), unsigned
    * compare against the threshold (probabilistic.go:54-83).
    */
  def probabilisticSampled(traceIdHex: Column, pct: Double,
      salt: String = "default-hash-seed"): Column = {
    val t = thresholdBits(pct)
    val saltSeeded = graft.functions.Fingerprint.hashAdd(
      graft.functions.Fingerprint.offset64Public, salt)
    // hash the decoded trace-id bytes continuing from the salted state
    val bytes = unhex(traceIdHex)
    val h = graft.functions.FnvOverBytes(bytes, saltSeeded)
    // unsigned h <= unsigned t
    (h + java.lang.Long.MIN_VALUE) <= lit(t + java.lang.Long.MIN_VALUE)
  }

  private def filterMatch(f: StringFilter, attrsString: Column): Column = {
    val v = element_at(attrsString, f.key)
    val base =
      if (f.regexMatch) f.values.map(p => v.rlike(p)).reduceOption(_ || _).getOrElse(lit(false))
      else v.isin(f.values: _*)
    val matched = coalesce(base, lit(false))
    if (f.invert) !matched else matched
  }

  private def numericMatch(f: NumericFilter, attrsNumber: Column): Column = {
    val v = element_at(attrsNumber, f.key)
    coalesce(v >= f.min && v <= f.max, lit(false))
  }

  /** One policy's decision column (evaluator.go Evaluate). */
  def evaluate(p: Policy, traceIdHex: Column,
      attrsString: Column, attrsNumber: Column): Column = {
    val matches =
      p.stringFilters.map(filterMatch(_, attrsString)) ++
        p.numericFilters.map(numericMatch(_, attrsNumber))
    val filterMatched = matches.reduceOption(_ || _).getOrElse(lit(false))
    val andFailed =
      if (p.filterOp.toLowerCase == "and")
        matches.map(!_).reduceOption(_ || _).getOrElse(lit(false))
      else lit(false)

    val samplerDecision: Column = p.samplingPercentage match {
      case 0.0 => NotSampled
      case 100.0 => Sampled
      case pct => when(probabilisticSampled(traceIdHex, pct), Sampled).otherwise(NotSampled)
    }

    // sub-policies in priority order, first non-NoResult wins
    val inner = p.subPolicies.sortBy(_.priority).foldRight(samplerDecision) {
      case (sp, acc) =>
        val d = evaluate(sp, traceIdHex, attrsString, attrsNumber)
        when(d =!= NoResult, d).otherwise(acc)
    }

    when(andFailed, NoResult)
      .otherwise(when(filterMatched, inner).otherwise(NoResult))
  }

  /** Final decision across top-level policies (processor.go:181-215):
    * first Sampled/NotSampled wins; none matched -> Sampled.
    */
  def decision(policies: Seq[Policy], traceIdHex: Column,
      attrsString: Column, attrsNumber: Column): Column =
    policies.foldRight(Sampled: Column) { case (p, acc) =>
      val d = evaluate(p, traceIdHex, attrsString, attrsNumber)
      when(d =!= NoResult, d).otherwise(acc)
    }

  /** Keep only sampled rows. */
  def sample(df: DataFrame, policies: Seq[Policy],
      traceIdCol: String = "trace_id",
      attrsStringCol: String = "attributes_string",
      attrsNumberCol: String = "attributes_number"): DataFrame =
    df.filter(decision(policies, col(traceIdCol),
      col(attrsStringCol), col(attrsNumberCol)) === 1)
}
