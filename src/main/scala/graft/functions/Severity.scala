package graft.functions

/** Severity mapping kernel.
  *
  * Replicates the reference's 25-level severity enum and alias/range
  * expansion, driver-side:
  *  - enum values 0..24 with canonical texts (reference:
  *    `processor/signozlogspipelineprocessor/utils.go:158-212`)
  *  - builtin alias mapping (`"err"`, `"warning"`, numeric strings) and HTTP
  *    range keys `2xx..5xx` expanded to `"200".."599"` (reference:
  *    `stanza/operator/helper/severity_builder.go:17-105,187-225`)
  *  - lookup semantics: case-insensitive for strings, whole-number check for
  *    doubles (reference: `stanza/operator/helper/severity.go:52-82`).
  *
  * Everything here is pure driver-side computation; the result is a literal
  * `Map[String,Int]` small enough to fold into the plan as a broadcast
  * dictionary / `element_at` on a map literal.
  */
object Severity {
  val Default = 0
  val Trace = 1; val Trace2 = 2; val Trace3 = 3; val Trace4 = 4
  val Debug = 5; val Debug2 = 6; val Debug3 = 7; val Debug4 = 8
  val Info = 9; val Info2 = 10; val Info3 = 11; val Info4 = 12
  val Warn = 13; val Warn2 = 14; val Warn3 = 15; val Warn4 = 16
  val Error = 17; val Error2 = 18; val Error3 = 19; val Error4 = 20
  val Fatal = 21; val Fatal2 = 22; val Fatal3 = 23; val Fatal4 = 24

  /** Canonical text per level (empty for Default). */
  val text: IndexedSeq[String] = {
    val names = Vector("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    "" +: (for (n <- names; i <- 1 to 4) yield if (i == 1) n else s"$n$i")
  }

  /** `"otel"` / `"aliases"` preset: canonical lowercase names + numeric strings. */
  def aliasMapping: Map[String, Int] =
    (1 to 24).flatMap { lvl =>
      Seq(text(lvl).toLowerCase -> lvl, lvl.toString -> lvl)
    }.toMap

  /** Default preset: aliases plus `warning*` / `err*` extras. */
  def defaultMapping: Map[String, Int] =
    aliasMapping ++
      (0 to 3).flatMap { i =>
        val sfx = if (i == 0) "" else (i + 1).toString
        Seq(s"warning$sfx" -> (Warn + i), s"err$sfx" -> (Error + i))
      }

  def builtinMapping(preset: String): Map[String, Int] = preset match {
    case "none"              => Map.empty
    case "otel" | "aliases"  => aliasMapping
    case _                   => defaultMapping
  }

  /** A user mapping value: plain string/int, an HTTP range key, or min/max range. */
  sealed trait MappingValue
  final case class Str(v: String) extends MappingValue
  final case class Num(v: Int) extends MappingValue
  final case class Range(min: Int, max: Int) extends MappingValue

  private def expandRange(min0: Int, max0: Int): Seq[String] = {
    val (min, max) = if (min0 > max0) (max0, min0) else (min0, max0)
    (min to max).map(_.toString)
  }

  /** Expand one mapping value to the lowercase string keys it matches. */
  def parseableValues(v: MappingValue): Seq[String] = v match {
    case Num(i) => Seq(i.toString)
    case Str("2xx") => expandRange(200, 299)
    case Str("3xx") => expandRange(300, 399)
    case Str("4xx") => expandRange(400, 499)
    case Str("5xx") => expandRange(500, 599)
    case Str(s) => Seq(s.toLowerCase)
    case Range(min, max) => expandRange(min, max)
  }

  /** Resolve a severity name/alias to its level (build-time validation). */
  def levelOf(name: String): Option[Int] = aliasMapping.get(name.toLowerCase)

  /** Build the final lookup table for a severity_parser config.
    * @param mapping user entries: severity-alias -> values
    */
  def buildMapping(
      preset: String,
      mapping: Seq[(String, Seq[MappingValue])]
  ): Map[String, Int] = {
    var m = builtinMapping(preset)
    mapping.foreach { case (sevAlias, values) =>
      val lvl = levelOf(sevAlias).getOrElse(
        throw new IllegalArgumentException(s"unrecognized severity: $sevAlias"))
      values.foreach(v => parseableValues(v).foreach(k => m += (k -> lvl)))
    }
    m
  }
}
