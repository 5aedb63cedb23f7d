package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-layout kernels for the `time_parser` operator.
  *
  * The reference supports three layout types
  * (`stanza/operator/helper/time.go:131-228`):
  *  - `strptime`: C-style `%Y-%m-%d` directives, converted once at build time
  *    (we translate to Java DateTimeFormatter patterns at the driver);
  *  - `gotime`: Go reference-time layouts (translated the same way);
  *  - `epoch`: `s|ms|us|ns|s.ms|s.us|s.ns` numeric layouts.
  *
  * All translation is driver-side; the per-row work is a plain Spark
  * `to_timestamp` / integer arithmetic — fully codegen'd.
  */
object TimeFormats {

  /** strptime directive -> Java DateTimeFormatter pattern fragment.
    * Mirrors the reference's ctimefmt table one-to-one
    * (`stanza/operator/helper/ctimefmt/ctimefmt.go:16-55`), retargeted at
    * java.time. Notable fidelity points: the reference maps %j to the
    * `-07:00` ZONE (not day-of-year), %z to colonless `Z0700` (accepts
    * `+0000` and `Z`, not `+00:00`), and %s to an 8-digit fraction.
    */
  private val strptimeMap: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'o' -> "M", 'q' -> "M", // %o "_1" / %q "1": unpadded month
    'b' -> "MMM", 'h' -> "MMM", 'B' -> "MMMM",
    'd' -> "dd", 'e' -> "d", 'g' -> "d", // %e "_2" / %g "2": unpadded day
    'a' -> "EEE", 'A' -> "EEEE",
    'H' -> "HH", 'I' -> "hh", 'l' -> "h",
    'p' -> "a", 'P' -> "a",
    'M' -> "mm", 'S' -> "ss",
    'L' -> "SSS", 'f' -> "SSSSSS", 's' -> "SSSSSSSS", // "999"/"999999"/"99999999"
    'Z' -> "zzz",
    'z' -> "XX", // Go "Z0700": +0000 or Z (NOT +00:00)
    'w' -> "xxxx", // Go "-070000"
    'i' -> "x", // Go "-07"
    'j' -> "xxx", // Go "-07:00" — the reference's (unusual) %j
    'k' -> "xxxxx", // Go "-07:00:00"
    'D' -> "MM/dd/yyyy", 'x' -> "MM/dd/yyyy",
    'F' -> "yyyy-MM-dd",
    'T' -> "HH:mm:ss", 'X' -> "HH:mm:ss",
    'r' -> "hh:mm:ss a", 'R' -> "HH:mm",
    'c' -> "EEE MMM dd HH:mm:ss yyyy",
    'n' -> "\n", 't' -> "\t"
  )

  /** Translate a strptime layout into a Java time pattern; literal text is
    * single-quoted where needed.
    */
  def strptimeToJava(layout: String): String = {
    val sb = new StringBuilder
    var i = 0
    def appendLiteral(c: Char): Unit =
      if (c.isLetter || c == '\'') sb.append('\'').append(if (c == '\'') "''" else c.toString).append('\'')
      else sb.append(c)
    while (i < layout.length) {
      val c = layout.charAt(i)
      if (c == '%' && i + 1 < layout.length) {
        val d = layout.charAt(i + 1)
        if (d == '%') appendLiteral('%')
        else sb.append(strptimeMap.getOrElse(d,
          throw new IllegalArgumentException(s"unsupported strptime directive %$d in '$layout'")))
        i += 2
      } else { appendLiteral(c); i += 1 }
    }
    sb.toString
  }

  /** Go reference-time layout -> Java pattern (the subset in real configs). */
  def gotimeToJava(layout: String): String = {
    // longest-first token replacement over the Go reference time constants
    val tokens = Seq(
      "2006" -> "yyyy", "06" -> "yy",
      "January" -> "MMMM", "Jan" -> "MMM", "01" -> "MM",
      "Monday" -> "EEEE", "Mon" -> "EEE",
      "02" -> "dd", "_2" -> "d",
      "15" -> "HH", "03" -> "hh",
      "04" -> "mm", "05" -> "ss",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      "PM" -> "a",
      "Z07:00" -> "XXX", "Z0700" -> "XX", "-07:00" -> "xxx", "-0700" -> "xx",
      "MST" -> "zzz"
    )
    var out = layout
    tokens.foreach { case (go, jv) => out = out.replace(go, jv) }
    out
  }

  val epochLayouts: Set[String] = Set("s", "ms", "us", "ns", "s.ms", "s.us", "s.ns")

  /** Parse an epoch-layout value column to epoch NANOSECONDS (LongType).
    * Accepts string or numeric inputs like the reference
    * (`helper/time.go:168-228`): string inputs must be strictly integral for
    * the integer layouts (Go `strconv.ParseInt`), numeric inputs truncate
    * toward zero (Go `int64(v)`). Fractional `s.ms|s.us|s.ns` layouts read
    * the digits after '.' as that sub-second unit (NOT as a decimal
    * fraction) — faithful to `time.Unix(sec, subsec*mult)`.
    * Requires `spark.sql.ansi.enabled=false` (invalid input -> NULL -> the
    * operator's on_error path).
    */
  def epochToNanos(value: Column, layout: String, sourceIsNumeric: Boolean): Column = {
    def intVal: Column =
      if (sourceIsNumeric) value.cast("long")
      else when(value.cast("string").rlike("^[+-]?[0-9]+$"), value.cast("string").cast("long"))
    layout match {
      case "s"  => intVal * lit(1000000000L)
      case "ms" => intVal * lit(1000000L)
      case "us" => intVal * lit(1000L)
      case "ns" => intVal
      case "s.ms" | "s.us" | "s.ns" =>
        val mult = layout match { case "s.ms" => 1000000L; case "s.us" => 1000L; case _ => 1L }
        val str = value.cast("string")
        val sec = substring_index(str, ".", 1).cast("long")
        val sub = when(str.contains("."), substring_index(str, ".", -1).cast("long")).otherwise(lit(0L))
        sec * lit(1000000000L) + sub * lit(mult)
      case other =>
        throw new IllegalArgumentException(s"invalid epoch layout '$other'")
    }
  }

  /** Does a translated Java pattern carry any zone/offset directive? */
  private def hasZone(javaPattern: String): Boolean = {
    // strip quoted literals, then look for zone pattern letters
    val noLit = javaPattern.replaceAll("'[^']*'", "")
    noLit.exists(c => c == 'X' || c == 'x' || c == 'z' || c == 'Z' || c == 'O' || c == 'V')
  }

  /** Full layout dispatch -> epoch-nanos column (null on parse failure,
    * which the operator wrapper turns into the on_error path).
    *
    * `location`: IANA zone applied to ZONE-LESS layouts, like Go's
    * `time.ParseInLocation` (`helper/time.go` Location config) — a layout
    * that parses a zone from the input ignores it.
    */
  def parseToNanos(value: Column, layoutType: String, layout: String,
      sourceIsNumeric: Boolean = false, location: Option[String] = None): Column = {
    def withLoc(javaPattern: String): Column = {
      val parsed = try_to_timestamp(value.cast("string"), lit(javaPattern))
      location match {
        case Some(loc) if !hasZone(javaPattern) =>
          // parsed wall-clock (session TZ = UTC) reinterpreted as zone `loc`
          unix_micros(to_utc_timestamp(parsed, loc)) * lit(1000L)
        case _ => unix_micros(parsed) * lit(1000L)
      }
    }
    layoutType match {
      case "epoch" => epochToNanos(value, layout, sourceIsNumeric)
      case "strptime" => withLoc(strptimeToJava(layout))
      case "gotime" => withLoc(gotimeToJava(layout))
      case other => throw new IllegalArgumentException(s"unsupported layout type: $other")
    }
  }
}
