package graft.functions

/** Grok pattern expansion, done entirely at the driver.
  *
  * The reference's `grok_parser` builds on a grok library with
  * `NamedCapturesOnly=true` and typed captures `%{INT:status:int}`
  * (`pkg/parser/grok/grok.go:53-169`). Grok is just a macro layer over
  * regex: we expand `%{NAME:field:type}` references against a pattern
  * dictionary into a single regex with named groups, and remember which
  * fields carry a declared type (`int` / `float` -> the engine's
  * attributes_number map; everything else stays string).
  *
  * The dictionary below is the subset of the de-facto-standard grok base
  * patterns that the reference fixtures and common log shapes use; custom
  * patterns can be layered on via [[Grok.expand]]'s `extra` argument.
  */
object Grok {

  val basePatterns: Map[String, String] = Map(
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "%{USERNAME}",
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?)|\\.[0-9]+)",
    "NUMBER" -> "(?:%{BASE10NUM})",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "QUOTEDSTRING" -> "(?:\"(?:[^\"\\\\]|\\\\.)*\"|'(?:[^'\\\\]|\\\\.)*')",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4" -> "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP" -> "%{IPV4}",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT" -> "%{IPORHOST}:%{POSINT}",
    "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME" -> "%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_US" -> "%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU" -> "%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE" -> "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "PATH" -> "(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH" -> "(?:/[\\w_%!$@:.,+~-]+)+",
    "WINPATH" -> "(?:[A-Za-z]+:|\\\\)(?:\\\\[^\\\\?*]*)+",
    "LOGSOURCE" -> "%{IPORHOST}"
  )

  /** One expanded grok pattern: the resulting regex (with `(?P<name>...)`
    * named groups, feed to [[RegexExtractNamedGroups]]) plus the typed
    * capture map `field -> "int"|"float"`.
    */
  final case class Expanded(regex: String, types: Map[String, String])

  private val ref = java.util.regex.Pattern.compile(
    "%\\{(\\w+)(?::([\\w@\\[\\]._-]+))?(?::(int|float|string))?\\}")

  /** Expand `%{NAME[:field[:type]]}` references recursively (depth-capped).
    * Unnamed references (`%{INT}`) expand to non-capturing pattern text,
    * mirroring NamedCapturesOnly=true in the reference.
    */
  def expand(pattern: String, extra: Map[String, String] = Map.empty): Expanded = {
    val dict = basePatterns ++ extra
    val types = scala.collection.mutable.Map.empty[String, String]
    def step(p: String, depth: Int): String = {
      if (depth > 20) throw new IllegalArgumentException(s"grok expansion too deep: $pattern")
      val m = ref.matcher(p)
      if (!m.find()) return p
      val sb = new StringBuilder
      var last = 0
      m.reset()
      while (m.find()) {
        sb.append(p.substring(last, m.start()))
        val name = m.group(1)
        val field = Option(m.group(2))
        val typ = Option(m.group(3))
        val sub = dict.getOrElse(name,
          throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        field match {
          case Some(f) =>
            typ.filter(_ != "string").foreach(t => types(f) = t)
            sb.append("(?P<").append(f).append(">").append(sub).append(")")
          case None =>
            sb.append("(?:").append(sub).append(")")
        }
        last = m.end()
      }
      sb.append(p.substring(last))
      step(sb.toString, depth + 1)
    }
    Expanded(step(pattern, 0), types.toMap)
  }
}
