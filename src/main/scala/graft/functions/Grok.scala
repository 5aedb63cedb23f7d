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
  * The dictionary below is the de-facto-standard public grok base pattern
  * set (the same ~100-pattern base the reference's grok library bundles:
  * core, URI/network, date/time, syslog, apache httpd, java, plus a few
  * common app families), RE2/Java-compatible forms; custom patterns can be
  * layered on via [[Grok.expand]]'s `extra` argument.
  *
  * Deliberately omitted: `HTTPD_ERRORLOG` (the 2.0|2.4 alternation repeats
  * capture names across branches, which this engine rejects — use
  * HTTPD20_ERRORLOG / HTTPD24_ERRORLOG directly).
  */
object Grok {

  private val ipv4Octet = "(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
  private val ipv6 = {
    val v4 = s"(?:$ipv4Octet\\.){3}$ipv4Octet"
    val h = "[0-9A-Fa-f]{1,4}"
    s"(?:(?:$h:){7}(?:$h|:)|" +
      s"(?:$h:){6}(?::$h|$v4|:)|" +
      s"(?:$h:){5}(?:(?::$h){1,2}|:$v4|:)|" +
      s"(?:$h:){4}(?:(?::$h){1,3}|(?::$h)?:$v4|:)|" +
      s"(?:$h:){3}(?:(?::$h){1,4}|(?::$h){0,2}:$v4|:)|" +
      s"(?:$h:){2}(?:(?::$h){1,5}|(?::$h){0,3}:$v4|:)|" +
      s"(?:$h:){1}(?:(?::$h){1,6}|(?::$h){0,4}:$v4|:)|" +
      s":(?:(?::$h){1,7}|(?::$h){0,5}:$v4|:))(?:%[0-9A-Za-z]+)?"
  }

  val basePatterns: Map[String, String] = Map(
    // ---- core ----
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "%{USERNAME}",
    "EMAILLOCALPART" -> "[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS" -> "%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER" -> "%{EMAILADDRESS}|%{USER}",
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?)|\\.[0-9]+)",
    "NUMBER" -> "(?:%{BASE10NUM})",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "BASE16FLOAT" -> "\\b(?:0[xX])?(?:[0-9A-Fa-f]+(?:\\.[0-9A-Fa-f]*)?|\\.[0-9A-Fa-f]+)\\b",
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "QUOTEDSTRING" -> "(?:\"(?:[^\"\\\\]|\\\\.)*\"|'(?:[^'\\\\]|\\\\.)*')",
    "QS" -> "%{QUOTEDSTRING}",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "URN" -> "urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:(?:[0-9A-Za-z()+,.:=@;$_!*'/?#-]|%[0-9a-fA-F]{2})+",
    // ---- network ----
    "CISCOMAC" -> "(?:(?:[A-Fa-f0-9]{4}\\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC" -> "(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC" -> "(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC" -> "(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "IPV4" -> s"(?:$ipv4Octet\\.){3}$ipv4Octet",
    "IPV6" -> ipv6,
    "IP" -> "(?:%{IPV6}|%{IPV4})",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT" -> "%{IPORHOST}:%{POSINT}",
    "LOGSOURCE" -> "%{IPORHOST}",
    // ---- paths / uris ----
    "PATH" -> "(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH" -> "(?:/[\\w_%!$@:.,+~-]+)+",
    "WINPATH" -> "(?:[A-Za-z]+:|\\\\)(?:\\\\[^\\\\?*]*)+",
    "TTY" -> "(?:/dev/(?:pts|tty(?:[pq])?)(?:\\w+)?/?(?:[0-9]+))",
    "URIPROTO" -> "[A-Za-z]+(?:\\+[A-Za-z+]+)?",
    "URIHOST" -> "%{IPORHOST}(?::%{POSINT:port})?",
    "URIPATH" -> "(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\\-]*)+",
    "URIPARAM" -> "\\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\\-\\[\\]<>]*",
    "URIPATHPARAM" -> "%{URIPATH}(?:%{URIPARAM})?",
    "URI" -> "%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    // ---- date / time ----
    "MONTH" -> "\\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\\b",
    "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
    "MONTHNUM2" -> "(?:0[1-9]|1[0-2])",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY" -> "(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "ISO8601_SECOND" -> "(?:%{SECOND}|60)",
    "TIME" -> "%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_US" -> "%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU" -> "%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE" -> "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "DATE" -> "%{DATE_US}|%{DATE_EU}",
    "DATESTAMP" -> "%{DATE}[- ]%{TIME}",
    "TZ" -> "(?:[PMCE][SD]T|UTC)",
    "DATESTAMP_RFC822" -> "%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822" -> "%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER" -> "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG" -> "%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE" -> "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPDATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    // ---- log levels ----
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    // ---- syslog (RFC3164 + RFC5424) ----
    "SYSLOGTIMESTAMP" -> "%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG" -> "[\\x21-\\x5a\\x5c\\x5e-\\x7e]+",
    "SYSLOGPROG" -> "%{PROG:program}(?:\\[%{POSINT:pid}\\])?",
    "SYSLOGHOST" -> "%{IPORHOST}",
    "SYSLOGFACILITY" -> "<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE" -> "%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGBASE2" -> "(?:%{SYSLOGTIMESTAMP:timestamp}|%{TIMESTAMP_ISO8601:timestamp8601}) (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource}+(?: %{SYSLOGPROG}:|)",
    "SYSLOGLINE" -> "%{SYSLOGBASE2} %{GREEDYDATA:message}",
    "SYSLOG5424PRINTASCII" -> "[!-~]+",
    "SYSLOG5424PRI" -> "<%{NONNEGINT:syslog5424_pri}>",
    "SYSLOG5424SD" -> "\\[%{DATA}\\]+",
    "SYSLOG5424BASE" -> "%{SYSLOG5424PRI}%{NONNEGINT:syslog5424_ver} +(?:%{TIMESTAMP_ISO8601:syslog5424_ts}|-) +(?:%{IPORHOST:syslog5424_host}|-) +(?:%{SYSLOG5424PRINTASCII:syslog5424_app}|-) +(?:%{SYSLOG5424PRINTASCII:syslog5424_proc}|-) +(?:%{SYSLOG5424PRINTASCII:syslog5424_msgid}|-) +(?:%{SYSLOG5424SD:syslog5424_sd}|-|)",
    "SYSLOG5424LINE" -> "%{SYSLOG5424BASE} +%{GREEDYDATA:syslog5424_msg}",
    "CRON_ACTION" -> "[A-Z ]+",
    "CRONLOG" -> "%{SYSLOGBASE} \\(%{USER:user}\\) %{CRON_ACTION:action} \\(%{DATA:command}\\)",
    "SYSLOGPAMSESSION" -> "%{SYSLOGBASE} %{WORD:pam_module}\\(%{DATA:pam_caller}\\): session %{WORD:pam_session_state} for user %{USERNAME:username}(?: by %{GREEDYDATA:pam_by})?",
    // ---- apache httpd ----
    "COMMONAPACHELOG" -> "%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} \\[%{HTTPDATE:timestamp}\\] \"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" %{NUMBER:response} (?:%{NUMBER:bytes}|-)",
    "COMBINEDAPACHELOG" -> "%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "HTTPD20_ERRORLOG" -> "\\[%{HTTPDERROR_DATE:timestamp}\\] \\[%{LOGLEVEL:loglevel}\\] (?:\\[client %{IPORHOST:clientip}\\] )?%{GREEDYDATA:message}",
    "HTTPD24_ERRORLOG" -> "\\[%{HTTPDERROR_DATE:timestamp}\\] \\[%{WORD:module}:%{LOGLEVEL:loglevel}\\] \\[pid %{POSINT:pid}(?::tid %{NUMBER:tid})?\\](?: \\(%{POSINT:proxy_errorcode}\\)%{DATA:proxy_message}:)? \\[client %{IPORHOST:clientip}:%{POSINT:clientport}\\](?: %{DATA:errorcode}:)? %{GREEDYDATA:message}",
    // ---- java / jvm apps ----
    "JAVACLASS" -> "(?:[a-zA-Z$_][a-zA-Z$_0-9]*\\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE" -> "(?:[A-Za-z0-9_. -]+)",
    "JAVAMETHOD" -> "(?:(?:<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVASTACKTRACEPART" -> "%{SPACE}at %{JAVACLASS:class}\\.%{JAVAMETHOD:method}\\(%{JAVAFILE:file}(?::%{NUMBER:line})?\\)",
    "JAVATHREAD" -> "(?:[A-Z]{2}-Processor[0-9]+)",
    "JAVALOGMESSAGE" -> "(?:.*)",
    "CATALINA_DATESTAMP" -> "%{MONTH} %{MONTHDAY}, 20%{YEAR} %{HOUR}:?%{MINUTE}(?::?%{SECOND}) (?:AM|PM)",
    "TOMCAT_DATESTAMP" -> "20%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:?%{MINUTE}(?::?%{SECOND}) %{ISO8601_TIMEZONE}",
    // ---- common app families ----
    "REDISTIMESTAMP" -> "%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG" -> "\\[%{POSINT:pid}\\] %{REDISTIMESTAMP:timestamp} \\*",
    "RUBY_LOGLEVEL" -> "(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "RUBY_LOGGER" -> "[DFEWI], \\[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\\] *%{RUBY_LOGLEVEL:loglevel} -- +%{DATA:progname}: %{GREEDYDATA:message}",
    "MONGO_LOG" -> "%{SYSLOGTIMESTAMP:timestamp} \\[%{WORD:component}\\] %{GREEDYDATA:message}",
    "POSTGRESQL" -> "%{DATESTAMP:timestamp} %{TZ} %{DATA:user_id} %{GREEDYDATA:connection_id} %{POSINT:pid}"
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
