package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Grok
import graft.functions.{NamedGroupMatcher, RegexNamedGroups}

/** The bundled grok base dictionary: every pattern must expand (no dangling
  * `%{refs}`, no duplicate capture names) and compile as a Java regex, and
  * the headline composite patterns must extract the canonical fixture lines
  * the public grok ecosystems use (the reference bundles the same de-facto
  * standard base set, `pkg/parser/grok/grok.go:53-169`).
  */
class GrokDictionarySpec extends AnyFunSuite {

  private def extract(patternName: String, line: String): Option[Map[String, String]] = {
    val expanded = Grok.expand(s"%{$patternName}")
    val m = new NamedGroupMatcher(expanded.regex)
    Option(m.extract(org.apache.spark.unsafe.types.UTF8String.fromString(line)))
      .map { md =>
        val keys = md.keyArray()
        val vals = md.valueArray()
        (0 until md.numElements()).map(i =>
          keys.getUTF8String(i).toString -> vals.getUTF8String(i).toString).toMap
      }
  }

  test("dictionary has the full public base set (>= 100 patterns)") {
    assert(Grok.basePatterns.size >= 100, Grok.basePatterns.size)
  }

  test("every pattern expands, scans, and compiles as a Java regex") {
    for ((name, _) <- Grok.basePatterns) {
      val expanded = Grok.expand(s"%{$name:top}")
      val scanned = RegexNamedGroups.scan(expanded.regex)
      // compiles, and the outer capture plus any inner named captures are unique
      java.util.regex.Pattern.compile(scanned.javaPattern)
      assert(scanned.names.contains("top"), s"$name lost its outer capture")
    }
  }

  test("COMBINEDAPACHELOG extracts the canonical access-log fixture") {
    val line = "127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326 " +
      "\"http://www.example.com/start.html\" \"Mozilla/4.08 [en] (Win98; I ;Nav)\""
    val got = extract("COMBINEDAPACHELOG", line).get
    assert(got("clientip") == "127.0.0.1")
    assert(got("ident") == "-" && got("auth") == "frank")
    assert(got("timestamp") == "10/Oct/2000:13:55:36 -0700")
    assert(got("verb") == "GET" && got("request") == "/apache_pb.gif")
    assert(got("httpversion") == "1.0")
    assert(got("response") == "200" && got("bytes") == "2326")
    assert(got("referrer") == "\"http://www.example.com/start.html\"")
    assert(got("agent") == "\"Mozilla/4.08 [en] (Win98; I ;Nav)\"")
  }

  test("SYSLOGLINE extracts an RFC3164 line") {
    val line = "Jun 10 04:04:01 lvps109-104-93-171 postfix/smtpd[29107]: " +
      "lost connection after CONNECT from unknown[112.208.49.109]"
    val got = extract("SYSLOGLINE", line).get
    assert(got("timestamp") == "Jun 10 04:04:01")
    assert(got("logsource") == "lvps109-104-93-171")
    assert(got("program") == "postfix/smtpd" && got("pid") == "29107")
    assert(got("message") == "lost connection after CONNECT from unknown[112.208.49.109]")
  }

  test("SYSLOG5424LINE extracts an RFC5424 line") {
    val line = "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su 123 ID47 " +
      "[exampleSDID@32473 iut=\"3\"] 'su root' failed for user on /dev/pts/8"
    val got = extract("SYSLOG5424LINE", line).get
    assert(got("syslog5424_pri") == "34" && got("syslog5424_ver") == "1")
    assert(got("syslog5424_ts") == "2003-10-11T22:14:15.003Z")
    assert(got("syslog5424_host") == "mymachine.example.com")
    assert(got("syslog5424_app") == "su" && got("syslog5424_proc") == "123")
    assert(got("syslog5424_msgid") == "ID47")
    assert(got("syslog5424_sd") == "[exampleSDID@32473 iut=\"3\"]")
    assert(got("syslog5424_msg") == "'su root' failed for user on /dev/pts/8")
  }

  test("HTTPD24_ERRORLOG extracts the httpd error fixture") {
    val line = "[Thu Jun 09 06:07:05 2005] [authz_core:error] [pid 708:tid 12] " +
      "[client 76.96.99.16:1234] AH01626: authorization result: granted"
    val got = extract("HTTPD24_ERRORLOG", line).get
    assert(got("timestamp") == "Thu Jun 09 06:07:05 2005")
    assert(got("module") == "authz_core" && got("loglevel") == "error")
    assert(got("pid") == "708" && got("tid") == "12")
    assert(got("clientip") == "76.96.99.16" && got("clientport") == "1234")
    assert(got("errorcode") == "AH01626")
    assert(got("message") == "authorization result: granted")
  }

  test("CRONLOG and RUBY_LOGGER extract their fixtures") {
    val cron = extract("CRONLOG",
      "Sep 17 06:25:01 hostname CRON[16392]: (root) CMD (/usr/bin/uptime)").get
    assert(cron("user") == "root" && cron("action") == "CMD"
      && cron("command") == "/usr/bin/uptime")

    val ruby = extract("RUBY_LOGGER",
      "I, [2015-09-17T06:25:01.123456 #16392]  INFO -- Worker: job done").get
    assert(ruby("pid") == "16392" && ruby("loglevel") == "INFO"
      && ruby("progname") == "Worker" && ruby("message") == "job done")
  }

  test("URI / IP / EMAILADDRESS primitives match and reject") {
    def full(name: String, s: String): Boolean = {
      val scanned = RegexNamedGroups.scan(Grok.expand(s"%{$name:v}").regex)
      java.util.regex.Pattern.compile("^(?:" + scanned.javaPattern + ")$")
        .matcher(s).matches()
    }
    assert(full("URI", "https://user@host.example.com:8080/a/b?x=1&y=2"))
    assert(full("IP", "2001:db8::8a2e:370:7334") && full("IP", "10.0.0.1"))
    assert(!full("IP", "999.0.0.1"))
    assert(full("EMAILADDRESS", "john.doe@example.org"))
    assert(!full("EMAILADDRESS", "not-an-email"))
    assert(full("MAC", "00:1b:44:11:3a:b7") && full("MAC", "001b.4411.3ab7"))
    assert(full("UUID", "550e8400-e29b-41d4-a716-446655440000"))
  }
}
