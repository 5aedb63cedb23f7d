package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FieldRef
import graft.operators.FieldRef._

/** Ports the stanza field-syntax tables
  * (`stanza/entry/field_test.go:14-163` TestFieldUnmarshalJSON +
  * `:242-284` TestFromJSONDot + `:285-296`): dotted paths, bracket-quoted
  * keys with embedded dots, mixed bracket/dot forms, and malformed-syntax
  * errors. Bare paths (no recognized root) default to the body, like the
  * stanza default root.
  */
class FieldSyntaxSpec extends AnyFunSuite {

  test("dotted and bracketed field forms (field_test.go:14-163)") {
    assert(FieldRef.parse("body") == Body)
    assert(FieldRef.parse("body.test1") == BodyPath(Seq("test1")))
    assert(FieldRef.parse("body.test1.test2") == BodyPath(Seq("test1", "test2")))
    assert(FieldRef.parse("body.test1['file.name']") ==
      BodyPath(Seq("test1", "file.name")))
    assert(FieldRef.parse("body.test1['file.details']['file.name']") ==
      BodyPath(Seq("test1", "file.details", "file.name")))
    assert(FieldRef.parse("body.test1['file.details'].name") ==
      BodyPath(Seq("test1", "file.details", "name")))
    assert(FieldRef.parse("attributes.test1") == Attr(Seq("test1")))
    assert(FieldRef.parse("attributes.test1.test2") == Attr(Seq("test1", "test2")))
    assert(FieldRef.parse("attributes.test1['file.name']") ==
      Attr(Seq("test1", "file.name")))
    assert(FieldRef.parse("attributes.test1['file.details'].name") ==
      Attr(Seq("test1", "file.details", "name")))
    assert(FieldRef.parse("resource.test1") == Resource(Seq("test1")))
    assert(FieldRef.parse("""resource["test"]""") == Resource(Seq("test")))
    assert(FieldRef.parse("attributes") == AttrsRoot)
    assert(FieldRef.parse("resource") == ResourceRoot)
  }

  test("fromJSONDot forms: double quotes, bracket-then-dot, dots in brackets") {
    assert(FieldRef.parse("""body["test"]""") == BodyPath(Seq("test")))
    assert(FieldRef.parse("""body["test1"].test2""") == BodyPath(Seq("test1", "test2")))
    assert(FieldRef.parse("""body["test1"]["test2"]""") == BodyPath(Seq("test1", "test2")))
    assert(FieldRef.parse("""body.test1["test2"]""") == BodyPath(Seq("test1", "test2")))
    assert(FieldRef.parse("""body["test1.test2"]""") == BodyPath(Seq("test1.test2")))
    // stanza default root is body
    assert(FieldRef.parse("test") == BodyPath(Seq("test")))
    assert(FieldRef.parse("test.case") == BodyPath(Seq("test", "case")))
  }

  test("malformed syntax errors (field_test.go:261-269, 285-289)") {
    for (bad <- Seq(
        """body["test1.test2""", // UnclosedBrackets
        """body["test1.test2]""", // UnclosedQuotes
        """body["test1.test2']""", // UnmatchedQuotes
        "body[", // BracketAtEnd
        "body['", // SingleQuoteAtEnd
        """body["""", // DoubleQuoteAtEnd
        "body[test]", // BracketMissingQuotes
        "resource[test]")) { // TestFieldFromStringInvalidSplit
      assert(scala.util.Try(FieldRef.parse(bad)).isFailure, s"expected failure: $bad")
    }
  }
}
