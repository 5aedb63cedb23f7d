package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small string kernels shared by operators and expressions. */
object TextKernels {

  /** Unquote a fully double-quoted string, else return it unchanged —
    * the semantics of the reference's `Unquote` (`utils/utils.go:95-102`,
    * Go `strconv.Unquote` best-effort at the JSON-parser call site,
    * `operators/json/parser.go:43-47`). Handles the escape sequences JSON
    * round-trips produce: `\" \\ \n \t \r`.
    */
  def unquote(c: Column): Column = {
    val stripped = c.substr(lit(2), length(c) - 2)
    val unescaped =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(stripped, "\\\\\"", "\""),
              "\\\\n", "\n"),
            "\\\\t", "\t"),
          "\\\\r", "\r"),
        "\\\\\\\\", "\\\\")
    when(c.rlike("^\"(?s).*\"$"), unescaped).otherwise(c)
  }

  /** Cheap JSON-object shape check usable in codegen'd predicates — the
    * gate the `normalize` operator uses before attempting a body parse
    * (`operators/normalize/transformer.go:45-142`; validity itself is
    * enforced by `from_json` returning NULL on malformed input).
    */
  def looksLikeJsonObject(c: Column): Column =
    c.isNotNull && c.rlike("^\\s*\\{(?s).*\\}\\s*$")
}
