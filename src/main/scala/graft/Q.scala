package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when
  * ANSI-expressible) the equivalent DuckDB SQL for the differential
  * oracle. Column names/aliases MUST match between the two — the
  * driver's compare sorts columns by name before hashing values.
  *
  * Determinism rules (SURVEY.md §5b): every query either ends in an
  * explicit ORDER BY on a unique key or aggregates to a small fully
  * ordered result; double aggregates are `round(x, 4)`-ed in BOTH
  * dialects so parallel-summation order cannot flip a hash.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** THE JSON string escaper for every harness artifact (Bench, Verify,
    * ScaleSpot): backslash, quote, and ALL control chars — an exception
    * message with a newline or NUL must never make a one-line JSON
    * artifact unparseable (the driver would then score the round as
    * parse-failed). Three divergent hand-rolled copies predate this.
    */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
