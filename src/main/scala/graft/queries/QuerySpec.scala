package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent ANSI SQL string the driver runs in
  * DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver's compare sorts columns by name.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object QuerySpec {
  def oracled(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(sql.trim))

  /** Ops with no faithful SQL mirror → driver records a rows-only check. */
  def unoracled(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
