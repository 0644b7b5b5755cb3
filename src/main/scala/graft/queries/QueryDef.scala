package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the sf-dir parquet tables
  * plus (when SQL-expressible) a DuckDB oracle producing identical columns
  * and values. Column names MUST match — the driver sorts columns by name
  * and hashes values.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object QueryDef {
  /** read a testdata table */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
