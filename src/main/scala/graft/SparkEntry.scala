package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Analytics, GraphQueries, Inference, QueryDef, Relational, Sources, TextStats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (tagged with SURVEY §2 ids in the defs) to
  * Spark jobs over the sf-dir parquet tables; `oracleSql` carries the
  * equivalent DuckDB SQL where the operator is SQL-expressible (same column
  * names, deterministic values). Hash-family-dependent operators are
  * rows-only here and oracle-tested in ScalaTest.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    Relational.defs ++ TextStats.defs ++ Advanced.defs ++ GraphQueries.defs ++
      Sources.defs ++ Analytics.defs ++ Inference.defs

  /** Flagship: full KG pipeline (synthesize pages → extract → link →
    * triple-extract → aggregate) on a small corpus; driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q38_kg_triples")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(sql => q.name -> sql.trim)).toMap
}
