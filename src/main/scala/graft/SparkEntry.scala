package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Registry

/** Driver contract — see /root/repo/SURVEY.md §2.0/§7.
  * All operator definitions live in [[graft.engine.Registry]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full corpus-release pipeline in one DAG (LSH dedup → quality
    * floor → language rebalance → content-hash split) — the engine's
    * north star composed end-to-end (SURVEY.md §2.2d). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("corpus_pipeline").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
