package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q1 (single-table multi-aggregate, 6 groups) — no join/filter
    * selectivity dependencies, so the smoke is robust by construction.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Pipeline.queries ++ GraphOps.queries ++ Temporal.queries ++
      Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.  Omitted keys → rows-only check (ops whose
    * semantics are not SQL-expressible, e.g. sketches / LSH).
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ EventOps.oracleSql ++ TextOps.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      Pipeline.oracleSql ++ GraphOps.oracleSql ++ Temporal.oracleSql ++
      Analytics.oracleSql
}
