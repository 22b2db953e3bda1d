package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout tools: bucketed, sorted managed tables.
  *
  * Two tables bucketed (and sorted) on the same key with the same
  * bucket count join with ZERO exchange — the scan itself satisfies
  * the join's required partitioning, so at 100 TB a recurring
  * fact⋈fact join pays its shuffle once at write time instead of on
  * every query.
  */
object Layout {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Hive-style directory partitioning (`path/col=value/...`).  A
    * filter on a partition column prunes whole directories at planning
    * time — the scan never opens the excluded files, which is the
    * difference between reading one day/source and reading the corpus
    * on a 100 TB date- or source-partitioned lake.  Keep partition
    * columns low-cardinality (date, source, lang): one directory and
    * ≥1 file per value, so a high-cardinality key degenerates into
    * millions of small files.  Pruning is spec-pinned (PartitionFilters
    * reaches the scan; non-matching files are never listed as inputs).
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table"); ()
  }
}
