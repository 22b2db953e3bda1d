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

  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table"); ()
  }
}
