package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, shiftleft}

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

  /** Bit-spread for Morton encoding: the low 32 bits of `c` interleaved
    * with zeros (the classic 5-step magic-mask ladder), all codegen'd
    * long arithmetic.
    */
  private def spread(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton (Z-order) interleave of two NON-NEGATIVE sub-2³¹ integer
    * columns — points close in (a, b) space get close z-values, so a
    * z-sorted file layout gives every file a TIGHT min/max box on BOTH
    * columns at once.  Pure shift/mask long arithmetic (codegen'd, no
    * UDF).
    */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Z-ordered parquet layout: range-partition on the Morton value
    * into `files` files, z-sorted within each.  Hive partitioning
    * (above) prunes on ONE low-cardinality column; bucketing co-locates
    * ONE join key; Z-ORDER is the third layout tool — a filter on
    * EITHER (or both) of two high-cardinality columns skips most files
    * via parquet min/max stats, where a linear sort serves only its
    * leading column.  At 100 TB this is the difference between reading
    * ~√F and F files for a point predicate on the second dimension
    * (the Delta/Iceberg OPTIMIZE ZORDER rationale, built from public
    * Morton arithmetic).  Pruning evidence is spec-pinned from the
    * written files' actual per-file min/max.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      files: Int): Unit =
    df.withColumn("__z", zValue(col(a), col(b)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
