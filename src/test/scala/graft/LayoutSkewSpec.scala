package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.{Layout, Tables}

class LayoutSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted join returns exactly the plain join's rows and shuffles on (key, salt)") {
    import spark.implicits._
    // skewed big side: 10k rows on one hot key + a uniform tail
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++ (1 to 1000).map(i => (i.toLong % 50 + 2, i.toLong)))
      .toDF("k", "payload")
    val small = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, col("payload"), small, "k", 8)
    assert(salted.count() === plain.count())
    assert(salted.select(sum(col("payload"))).head.getLong(0) ===
      plain.select(sum(col("payload"))).head.getLong(0))
    // the shuffle key must carry the salt so the hot key spreads
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p.linesIterator.take(10).mkString("\n"))
  }

  test("bucketed tables on the same key join with zero shuffle exchange") {
    Layout.dropTable(spark, "b_orders"); Layout.dropTable(spark, "b_lineitem")
    Layout.writeBucketed(
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority")),
      "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity")),
      "b_lineitem", "l_orderkey", 8)
    try {
      val joined = spark.table("b_lineitem").hint("merge")
        .join(spark.table("b_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // bucketed scans satisfy the join's partitioning: no hash
      // shuffle anywhere in the final plan
      assert(!p.contains("Exchange hashpartitioning"),
        p.linesIterator.take(20).mkString("\n"))
      // and the result matches the plain join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expect)
    } finally {
      Layout.dropTable(spark, "b_orders"); Layout.dropTable(spark, "b_lineitem")
    }
  }

  test("partitioned layout prunes non-matching directories at the scan") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft-part")
    val dir = dirPath.toString
    try {
    Layout.writePartitioned(
      Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"), col("source")),
      dir, "source")
    val all = spark.read.parquet(dir)
    val sources = all.select(col("source")).distinct().collect().map(_.getString(0))
    assert(sources.length > 1, "fixture needs >1 partition to prove pruning")
    val one = all.filter(col("source") === sources.head)
    // planning-time pruning: the filter reaches the scan as a
    // PartitionFilter, and the excluded directories are never inputs
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      plan.linesIterator.take(12).mkString("\n"))
    // (inputFiles is relation-level and ignores the filter — the
    // pruning lives in the scan's selected partitions)
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanLike => f
    }.getOrElse(fail("no file scan in plan"))
    val parts = scan.selectedPartitions
    assert(parts.partitionCount === 1,
      s"selected ${parts.partitionCount} of ${sources.length} partitions")
    // trailing separator: "source=src1" must not pass via "source=src19"
    assert(parts.toPartitionArray.forall(
      _.filePath.toString.contains(s"source=${sources.head}/")))
    // values survive the round trip (partition column restored from
    // the directory name)
    val expect = Tables.documents(spark, sf)
      .filter(col("source") === sources.head)
      .agg(count(lit(1)), sum(col("n_chars"))).head
    assert(one.agg(count(lit(1)), sum(col("n_chars"))).head === expect)
    } finally {
      // the partitioned copy of documents is the largest fixture this
      // suite writes — tear it down like the bucketed tables above
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
