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

  test("layout_prune reports the pruned scan's true touch counts") {
    val row = graft.operators.Pipeline.layoutPrune(spark, sf).head
    // one (day, event_type) directory selected, one file per directory
    assert(row.getAs[Long]("parts_selected") === 1L)
    assert(row.getAs[Long]("files_selected") === 1L)
    // the full layout is 30 days x 5 event types, one file each
    assert(row.getAs[Long]("files_total") === 150L)
    // rows_read agrees with a direct filter over the source table
    val want = Tables.events(spark, sf)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-15" &&
        col("event_type") === "purchase").count()
    assert(row.getAs[Long]("rows_read") === want)
    assert(want > 0, "fixture day/type must be populated at every SF")
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

  test("z-order layout: both dimensions prune by file stats; linear layout serves only its sort column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    // morton interleave is exact: z(2,1) = spread(2) | spread(1)<<1 =
    // 0b100 | 0b010 = 6; z(x,0)=spread(x); z(0,y)=spread(y)<<1
    val z = Layout.zValue(col("a"), col("b"))
    val zs = Seq((0, 0, 0L), (1, 0, 1L), (0, 1, 2L), (1, 1, 3L), (2, 1, 6L),
      (0x7fffffff, 0, 0x1555555555555555L))
      .toDF("a", "b", "want")
      .select(z.as("got"), col("want")).collect()
    zs.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // a 128x128 grid written 16 ways: z-ordered vs linearly x-sorted
    val grid = (for (x <- 0 until 128; y <- 0 until 128) yield (x, y))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/t"
    val linDir = java.nio.file.Files.createTempDirectory("graft-linear").toString + "/t"
    Layout.writeZOrdered(grid, zDir, "x", "y", files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(linDir)
    // per-FILE min/max — the stats parquet scan pruning actually uses
    def stats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val zStats = stats(zDir)
    val linStats = stats(linDir)
    assert(zStats.length === 16 && linStats.length === 16)
    def candidates(st: Array[(Int, Int, Int, Int)], xPred: Option[Int], yPred: Option[Int]) =
      st.count { case (x0, x1, y0, y1) =>
        xPred.forall(v => x0 <= v && v <= x1) && yPred.forall(v => y0 <= v && v <= y1)
      }
    // x point predicate: both layouts prune (z a bit coarser is fine)
    assert(candidates(zStats, Some(77), None) <= 8)
    assert(candidates(linStats, Some(77), None) <= 2)
    // y point predicate: the z layout keeps pruning, the linear layout
    // degrades to a full scan — the whole point of the interleave
    assert(candidates(zStats, None, Some(101)) <= 8,
      s"z-order y-pruning too coarse: ${zStats.mkString(",")}")
    assert(candidates(linStats, None, Some(101)) === 16,
      "a linear-by-x layout cannot prune on y (if this fails the fixture is degenerate)")
    // conjunctive predicate: z-order intersects both boxes
    assert(candidates(zStats, Some(77), Some(101)) <= 4)
  }
}
