package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Scan, Tables}

/** Pins for the read-layer scan-width guard ([[graft.sources.Scan]]):
  * identity in every case where touching the plan would cost something
  * (small input, already wide, post-exchange, explicit user layout),
  * widening exactly in the one case it exists for (a big, narrow,
  * scan-shaped input), with values unchanged.  No-op cases are pinned
  * by REFERENCE equality — the guard returns the input frame itself,
  * so "untouched" is not a plan-diff judgment call.
  */
class ScanWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** A >4 MB single-file, single-row-group parquet — the exact layout
    * (one writer, one row group) that collapses a compute scan onto
    * one task at sf10.  sha2 hex is incompressible enough that 120k
    * rows clear [[Scan.WidenMinBytes]] compressed.
    */
  private lazy val bigNarrow: String = {
    val dir = "target/scanwiden_big.parquet"
    spark.range(120000)
      .select(col("id"),
        sha2(col("id").cast("string"), 256).as("a"),
        sha2((col("id") + 1).cast("string"), 512).as("b"))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("identity below the bytes gate: bundled-SF reads keep their exact plan") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
    assert(Scan.widen(raw) eq raw)
    // and therefore the Tables seam leaves every gate/bench SF plan
    // structurally identical to the pre-seam read (no Repartition)
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    assert(Tables.documents(spark, sf).queryExecution.analyzed
      .collect { case r: Repartition => r }.isEmpty)
  }

  test("a big one-row-group scan widens to scheduler width, values unchanged") {
    val raw = spark.read.parquet(bigNarrow)
    // Spark PLANS >=4 byte-range splits for this file — but only the
    // one holding the single row group's start yields rows.  The
    // footer probe must see through that: widen engages even though
    // the planned partition count says "already wide".
    val wide = Scan.widen(raw)
    assert(!(wide eq raw), "row-group probe must engage on a one-row-group file")
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(wide.select(sum(col("id")), count(lit(1))).collect().toSeq ==
      raw.select(sum(col("id")), count(lit(1))).collect().toSeq)
    def hx(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("a"), col("b")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    assert(hx(wide) == hx(raw))
  }

  test("an already-wide scan keeps its layout (never reduces partitioning)") {
    val wide8 = spark.range(0, 1000, 1, 8).toDF("id")
    assert(Scan.widen(wide8, minBytes = 0L) eq wide8)
  }

  test("a post-exchange plan is returned unprobed (no .rdd on shuffled input)") {
    // the ADVICE hazard: .rdd on a plan with exchanges makes AQE
    // materialize the shuffle stages at plan-build time.  Shape gate
    // means this frame is returned by REFERENCE without planning.
    val shuffled = spark.read.parquet(bigNarrow)
      .groupBy(col("a")).agg(count(lit(1)).as("n"))
    assert(Scan.widen(shuffled, minBytes = 0L) eq shuffled)
  }

  test("explicit user repartitioning is respected") {
    val userNarrow = spark.read.parquet(bigNarrow).repartition(1)
    assert(Scan.widen(userNarrow, minBytes = 0L) eq userNarrow)
  }

  test("scan-shaped survives projection and filter (the prep() shape)") {
    val projected = spark.read.parquet(bigNarrow)
      .filter(col("id") >= 0).select(col("id"), col("a"))
    val wide = Scan.widen(projected, minBytes = 0L)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }
}
