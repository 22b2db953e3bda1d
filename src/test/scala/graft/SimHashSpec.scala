package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.functions.TextFunctions

class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def simhashOf(tokens: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq(tokens).toDF("t")
      .select(SimHash64.simhash64(col("t")).as("h"))
      .head().getAs[Long]("h")
  }

  test("identical token sets hash identically") {
    val t = Seq("the", "quick", "brown", "fox", "jumps")
    assert(simhashOf(t) === simhashOf(t))
  }

  test("near-identical sets land within small hamming distance") {
    val base = (1 to 200).map(i => s"tok$i")
    val edited = base.updated(13, "changed").updated(100, "other")
    val h = java.lang.Long.bitCount(simhashOf(base) ^ simhashOf(edited))
    assert(h <= 12, s"hamming $h")
  }

  test("unrelated sets are far apart") {
    val a = (1 to 200).map(i => s"alpha$i")
    val b = (1 to 200).map(i => s"beta$i")
    val h = java.lang.Long.bitCount(simhashOf(a) ^ simhashOf(b))
    assert(h >= 16, s"hamming $h")
  }

  test("expression survives whole-stage codegen in a projection") {
    import org.apache.spark.sql.functions._
    val df = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(SimHash64.simhash64(TextFunctions.tokens(col("text"))).as("h"))
    assert(df.distinct().count() > 1)
  }
}
