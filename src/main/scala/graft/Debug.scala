package graft

import org.apache.spark.sql.functions._

/** Scratch instrumentation main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.sources.Tables

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles count")(println("docs=" + docs.count()))

    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig.minhashSig(col("sh"), 128).as("sig"))
    time("minhash sigs")(println("sigs=" + sig.count()))

    val banded = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(31)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
    time("banded")(println("banded=" + banded.count()))
    time("distinct bkeys")(println("dk=" + banded.select("band", "bkey").distinct().count()))
    val joinOut = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
    time("join size")(println("pairs=" + joinOut.count()))

    import graft.functions.SimHash64.simhash64
    val sdocs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(array_distinct(shingles(col("text"), 3))).as("sh"))
    val sbanded = sdocs.select(col("doc_id"), col("sh"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sh"), b * 8).bitwiseAND(lit(0xffL)).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bkey"))
    val sJoin = sbanded.as("a").join(sbanded.as("b"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
    time("simhash join size")(println("spairs=" + sJoin.count()))
    spark.stop()
  }
}
