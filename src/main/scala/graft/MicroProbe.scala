package graft

import org.apache.spark.sql.functions.{col, count}

/** Micro-benchmark of Spark's per-job fixed cost in this harness — the
  * r20 overhead investigation's second stage.  Times tiny canonical
  * jobs (single-stage count, two-stage repartition+count, and a real
  * declared query's exec) under the graft session config, with
  * arbitrary config overrides via GRAFT_MICRO_CONF
  * ("k=v;k=v") so per-job cost drivers can be isolated empirically.
  * Measurement-only: never used by any declared query.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = GraftSession.builder(s"local[$cpus]", cpus.toInt)
    sys.env.get("GRAFT_MICRO_CONF").foreach { s =>
      s.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    def ms(x: Double): Double = math.rint(x * 10000) / 10000
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def bench(name: String, reps: Int)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(s"""{"micro":"$name","median":${ms(med(ts))},"min":${ms(ts.min)},"max":${ms(ts.max)}}""")
    }
    // stack-sampling mode: loop one tiny SQL action forever so jstack
    // samples of the driver main thread attribute the per-action cost
    if (sys.env.get("GRAFT_MICRO_SPIN").contains("1")) {
      println(s"SPIN pid=${ProcessHandle.current().pid()}")
      while (true) { spark.range(1000).agg(count(col("id"))).collect(); () }
    }
    val docsPath = s"$sfDir/documents.parquet"
    val docsSchema = spark.read.parquet(docsPath).schema
    bench("read_parquet_fresh", 15) { spark.read.parquet(docsPath); () }
    bench("read_parquet_with_schema", 15) {
      spark.read.schema(docsSchema).parquet(docsPath); ()
    }
    val liPath = s"$sfDir/lineitem.parquet"
    val liSchema = spark.read.parquet(liPath).schema
    bench("read_lineitem_fresh", 15) { spark.read.parquet(liPath); () }
    bench("read_lineitem_with_schema", 15) {
      spark.read.schema(liSchema).parquet(liPath); ()
    }
    val ones = spark.sparkContext.parallelize(1 to 32, 32)
    bench("rdd_count_reused", 15) { ones.count(); () }
    bench("rdd_count_fresh", 15) {
      spark.sparkContext.parallelize(1 to 32, 32).count(); ()
    }
    bench("rdd_count_1part", 15) {
      spark.sparkContext.parallelize(1 to 32, 1).count(); ()
    }
    bench("range_count_1stage", 15) {
      spark.range(1000).agg(count(col("id"))).collect(); ()
    }
    bench("repartition_2stage", 15) {
      spark.range(1000).repartition(7, col("id")).agg(count(col("id"))).collect(); ()
    }
    bench("repartition_3stage", 15) {
      spark.range(1000).repartition(7, col("id"))
        .groupBy((col("id") % 5).as("k")).agg(count(col("id")).as("c"))
        .agg(count(col("c"))).collect(); ()
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q9_profit", "active_users")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        bench(s"${n}_construct", 9) { fn(spark, sfDir); () }
        bench(s"${n}_full", 9) { fn(spark, sfDir).count(); () }
      }
    }
    spark.stop()
  }
}
