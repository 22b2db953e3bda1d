package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same session config as the product builder — benchmark the plans
    // the library actually produces
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed pass to warm codegen, parquet readers, shuffle
    // machinery AND the page cache for every input table — otherwise
    // whichever query sorts first per table pays its cold read and the
    // per-query timings measure disk order, not plans
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    // per-table try: one unreadable table must not leave the rest cold
    graft.sources.Tables.all.foreach { t =>
      try { graft.sources.Tables.table(spark, sfDir, t).count(); () }
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      // a failed query must read as a failure (-1), not a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures stay -1 per query but must never shrink the headline:
    // total sums successful queries only, and a nonzero failed count
    // flags the run as invalid
    val failed = results.count(_._2 < 0)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
