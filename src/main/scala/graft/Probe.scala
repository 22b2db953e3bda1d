package graft

/** Isolated per-query benchmark probe — the adjudication tool for
  * driver-vs-local bench divergence.  [[Bench]] answers "what is the
  * whole suite's median under suite conditions"; Probe answers "what
  * does THIS query cost in isolation, and how wide is its intrinsic
  * spread" — the evidence that separates a co-tenancy wobble from a
  * real plan regression (round 6's dedup_chunk flag was cleared by
  * exactly this kind of 9-run span; round 7's knn_join/corpus_clean
  * flags asked for it again, hence a committed tool instead of an
  * ad-hoc console session).
  *
  * Usage: {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Probe knn_join corpus_clean 9"
  * }}}
  * Last arg, if numeric, is the run count (default 9).  Same session
  * config, warmup and between-run GC discipline as [[Bench]]; writes
  * `target/probe_<name>.json` per query ({runs, min, median, max})
  * for `tools/gate.sh`-style commit as round evidence.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val (names0, runs) = args.lastOption.filter(_.forall(_.isDigit)) match {
      case Some(n) => (args.dropRight(1).toSeq, n.toInt)
      case None    => (args.toSeq, 9)
    }
    val names = if (names0.nonEmpty) names0 else Seq("knn_join")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench: codegen/shuffle machinery plus decoded
    // data pages for every table, so run 1 is not a cold-read outlier
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    import org.apache.spark.sql.functions.{col, count, xxhash64}
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = graft.sources.Tables.table(spark, sfDir, t)
        df.agg(count(xxhash64(df.columns.map(col): _*))).collect(); ()
      } catch { case _: Throwable => }
    }
    def ms(x: Double): Double = math.rint(x * 1000) / 1000
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          val times = (1 to runs).map { _ =>
            System.gc()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            ms((System.nanoTime() - t0) / 1e9)
          }.sorted
          val rec =
            s"""{"query":"$name","sf":"${new java.io.File(sfDir).getName}","cpus":$cpus,"runs":${times.mkString("[", ",", "]")},"min":${times.head},"median":${times(times.length / 2)},"max":${times.last}}"""
          try java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"target/probe_$name.json"), rec + "\n")
          catch { case e: Throwable => System.err.println(s"[probe] write failed: $e") }
          println(rec)
      }
    }
    spark.stop()
  }
}
