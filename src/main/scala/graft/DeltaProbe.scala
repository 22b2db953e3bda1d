package graft

import org.apache.spark.sql.functions._

/** Append-cost probe for the delta-maintained neardup substrate: the
  * committed evidence that an appended crawl batch costs the DELTA,
  * not the corpus.  Copies the SF's documents table to a scratch dir,
  * times (1) the full artifact build, (2) the incremental build after
  * appending `deltaPct`% synthetic new docs, and (3) a from-scratch
  * full rebuild of the SAME appended corpus — (2) vs (3) is the
  * incremental-maintenance win at equal output.  Value-identity of
  * (2) and (3) is MaterializeSpec's job; this main measures cost.
  *
  * Usage: {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.DeltaProbe 1"
  * }}}
  * Arg = delta percent (default 1).  Writes
  * `target/probe_delta_materialize.json`.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val deltaPct = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_delta_probe").toString
    val docsDir = s"$work/documents.parquet"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.write.parquet(docsDir)
    val nDocs = spark.read.parquet(docsDir).count()

    // two synthetic append batches: deltaPct% new docs each, fresh ids,
    // perturbed text (a token prefix keeps them near their source —
    // some become near-dups of corpus docs, the realistic crawl shape).
    // Append 1 also pays the one-time lazy DF-sidecar build; append 2
    // is the steady-state incremental cost.
    val nDelta = math.max(1L, nDocs * deltaPct / 100)
    def stageBatch(k: Int): String = {
      val stage = s"$work/stage$k"
      docs.orderBy(col("doc_id")).limit(nDelta.toInt)
        .select((col("doc_id") + 10000000L * k).as("doc_id"),
          concat(lit(s"appended batch $k doc "), col("text")).as("text"),
          col("source"), col("lang"), col("n_chars"))
        .write.parquet(stage)
      stage
    }
    def appendBatch(stage: String): Unit = {
      val dst = new java.io.File(docsDir)
      new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
        .foreach { f =>
          require(f.renameTo(new java.io.File(dst,
            s"part-${new java.io.File(stage).getName}-${f.getName.stripPrefix("part-")}")))
        }
    }

    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def freshCache(): String =
      java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString

    // warmup: one throwaway full build so codegen/shuffle/scan machinery
    // is hot before any timed leg (the Bench discipline)
    spark.conf.set("spark.graft.cache.dir", freshCache())
    graft.operators.Dedup.nearDupPairs(spark, work).count()

    // (1) full build of the base corpus, warm
    spark.conf.set("spark.graft.cache.dir", freshCache())
    val fullBase = timed(graft.operators.Dedup.nearDupPairs(spark, work).count())

    // (2) first append: delta path + the one-time DF-sidecar build
    appendBatch(stageBatch(1))
    val delta1 = timed(graft.operators.Dedup.nearDupPairs(spark, work).count())
    // (3) second append: steady-state incremental maintenance
    appendBatch(stageBatch(2))
    val delta2 = timed(graft.operators.Dedup.nearDupPairs(spark, work).count())
    val deltaBuilds = graft.sources.Materialize.deltaBuildCount("neardup_pairs")

    // (4) from-scratch full rebuild of the final corpus, fresh cache
    spark.conf.set("spark.graft.cache.dir", freshCache())
    val fullAppended = timed(graft.operators.Dedup.nearDupPairs(spark, work).count())

    def r3(x: Double) = math.rint(x * 1000) / 1000
    val json =
      s"""{"metric":"delta_materialize","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""corpus_docs":$nDocs,"delta_docs":$nDelta,"delta_pct":$deltaPct,""" +
      s""""full_base_sec":${r3(fullBase)},""" +
      s""""delta_append1_sec":${r3(delta1)},"delta_append2_sec":${r3(delta2)},""" +
      s""""full_appended_sec":${r3(fullAppended)},""" +
      s""""delta_path_taken":${deltaBuilds >= 2}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/probe_delta_materialize.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
