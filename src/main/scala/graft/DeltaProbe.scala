package graft

import org.apache.spark.sql.functions._

/** Append-cost probe for the delta-maintained substrates: the
  * committed evidence that an appended crawl batch costs the DELTA,
  * not the corpus — now for all three artifacts (neardup_pairs,
  * neardup_comps, knn_edges) over a sequence of appends.
  *
  * Copies the SF's documents and embeddings tables to a scratch dir,
  * times the full base builds, then for each of `nAppends` synthetic
  * append batches (`deltaPct`% new rows each, ids offset past the
  * corpus max so they can never collide with real ids at any SF)
  * times (a) the incremental build in the SHARED cache and (b) a
  * from-scratch full rebuild of the same corpus state in a FRESH
  * cache — (a) vs (b), per step, is the incremental-maintenance win
  * at equal output.  Value-identity of the two is MaterializeSpec's
  * job; this main measures cost and asserts the delta path was
  * actually taken.
  *
  * Usage: {{{
  *   SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.DeltaProbe 1 5"
  * }}}
  * Args = delta percent (default 1), append count (default 5).
  * Writes `target/probe_delta_materialize.json`.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val deltaPct = args.headOption.map(_.toInt).getOrElse(1)
    val nAppends = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_delta_probe").toString
    val docsDir = s"$work/documents.parquet"
    val embDir = s"$work/embeddings.parquet"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.write.parquet(docsDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    emb.write.parquet(embDir)
    val nDocs = spark.read.parquet(docsDir).count()
    val nEmb = spark.read.parquet(embDir).count()
    // id offsets derive from the corpus maxima, so a synthetic id can
    // never collide with a real one regardless of scale factor
    val maxDocId = spark.read.parquet(docsDir).agg(max(col("doc_id"))).head.getLong(0)
    val maxVecId = spark.read.parquet(embDir).agg(max(col("vec_id"))).head.getLong(0)

    // synthetic append batches: deltaPct% new rows each, fresh ids,
    // perturbed text (a token prefix keeps them near their source —
    // some become near-dups of corpus docs, the realistic crawl
    // shape); embeddings reuse corpus vectors (exact semantic dups —
    // guaranteed dirty-set work for the kNN delta)
    val nDeltaDocs = math.max(1L, nDocs * deltaPct / 100)
    val nDeltaEmb = math.max(1L, nEmb * deltaPct / 100)
    def stageDocs(k: Int): String = {
      val stage = s"$work/stage_docs$k"
      docs.orderBy(col("doc_id")).limit(nDeltaDocs.toInt)
        .select((col("doc_id") + (maxDocId + 1) * k).as("doc_id"),
          concat(lit(s"appended batch $k doc "), col("text")).as("text"),
          col("source"), col("lang"), col("n_chars"))
        .write.parquet(stage)
      stage
    }
    def stageEmb(k: Int): String = {
      val stage = s"$work/stage_emb$k"
      emb.orderBy(col("vec_id")).limit(nDeltaEmb.toInt)
        .select((col("vec_id") + (maxVecId + 1) * k).as("vec_id"), col("embedding"))
        .write.parquet(stage)
      stage
    }
    def appendBatch(stage: String, destDir: String): Unit = {
      val dst = new java.io.File(destDir)
      new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
        .foreach { f =>
          require(f.renameTo(new java.io.File(dst,
            s"part-${new java.io.File(stage).getName}-${f.getName.stripPrefix("part-")}")))
        }
    }

    def timed(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def freshCache(): String =
      java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
    def buildPairs() = graft.operators.Dedup.nearDupPairs(spark, work).count()
    def buildComps() = graft.operators.Dedup.nearDupComponentLabels(spark, work).count()
    def buildKnn() = graft.operators.Similarity.knnJoinEmbeddings(spark, work).count()
    // (pairs, comps, knn) timed in dependency order: comps reads the
    // already-built pair artifact, so each number is that substrate's
    // own cost
    def buildAll(): (Double, Double, Double) =
      (timed(buildPairs()), timed(buildComps()), timed(buildKnn()))

    // warmup: one throwaway full build so codegen/shuffle/scan
    // machinery is hot before any timed leg (the Bench discipline)
    spark.conf.set("spark.graft.cache.dir", freshCache())
    buildAll()

    // full build of the base corpus, warm — this is the shared cache
    // the delta legs then maintain incrementally
    val liveCache = freshCache()
    spark.conf.set("spark.graft.cache.dir", liveCache)
    val (fbP, fbC, fbK) = buildAll()

    val deltaSecs = Array.ofDim[(Double, Double, Double)](nAppends)
    val fullSecs = Array.ofDim[(Double, Double, Double)](nAppends)
    for (k <- 1 to nAppends) {
      appendBatch(stageDocs(k), docsDir)
      appendBatch(stageEmb(k), embDir)
      spark.conf.set("spark.graft.cache.dir", liveCache)
      deltaSecs(k - 1) = buildAll()
      // full-rebuild alternative for the SAME corpus state, fresh cache
      spark.conf.set("spark.graft.cache.dir", freshCache())
      fullSecs(k - 1) = buildAll()
    }
    val M = graft.sources.Materialize
    val taken = Seq("neardup_pairs", "neardup_comps", "knn_edges")
      .map(n => n -> M.deltaBuildCount(n)).toMap

    def r3(x: Double) = math.rint(x * 1000) / 1000
    def arr(xs: Seq[Double]) = xs.map(r3).mkString("[", ",", "]")
    def block(name: String, base: Double, d: Seq[Double], f: Seq[Double]) =
      s""""$name":{"full_base_sec":${r3(base)},"delta_sec":${arr(d)},"full_sec":${arr(f)}}"""
    val json =
      s"""{"metric":"delta_materialize","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""corpus_docs":$nDocs,"corpus_vecs":$nEmb,"delta_pct":$deltaPct,""" +
      s""""n_appends":$nAppends,""" +
      block("pairs", fbP, deltaSecs.map(_._1).toSeq, fullSecs.map(_._1).toSeq) + "," +
      block("comps", fbC, deltaSecs.map(_._2).toSeq, fullSecs.map(_._2).toSeq) + "," +
      block("knn", fbK, deltaSecs.map(_._3).toSeq, fullSecs.map(_._3).toSeq) + "," +
      s""""delta_builds":{"neardup_pairs":${taken("neardup_pairs")},""" +
      s""""neardup_comps":${taken("neardup_comps")},"knn_edges":${taken("knn_edges")}}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/probe_delta_materialize.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
