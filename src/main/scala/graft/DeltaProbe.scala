package graft

import org.apache.spark.sql.functions._

/** Append-cost probe for the delta-maintained substrates: the
  * committed evidence that an appended crawl batch costs the DELTA,
  * not the corpus.
  *
  * Two modes:
  *
  *  - `sf` (default): copies the SF's documents and embeddings tables
  *    to a scratch dir and probes all three artifacts (neardup_pairs,
  *    neardup_comps, knn_edges).  At SF scale the pair graph sits far
  *    below [[graft.operators.Dedup.LocalCcMaxEdges]], so the comps
  *    delta DECLINES by design (the full path is one driver
  *    union-find collect) — its delta_sec legs measure the declined
  *    path, i.e. they match full_sec.
  *  - `dup`: generates a heavy-duplication corpus (2,400 template
  *    groups × 22 identical docs → ≈554k near-dup pairs, ABOVE the
  *    driver budget) so the full comps path is the distributed
  *    O(log n)-round star contraction — the regime the comps delta
  *    exists for.  Appends spread one perturbed copy across the first
  *    1% of groups (group shingle DF stays far under the cap — no
  *    engineered pair deaths), so every append is merge-only and the
  *    delta path is taken.  knn is skipped (no embeddings here).
  *  - `vec`: generates a 200k-vector corpus (deterministic 64-dim
  *    pseudo-random embeddings) and probes ONLY knn_edges — the scale
  *    where the LSH self-join's candidate fan-out dominates the fixed
  *    scan/encode costs that make delta ≈ full at sf1's 20k vectors.
  *  - `cop` (round 14): stages the SF's lineitem table and probes ONLY
  *    copurchase_pairs — appends are deltaPct% of the base's orders
  *    re-keyed fresh (the transactional crawl shape), so the delta
  *    pays the appended lines' self-join + a semi-filtered prior scan
  *    instead of the corpus-wide order self-join.
  *  - `copdel` (round 16): the takedown twin of `cop` — doomed order
  *    batches staged before the base build, removed one per step; the
  *    delete-maintained rebuild (subtract the touched orders' pairs,
  *    fed by the cop_lines chunk sidecar) vs a full build of the
  *    survivors.
  *  - `mix` (round 16): the same-epoch crawl+takedown shape — each
  *    step removes one pre-staged doomed batch AND appends a fresh
  *    batch, routing pairs+knn through the remove∘delta composition.
  *  - `flags` (round 16): append-cost probe for the curation flag
  *    leaf (delta = row-local flags for the batch + subset
  *    re-elections + composed-index decon maintenance).
  *  - `flagsdel` (round 17): takedown-cost probe for the flag leaf
  *    (delete = survivor sidecar refresh + surgical two-direction
  *    decon + subset re-elections vs the full survivor rebuild).
  *  - `annix` (round 17, late session): append + takedown cost probe
  *    for the materialized ANN index tier (ivfpq variant) — delta =
  *    carried model + batch-only encode, delete = survivor semi-join
  *    under the carried model, each vs the full re-train + re-encode.
  *
  * For each of `nAppends` batches (fresh ids offset past the corpus
  * max so they can never collide at any scale), times (a) the
  * incremental build in the SHARED cache and (b) a from-scratch full
  * rebuild of the same corpus state in a FRESH cache — (a) vs (b),
  * per step, is the incremental-maintenance win at equal output.
  * Value-identity of the two is MaterializeSpec's job; this main
  * measures cost and reports how often the delta path actually ran.
  *
  * Usage: {{{
  *   SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.DeltaProbe 1 5"        // sf mode
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DeltaProbe 1 3 dup"
  * }}}
  * Args = delta percent (default 1), append count (default 5), mode.
  * Writes `target/probe_delta_materialize[_dup].json`.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val deltaPct = args.headOption.map(_.toInt).getOrElse(1)
    val nAppends = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val mode = args.drop(2).headOption.getOrElse("sf")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft_delta_probe").toString

    if (mode == "cop") {
      // `cop`: probes ONLY copurchase_pairs — appended batches are
      // deltaPct% of the base's orders re-keyed past the max orderkey
      // (fresh orders, the transactional crawl shape; the cross-order
      // and replay terms are MaterializeSpec's job, this measures cost)
      val liDir = s"$work/lineitem.parquet"
      graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey")).write.parquet(liDir)
      val nOrders = spark.read.parquet(liDir)
        .select(col("l_orderkey")).distinct().count()
      val maxOk = spark.read.parquet(liDir)
        .agg(max(col("l_orderkey"))).head.getLong(0)
      def stageLi(k: Int): String = {
        val stage = s"$work/stage_li$k"
        val src = spark.read.parquet(liDir)
        val picked = src.select(col("l_orderkey")).distinct()
          .orderBy(col("l_orderkey"))
          .limit(math.max(1L, nOrders * deltaPct / 100).toInt)
        src.join(picked, Seq("l_orderkey"), "left_semi")
          .select((col("l_orderkey") + (maxOk + 1) * k).as("l_orderkey"),
            col("l_partkey"))
          .write.parquet(stage)
        stage
      }
      def appendLi(stage: String): Unit = {
        val dst = new java.io.File(liDir)
        new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(dst,
              s"part-${new java.io.File(stage).getName}-${f.getName.stripPrefix("part-")}")))
          }
      }
      def timedC(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheC(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildCop(): Double =
        timedC(graft.operators.GraphOps.coPurchasePairs(spark, work).count())
      spark.conf.set("spark.graft.cache.dir", freshCacheC())
      buildCop() // warmup
      val liveCache = freshCacheC()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildCop()
      val deltaSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        appendLi(stageLi(k))
        spark.conf.set("spark.graft.cache.dir", liveCache)
        deltaSecs(k - 1) = buildCop()
        spark.conf.set("spark.graft.cache.dir", freshCacheC())
        fullSecs(k - 1) = buildCop()
      }
      def r3c(x: Double) = math.rint(x * 1000) / 1000
      def arrC(xs: Seq[Double]) = xs.map(r3c).mkString("[", ",", "]")
      val json =
        s"""{"metric":"delta_materialize","mode":"cop","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_orders":$nOrders,"delta_pct":$deltaPct,"n_appends":$nAppends,""" +
        s""""cop":{"full_base_sec":${r3c(fb)},"delta_sec":${arrC(deltaSecs.toSeq)},""" +
        s""""full_sec":${arrC(fullSecs.toSeq)}},""" +
        s""""delta_builds":{"copurchase_pairs":${graft.sources.Materialize.deltaBuildCount("copurchase_pairs")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_cop.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "copdel") {
      // `copdel` (round 16): takedown-cost probe for the co-purchase
      // substrate.  Doomed batches (deltaPct% of the base's orders,
      // re-keyed fresh) are staged in BEFORE the base build — the
      // compacted-base shape takedowns apply to; each step REMOVES one
      // batch's files and times the delete-maintained rebuild vs a
      // from-scratch full build of the survivors.
      val liDir = s"$work/lineitem.parquet"
      graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey")).write.parquet(liDir)
      val nOrders = spark.read.parquet(liDir)
        .select(col("l_orderkey")).distinct().count()
      val maxOk = spark.read.parquet(liDir)
        .agg(max(col("l_orderkey"))).head.getLong(0)
      val doomSrc = s"$work/doom_src_li"
      val src = spark.read.parquet(liDir)
      val picked = src.select(col("l_orderkey")).distinct()
        .orderBy(col("l_orderkey"))
        .limit(math.max(1L, nOrders * deltaPct / 100).toInt)
      src.join(picked, Seq("l_orderkey"), "left_semi").write.parquet(doomSrc)
      def stageDoom(k: Int): Unit = {
        val st = s"$work/doom_li$k"
        spark.read.parquet(doomSrc)
          .select((col("l_orderkey") + (maxOk + 1) * k).as("l_orderkey"),
            col("l_partkey"))
          .write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(liDir,
              s"part-doom$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      (1 to nAppends).foreach(stageDoom)
      def removeBatch(k: Int): Unit =
        new java.io.File(liDir).listFiles()
          .filter(_.getName.startsWith(s"part-doom$k-"))
          .foreach(f => require(f.delete(), s"could not remove $f"))
      def timedC(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheC(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildCop(): Double =
        timedC(graft.operators.GraphOps.coPurchasePairs(spark, work).count())
      spark.conf.set("spark.graft.cache.dir", freshCacheC())
      buildCop() // warmup
      val liveCache = freshCacheC()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildCop()
      val delSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        removeBatch(k)
        spark.conf.set("spark.graft.cache.dir", liveCache)
        delSecs(k - 1) = buildCop()
        spark.conf.set("spark.graft.cache.dir", freshCacheC())
        fullSecs(k - 1) = buildCop()
      }
      def r3c(x: Double) = math.rint(x * 1000) / 1000
      def arrC(xs: Seq[Double]) = xs.map(r3c).mkString("[", ",", "]")
      val json =
        s"""{"metric":"delete_materialize","mode":"copdel","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_orders":$nOrders,"delta_pct":$deltaPct,"n_deletes":$nAppends,""" +
        s""""cop":{"full_base_sec":${r3c(fb)},"delete_sec":${arrC(delSecs.toSeq)},""" +
        s""""full_sec":${arrC(fullSecs.toSeq)}},""" +
        s""""delete_builds":{"copurchase_pairs":${graft.sources.Materialize.deleteBuildCount("copurchase_pairs")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_copdel.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "mix") {
      // `mix` (round 16): the same-epoch crawl+takedown probe — each
      // step removes one pre-staged doomed batch AND appends one fresh
      // batch in the same snapshot step, so the maintained substrates
      // route through the remove∘delta composition; timed against a
      // from-scratch full build of the same corpus state.
      val docsDir = s"$work/documents.parquet"
      val embDir = s"$work/embeddings.parquet"
      graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        .write.parquet(docsDir)
      graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).write.parquet(embDir)
      val nDocs = spark.read.parquet(docsDir).count()
      val nEmb = spark.read.parquet(embDir).count()
      val maxDocId = spark.read.parquet(docsDir).agg(max(col("doc_id"))).head.getLong(0)
      val maxVecId = spark.read.parquet(embDir).agg(max(col("vec_id"))).head.getLong(0)
      val nDelDocs = math.max(1L, nDocs * deltaPct / 100)
      val nDelEmb = math.max(1L, nEmb * deltaPct / 100)
      val mixSrcDocs = s"$work/mix_src_docs"
      spark.read.parquet(docsDir).orderBy(col("doc_id")).limit(nDelDocs.toInt)
        .select(col("doc_id"), col("text")).write.parquet(mixSrcDocs)
      val mixSrcEmb = s"$work/mix_src_emb"
      spark.read.parquet(embDir).orderBy(col("vec_id")).limit(nDelEmb.toInt)
        .select(col("vec_id"), col("embedding")).write.parquet(mixSrcEmb)
      def move(stage: String, destDir: String, tag: String): Unit =
        new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(destDir,
              s"part-$tag-${f.getName.stripPrefix("part-")}")))
          }
      def stageBatch(k: Int, tag: String): Unit = {
        // doomed batches use offset k, appended batches offset 1000+k —
        // fresh ids in both lanes, never colliding
        val sd = s"$work/${tag}_docs$k"
        spark.read.parquet(mixSrcDocs)
          .select((col("doc_id") + (maxDocId + 1) * k).as("doc_id"),
            concat(lit(s"$tag batch $k doc "), col("text")).as("text"))
          .write.parquet(sd)
        val se = s"$work/${tag}_emb$k"
        spark.read.parquet(mixSrcEmb)
          .select((col("vec_id") + (maxVecId + 1) * k).as("vec_id"), col("embedding"))
          .write.parquet(se)
        move(sd, docsDir, s"$tag$k"); move(se, embDir, s"$tag$k")
      }
      (1 to nAppends).foreach(k => stageBatch(k, "doom"))
      def removeBatch(k: Int): Unit =
        Seq(docsDir, embDir).foreach { d =>
          new java.io.File(d).listFiles()
            .filter(_.getName.startsWith(s"part-doom$k-"))
            .foreach(f => require(f.delete(), s"could not remove $f"))
        }
      def timedM(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheM(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildBothM(): (Double, Double) =
        (timedM(graft.operators.Dedup.nearDupPairs(spark, work).count()),
          timedM(graft.operators.Similarity.knnJoinEmbeddings(spark, work).count()))
      spark.conf.set("spark.graft.cache.dir", freshCacheM())
      buildBothM() // warmup
      val liveCache = freshCacheM()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val (fbP, fbK) = buildBothM()
      val mixSecs = Array.ofDim[(Double, Double)](nAppends)
      val fullSecs = Array.ofDim[(Double, Double)](nAppends)
      for (k <- 1 to nAppends) {
        removeBatch(k)
        stageBatch(1000 + k, "app")
        spark.conf.set("spark.graft.cache.dir", liveCache)
        mixSecs(k - 1) = buildBothM()
        spark.conf.set("spark.graft.cache.dir", freshCacheM())
        fullSecs(k - 1) = buildBothM()
      }
      val M = graft.sources.Materialize
      def r3m(x: Double) = math.rint(x * 1000) / 1000
      def arrM(xs: Seq[Double]) = xs.map(r3m).mkString("[", ",", "]")
      def blockM(name: String, base: Double, d: Seq[Double], f: Seq[Double]) =
        s""""$name":{"full_base_sec":${r3m(base)},"mixed_sec":${arrM(d)},"full_sec":${arrM(f)}}"""
      val json =
        s"""{"metric":"mixed_materialize","mode":"mix","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_docs":$nDocs,"corpus_vecs":$nEmb,"delta_pct":$deltaPct,""" +
        s""""n_steps":$nAppends,""" +
        blockM("pairs", fbP, mixSecs.map(_._1).toSeq, fullSecs.map(_._1).toSeq) + "," +
        blockM("knn", fbK, mixSecs.map(_._2).toSeq, fullSecs.map(_._2).toSeq) + "," +
        s""""delta_builds":{"neardup_pairs":${M.deltaBuildCount("neardup_pairs")},""" +
        s""""knn_edges":${M.deltaBuildCount("knn_edges")}},""" +
        s""""delete_builds":{"neardup_pairs":${M.deleteBuildCount("neardup_pairs")},""" +
        s""""knn_edges":${M.deleteBuildCount("knn_edges")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_mix.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "flags") {
      // `flags` (round 16): append-cost probe for the curation flag
      // leaf — appended batches are perturbed copies of corpus docs
      // (fresh ids, text prefix), the realistic crawl shape; each step
      // times the delta-maintained flag rebuild (including its
      // upstream pair/comp deltas) vs a from-scratch full build of the
      // same corpus state.
      val docsDir = s"$work/documents.parquet"
      graft.sources.Tables.documents(spark, sfDir).write.parquet(docsDir)
      val nDocs = spark.read.parquet(docsDir).count()
      val maxDocId = spark.read.parquet(docsDir).agg(max(col("doc_id"))).head.getLong(0)
      val nDelta = math.max(1L, nDocs * deltaPct / 100)
      val srcDocs = s"$work/flags_src_docs"
      val src0 = spark.read.parquet(docsDir)
      src0.orderBy(col("doc_id")).limit(nDelta.toInt).write.parquet(srcDocs)
      def stageF(k: Int): Unit = {
        val st = s"$work/flags_stage$k"
        val src = spark.read.parquet(srcDocs)
        src.select((col("doc_id") + (maxDocId + 1) * k).as("doc_id") +:
            concat(lit(s"appended batch $k doc "), col("text")).as("text") +:
            src.columns.filterNot(c => c == "doc_id" || c == "text").map(col).toSeq: _*)
          .write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(docsDir,
              s"part-flags$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      def timedF(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheF(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildFlags(): Double =
        timedF(graft.operators.Pipeline.curationFlags(spark, work).count())
      spark.conf.set("spark.graft.cache.dir", freshCacheF())
      buildFlags() // warmup
      val liveCache = freshCacheF()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildFlags()
      val deltaSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        stageF(k)
        spark.conf.set("spark.graft.cache.dir", liveCache)
        deltaSecs(k - 1) = buildFlags()
        spark.conf.set("spark.graft.cache.dir", freshCacheF())
        fullSecs(k - 1) = buildFlags()
      }
      val M = graft.sources.Materialize
      def r3f(x: Double) = math.rint(x * 1000) / 1000
      def arrF(xs: Seq[Double]) = xs.map(r3f).mkString("[", ",", "]")
      val json =
        s"""{"metric":"delta_materialize","mode":"flags","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_docs":$nDocs,"delta_pct":$deltaPct,"n_appends":$nAppends,""" +
        s""""flags":{"full_base_sec":${r3f(fb)},"delta_sec":${arrF(deltaSecs.toSeq)},""" +
        s""""full_sec":${arrF(fullSecs.toSeq)}},""" +
        s""""delta_builds":{"curation_flags":${M.deltaBuildCount("curation_flags")},""" +
        s""""neardup_pairs":${M.deltaBuildCount("neardup_pairs")},""" +
        s""""neardup_comps":${M.deltaBuildCount("neardup_comps")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_flags.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "flagsdel") {
      // `flagsdel` (round 17): takedown-cost probe for the curation
      // flag leaf — the corpus is staged as a core file plus
      // `nAppends` removable slice files of ~deltaPct% each (ALL part
      // of the compacted base, the GDPR-on-old-data shape); each step
      // removes one slice and times the delete-maintained rebuild
      // (survivor sidecar refresh + surgical decon + subset
      // re-elections) vs a from-scratch full build of the survivors.
      val docsDir = s"$work/documents.parquet"
      val all = graft.sources.Tables.documents(spark, sfDir)
      val nDocs = all.count()
      val nDelta = math.max(1L, nDocs * deltaPct / 100)
      val ids = all.select(col("doc_id")).orderBy(col("doc_id"))
        .limit((nDelta * nAppends).toInt).collect().map(_.getLong(0))
      val core = all.filter(col("doc_id") > ids.last)
      core.write.parquet(docsDir)
      for (k <- 1 to nAppends) {
        val lo = ids(((k - 1) * nDelta).toInt)
        val hi = ids((k * nDelta - 1).toInt)
        val st = s"$work/flagsdel_stage$k"
        all.filter(col("doc_id") >= lo && col("doc_id") <= hi).write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(docsDir,
              s"part-slice$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      def timedF(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheF(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildFlags(): Double =
        timedF(graft.operators.Pipeline.curationFlags(spark, work).count())
      spark.conf.set("spark.graft.cache.dir", freshCacheF())
      buildFlags() // warmup
      val liveCache = freshCacheF()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildFlags()
      val deleteSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        new java.io.File(docsDir).listFiles()
          .filter(_.getName.startsWith(s"part-slice$k-"))
          .foreach(f => require(f.delete()))
        spark.conf.set("spark.graft.cache.dir", liveCache)
        deleteSecs(k - 1) = buildFlags()
        spark.conf.set("spark.graft.cache.dir", freshCacheF())
        fullSecs(k - 1) = buildFlags()
      }
      val M = graft.sources.Materialize
      def r3f(x: Double) = math.rint(x * 1000) / 1000
      def arrF(xs: Seq[Double]) = xs.map(r3f).mkString("[", ",", "]")
      val json =
        s"""{"metric":"delete_materialize","mode":"flagsdel","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_docs":$nDocs,"delta_pct":$deltaPct,"n_removals":$nAppends,""" +
        s""""flags":{"full_base_sec":${r3f(fb)},"delete_sec":${arrF(deleteSecs.toSeq)},""" +
        s""""full_sec":${arrF(fullSecs.toSeq)}},""" +
        s""""delete_builds":{"curation_flags":${M.deleteBuildCount("curation_flags")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_flagsdel.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "annix") {
      // `annix` (round 17, late session): maintenance-cost probe for
      // the materialized ANN index tier — each append step stages a
      // fresh-id batch (deltaPct% of the corpus) and times the
      // delta-maintained refresh (model CARRIED, codes batch-encode +
      // LSM tail) vs a from-scratch full build (re-train + full
      // re-encode) of the same corpus state; a takedown phase then
      // removes the staged batches newest-first and times the delete
      // path (survivor semi-join under the carried model) vs a full
      // survivor rebuild.  Probes the ivfpq variant (the driver's
      // richest: coarse quantizer + codebooks + cid-range layout).
      // base = core file + nAppends removable SLICE files (each
      // ~deltaPct%), all part of the trained base — removing a slice
      // is the GDPR-on-old-data shape: a pure delete against the
      // LATEST artifact with no earlier snapshot to cache-hit (pulling
      // appended batches back out would just rediscover the pre-append
      // artifact — the emergent cheapest-prior shortcut, not the
      // delete algebra this probe prices)
      val embDir = s"$work/embeddings.parquet"
      val all = graft.sources.Tables.embeddings(spark, sfDir)
      val nVec = all.count()
      val maxId = all.agg(max(col("vec_id"))).head.getLong(0)
      val nDelta = math.max(1L, nVec * deltaPct / 100)
      // the base must keep at least one row after carving out the
      // slices: deltaPct·nAppends ≥ 100 would make limit() return
      // fewer rows than sliceIds() indexes (AIOOBE three lines down)
      // — fail with the parameter error, not the symptom.  toIntExact
      // (not .toInt) so a corpus past 2³¹ slices aborts instead of
      // silently truncating the carve.
      require(nDelta * nAppends < nVec,
        s"deltaPct=$deltaPct x nAppends=$nAppends carves >= the whole " +
          s"corpus ($nVec rows) — lower one of them")
      val sliceIds = all.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(Math.toIntExact(nDelta * nAppends)).collect().map(_.getLong(0))
      all.filter(col("vec_id") > sliceIds.last).write.parquet(embDir)
      for (k <- 1 to nAppends) {
        val lo = sliceIds(Math.toIntExact((k - 1) * nDelta))
        val hi = sliceIds(Math.toIntExact(k * nDelta - 1))
        val st = s"$work/annix_slice$k"
        all.filter(col("vec_id") >= lo && col("vec_id") <= hi).write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(embDir,
              s"part-slice$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      val srcVecs = s"$work/annix_src"
      val src0 = spark.read.parquet(embDir)
      src0.orderBy(col("vec_id")).limit(Math.toIntExact(nDelta)).write.parquet(srcVecs)
      def stageA(k: Int): Unit = {
        val st = s"$work/annix_stage$k"
        val src = spark.read.parquet(srcVecs)
        src.select((col("vec_id") + (maxId + 1) * k).as("vec_id") +:
            src.columns.filterNot(_ == "vec_id").map(col).toSeq: _*)
          .write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(embDir,
              s"part-annix$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      def timedA(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheA(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildIx(): Double = timedA {
        val (codes, _, _, _) =
          graft.operators.Similarity.annIndexed(spark, work, "ivfpq")
        codes.count()
      }
      spark.conf.set("spark.graft.cache.dir", freshCacheA())
      buildIx() // warmup
      val liveCache = freshCacheA()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildIx()
      val deltaSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        stageA(k)
        spark.conf.set("spark.graft.cache.dir", liveCache)
        deltaSecs(k - 1) = buildIx()
        spark.conf.set("spark.graft.cache.dir", freshCacheA())
        fullSecs(k - 1) = buildIx()
      }
      // takedown phase: remove the BASE slices one by one — each
      // removal is the pure-delete shape the codes delete builder keys
      // on (survivors include the appended batches, so no earlier
      // published snapshot matches)
      val delSecs = Array.ofDim[Double](nAppends)
      val delFullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        new java.io.File(embDir).listFiles()
          .filter(_.getName.startsWith(s"part-slice$k-"))
          .foreach(f => require(f.delete()))
        spark.conf.set("spark.graft.cache.dir", liveCache)
        delSecs(k - 1) = buildIx()
        spark.conf.set("spark.graft.cache.dir", freshCacheA())
        delFullSecs(k - 1) = buildIx()
      }
      val M = graft.sources.Materialize
      def r3a(x: Double) = math.rint(x * 1000) / 1000
      def arrA(xs: Seq[Double]) = xs.map(r3a).mkString("[", ",", "]")
      val json =
        s"""{"metric":"annix_maintenance","mode":"annix","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_vecs":$nVec,"delta_pct":$deltaPct,"n_steps":$nAppends,""" +
        s""""annix_ivfpq":{"full_base_sec":${r3a(fb)},"delta_sec":${arrA(deltaSecs.toSeq)},""" +
        s""""full_sec":${arrA(fullSecs.toSeq)},"delete_sec":${arrA(delSecs.toSeq)},""" +
        s""""delete_full_sec":${arrA(delFullSecs.toSeq)}},""" +
        s""""delta_builds":{"annix_model_ivfpq":${M.deltaBuildCount("annix_model_ivfpq")},""" +
        s""""annix_codes_ivfpq":${M.deltaBuildCount("annix_codes_ivfpq")}},""" +
        s""""delete_builds":{"annix_model_ivfpq":${M.deleteBuildCount("annix_model_ivfpq")},""" +
        s""""annix_codes_ivfpq":${M.deleteBuildCount("annix_codes_ivfpq")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_annix.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "annixmix") {
      // `annixmix` (round 18): the mixed (same-epoch crawl+takedown)
      // composition priced for the materialized ANN index tier — the
      // one maintained family whose append and delete paths were
      // probed separately (r17: `annix`) but never composed.  Setup
      // mirrors `annix`: the ivfpq model trains over base + doomed
      // slices (so a removal is a true takedown against the TRAINED
      // base, no earlier snapshot to cache-hit); each step then
      // removes one doomed slice AND appends one fresh-id batch in
      // the same snapshot step, routing the codes artifact through
      // the seam's remove∘delta composition (expected cost ≈ the
      // probed delete + append deltas; attribution 1 delta + 1 delete
      // per step, model carried verbatim).
      val embDir = s"$work/embeddings.parquet"
      val all = graft.sources.Tables.embeddings(spark, sfDir)
      val nVec = all.count()
      val maxId = all.agg(max(col("vec_id"))).head.getLong(0)
      val nDelta = math.max(1L, nVec * deltaPct / 100)
      require(nDelta * nAppends < nVec,
        s"deltaPct=$deltaPct x nAppends=$nAppends carves >= the whole " +
          s"corpus ($nVec rows) — lower one of them")
      val sliceIds = all.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(Math.toIntExact(nDelta * nAppends)).collect().map(_.getLong(0))
      all.filter(col("vec_id") > sliceIds.last).write.parquet(embDir)
      for (k <- 1 to nAppends) {
        val lo = sliceIds(Math.toIntExact((k - 1) * nDelta))
        val hi = sliceIds(Math.toIntExact(k * nDelta - 1))
        val st = s"$work/annixmix_slice$k"
        all.filter(col("vec_id") >= lo && col("vec_id") <= hi).write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(embDir,
              s"part-doom$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      val srcVecs = s"$work/annixmix_src"
      val src0 = spark.read.parquet(embDir)
      src0.orderBy(col("vec_id")).limit(Math.toIntExact(nDelta)).write.parquet(srcVecs)
      def stageApp(k: Int): Unit = {
        val st = s"$work/annixmix_app$k"
        val src = spark.read.parquet(srcVecs)
        src.select((col("vec_id") + (maxId + 1) * k).as("vec_id") +:
            src.columns.filterNot(_ == "vec_id").map(col).toSeq: _*)
          .write.parquet(st)
        new java.io.File(st).listFiles().filter(_.getName.startsWith("part-"))
          .foreach { f =>
            require(f.renameTo(new java.io.File(embDir,
              s"part-app$k-${f.getName.stripPrefix("part-")}")))
          }
      }
      def removeDoom(k: Int): Unit =
        new java.io.File(embDir).listFiles()
          .filter(_.getName.startsWith(s"part-doom$k-"))
          .foreach(f => require(f.delete(), s"could not remove $f"))
      def timedX(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheX(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildIxX(): Double = timedX {
        val (codes, _, _, _) =
          graft.operators.Similarity.annIndexed(spark, work, "ivfpq")
        codes.count()
      }
      spark.conf.set("spark.graft.cache.dir", freshCacheX())
      buildIxX() // warmup
      val liveCache = freshCacheX()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val fb = buildIxX()
      val mixSecs = Array.ofDim[Double](nAppends)
      val fullSecs = Array.ofDim[Double](nAppends)
      for (k <- 1 to nAppends) {
        removeDoom(k)
        stageApp(k)
        spark.conf.set("spark.graft.cache.dir", liveCache)
        mixSecs(k - 1) = buildIxX()
        spark.conf.set("spark.graft.cache.dir", freshCacheX())
        fullSecs(k - 1) = buildIxX()
      }
      val M = graft.sources.Materialize
      def r3x(x: Double) = math.rint(x * 1000) / 1000
      def arrX(xs: Seq[Double]) = xs.map(r3x).mkString("[", ",", "]")
      val json =
        s"""{"metric":"annix_mixed","mode":"annixmix","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_vecs":$nVec,"delta_pct":$deltaPct,"n_steps":$nAppends,""" +
        s""""annix_ivfpq":{"full_base_sec":${r3x(fb)},"mixed_sec":${arrX(mixSecs.toSeq)},""" +
        s""""full_sec":${arrX(fullSecs.toSeq)}},""" +
        s""""delta_builds":{"annix_model_ivfpq":${M.deltaBuildCount("annix_model_ivfpq")},""" +
        s""""annix_codes_ivfpq":${M.deltaBuildCount("annix_codes_ivfpq")}},""" +
        s""""delete_builds":{"annix_model_ivfpq":${M.deleteBuildCount("annix_model_ivfpq")},""" +
        s""""annix_codes_ivfpq":${M.deleteBuildCount("annix_codes_ivfpq")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_annixmix.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    if (mode == "del") {
      // `del` (round 15): takedown-cost probe for the two
      // delete-maintained substrates (neardup_pairs, knn_edges).  The
      // corpus is staged as base + nAppends doomed batches (deltaPct%
      // each, separate part files, present BEFORE the base build —
      // the compacted-base shape takedowns apply to); each step
      // REMOVES one batch's files and times (a) the delete-maintained
      // rebuild in the shared cache vs (b) a from-scratch full build
      // of the surviving corpus in a fresh cache.  Doomed embeddings
      // are copies of corpus vectors (guaranteed top-k hits, so the
      // dirty-lid rescore does real work); doomed docs are perturbed
      // near-dups of corpus docs.
      val docsDir = s"$work/documents.parquet"
      val embDir = s"$work/embeddings.parquet"
      val docs = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      docs.write.parquet(docsDir)
      graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).write.parquet(embDir)
      val nDocs = spark.read.parquet(docsDir).count()
      val nEmb = spark.read.parquet(embDir).count()
      val maxDocId = spark.read.parquet(docsDir).agg(max(col("doc_id"))).head.getLong(0)
      val maxVecId = spark.read.parquet(embDir).agg(max(col("vec_id"))).head.getLong(0)
      val nDelDocs = math.max(1L, nDocs * deltaPct / 100)
      val nDelEmb = math.max(1L, nEmb * deltaPct / 100)
      // snapshot the doomed-batch SOURCE rows once, from the pristine
      // base, BEFORE any staging: deriving each batch from the live
      // dirs would re-scan a growing directory per batch and lean on
      // the implicit invariant that doomed ids (id + (max+1)*k) sort
      // after every base id
      val doomSrcDocs = s"$work/doom_src_docs"
      spark.read.parquet(docsDir).orderBy(col("doc_id")).limit(nDelDocs.toInt)
        .select(col("doc_id"), col("text")).write.parquet(doomSrcDocs)
      val doomSrcEmb = s"$work/doom_src_emb"
      spark.read.parquet(embDir).orderBy(col("vec_id")).limit(nDelEmb.toInt)
        .select(col("vec_id"), col("embedding")).write.parquet(doomSrcEmb)
      def stageIn(k: Int): Unit = {
        val sd = s"$work/doom_docs$k"
        spark.read.parquet(doomSrcDocs)
          .select((col("doc_id") + (maxDocId + 1) * k).as("doc_id"),
            concat(lit(s"doomed batch $k doc "), col("text")).as("text"))
          .write.parquet(sd)
        val se = s"$work/doom_emb$k"
        spark.read.parquet(doomSrcEmb)
          .select((col("vec_id") + (maxVecId + 1) * k).as("vec_id"), col("embedding"))
          .write.parquet(se)
        def move(stage: String, destDir: String): Unit =
          new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
            .foreach { f =>
              require(f.renameTo(new java.io.File(destDir,
                s"part-doom$k-${f.getName.stripPrefix("part-")}")))
            }
        move(sd, docsDir); move(se, embDir)
      }
      (1 to nAppends).foreach(stageIn)
      def removeBatch(k: Int): Unit =
        Seq(docsDir, embDir).foreach { d =>
          new java.io.File(d).listFiles()
            .filter(_.getName.startsWith(s"part-doom$k-"))
            .foreach(f => require(f.delete(), s"could not remove $f"))
        }
      def timedD(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def freshCacheD(): String =
        java.nio.file.Files.createTempDirectory("graft_delta_probe_cache").toString
      def buildBoth(): (Double, Double) =
        (timedD(graft.operators.Dedup.nearDupPairs(spark, work).count()),
          timedD(graft.operators.Similarity.knnJoinEmbeddings(spark, work).count()))
      spark.conf.set("spark.graft.cache.dir", freshCacheD())
      buildBoth() // warmup
      val liveCache = freshCacheD()
      spark.conf.set("spark.graft.cache.dir", liveCache)
      val (fbP, fbK) = buildBoth()
      val delSecs = Array.ofDim[(Double, Double)](nAppends)
      val fullSecs = Array.ofDim[(Double, Double)](nAppends)
      for (k <- 1 to nAppends) {
        removeBatch(k)
        spark.conf.set("spark.graft.cache.dir", liveCache)
        delSecs(k - 1) = buildBoth()
        spark.conf.set("spark.graft.cache.dir", freshCacheD())
        fullSecs(k - 1) = buildBoth()
      }
      val M = graft.sources.Materialize
      def r3d(x: Double) = math.rint(x * 1000) / 1000
      def arrD(xs: Seq[Double]) = xs.map(r3d).mkString("[", ",", "]")
      def blockD(name: String, base: Double, d: Seq[Double], f: Seq[Double]) =
        s""""$name":{"full_base_sec":${r3d(base)},"delete_sec":${arrD(d)},"full_sec":${arrD(f)}}"""
      val json =
        s"""{"metric":"delete_materialize","mode":"del","sf":"${new java.io.File(sfDir).getName}",""" +
        s""""corpus_docs":$nDocs,"corpus_vecs":$nEmb,"delta_pct":$deltaPct,""" +
        s""""n_deletes":$nAppends,""" +
        blockD("pairs", fbP, delSecs.map(_._1).toSeq, fullSecs.map(_._1).toSeq) + "," +
        blockD("knn", fbK, delSecs.map(_._2).toSeq, fullSecs.map(_._2).toSeq) + "," +
        s""""delete_builds":{"neardup_pairs":${M.deleteBuildCount("neardup_pairs")},""" +
        s""""knn_edges":${M.deleteBuildCount("knn_edges")}}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/probe_delta_materialize_del.json"), json + "\n")
      spark.stop()
      println(json)
      return
    }

    val docsDir = s"$work/documents.parquet"
    val embDir = s"$work/embeddings.parquet"
    val withKnn = mode != "dup"
    val withDocs = mode != "vec"
    val docs =
      if (mode == "dup") {
        // 2,400 groups x 22 identical 52-word docs: C(22,2) pairs per
        // group = 554,400 pairs total — above the 2^19 driver budget,
        // so full comps = the distributed contraction
        val perGroup = 22
        spark.range(2400L * perGroup).select(
          ((col("id") / perGroup).cast("long") * 100 + col("id") % perGroup).as("doc_id"),
          expr(s"concat_ws(' ', transform(sequence(0, 51), " +
            s"i -> concat('g', CAST(id DIV $perGroup AS STRING), 'w', CAST(i AS STRING))))")
            .as("text"))
      } else graft.sources.Tables.documents(spark, sfDir)
    if (withDocs) docs.write.parquet(docsDir)
    if (withKnn) {
      val emb =
        if (mode == "vec")
          // deterministic pseudo-random 64-dim embeddings: cos of a
          // murmur3 hash of (id, dim) — dimensions must be
          // DECORRELATED (any arg affine in the dim index collapses
          // every hyperplane dot to A·cos(x+φ), one scalar phase ⇒
          // ~30 distinct LSH buckets and a quadratic candidate blowup)
          spark.range(200000L).select(col("id").as("vec_id"),
            expr("transform(sequence(0, 63), i -> cos(CAST(hash(id, i) AS DOUBLE)))")
              .as("embedding"))
        else graft.sources.Tables.embeddings(spark, sfDir)
      emb.write.parquet(embDir)
    }
    val nDocs = if (withDocs) spark.read.parquet(docsDir).count() else 0L
    val nEmb = if (withKnn) spark.read.parquet(embDir).count() else 0L
    // id offsets derive from the corpus maxima, so a synthetic id can
    // never collide with a real one regardless of scale factor
    val maxDocId = if (withDocs)
      spark.read.parquet(docsDir).agg(max(col("doc_id"))).head.getLong(0) else 0L
    val maxVecId = if (withKnn)
      spark.read.parquet(embDir).agg(max(col("vec_id"))).head.getLong(0) else 0L

    // synthetic append batches: deltaPct% new rows each, fresh ids,
    // perturbed text (a token prefix keeps them near their source —
    // they become near-dups of corpus docs, the realistic crawl
    // shape); embeddings reuse corpus vectors (exact semantic dups —
    // guaranteed dirty-set work for the kNN delta).  dup mode spreads
    // ONE copy per group so no group's shingle DF approaches the cap.
    val nDeltaDocs = math.max(1L, math.max(nDocs, 1L) * deltaPct / 100)
    val nDeltaEmb = if (withKnn) math.max(1L, nEmb * deltaPct / 100) else 0L
    def stageDocs(k: Int): String = {
      val stage = s"$work/stage_docs$k"
      val src = if (mode == "dup")
        spark.read.parquet(docsDir).filter(col("doc_id") % 100 === 0)
      else spark.read.parquet(docsDir)
      src.orderBy(col("doc_id")).limit(nDeltaDocs.toInt)
        .select((col("doc_id") + (maxDocId + 1) * k).as("doc_id") +:
          concat(lit(s"appended batch $k doc "), col("text")).as("text") +:
          src.columns.filterNot(c => c == "doc_id" || c == "text").map(col).toSeq: _*)
        .write.parquet(stage)
      stage
    }
    def stageEmb(k: Int): String = {
      val stage = s"$work/stage_emb$k"
      spark.read.parquet(embDir).orderBy(col("vec_id")).limit(nDeltaEmb.toInt)
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
      (if (withDocs) timed(buildPairs()) else 0.0,
        if (withDocs) timed(buildComps()) else 0.0,
        if (withKnn) timed(buildKnn()) else 0.0)

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
      if (withDocs) appendBatch(stageDocs(k), docsDir)
      if (withKnn) appendBatch(stageEmb(k), embDir)
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
    val knnBlock = if (withKnn)
      block("knn", fbK, deltaSecs.map(_._3).toSeq, fullSecs.map(_._3).toSeq) + "," else ""
    val json =
      s"""{"metric":"delta_materialize","mode":"$mode","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""corpus_docs":$nDocs,"corpus_vecs":$nEmb,"delta_pct":$deltaPct,""" +
      s""""n_appends":$nAppends,""" +
      block("pairs", fbP, deltaSecs.map(_._1).toSeq, fullSecs.map(_._1).toSeq) + "," +
      block("comps", fbC, deltaSecs.map(_._2).toSeq, fullSecs.map(_._2).toSeq) + "," +
      knnBlock +
      s""""delta_builds":{"neardup_pairs":${taken("neardup_pairs")},""" +
      s""""neardup_comps":${taken("neardup_comps")},"knn_edges":${taken("knn_edges")}}}"""
    val outName = if (mode == "sf") "target/probe_delta_materialize.json"
      else s"target/probe_delta_materialize_$mode.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outName), json + "\n")
    spark.stop()
    println(json)
  }
}
