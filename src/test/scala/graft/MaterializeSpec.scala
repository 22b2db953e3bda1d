package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GraphOps, Pipeline}
import graft.sources.Materialize

/** Pins the materialize-once/read-many seam for suite-level shared
  * intermediates: one build per artifact per corpus snapshot, bit-exact
  * read-back, input-stat invalidation, and the round-12 claim that the
  * near-dup pair pipeline executes ONCE across all its consumer
  * queries in suite mode.
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def freshCacheDir(): String =
    java.nio.file.Files.createTempDirectory("graft_cache_spec").toString

  /** Run `body` with the session's cache root pointed at a fresh temp
    * dir, restoring the default after (suites share one session).
    */
  private def withCacheDir[A](dir: String)(body: => A): A = {
    spark.conf.set("spark.graft.cache.dir", dir)
    try body finally spark.conf.unset("spark.graft.cache.dir")
  }

  /** Engineered spec corpora are tiny parquet files whose byte ratios
    * are footer-dominated and whose pair graphs sit far below the
    * comps delta's distributed-regime bound — lift the compaction
    * fraction and drop the regime bound so the cost-based declines
    * never mask the semantics under test.
    */
  private def withAppendFraction[A](frac: String)(body: => A): A = {
    spark.conf.set("spark.graft.delta.maxAppendFraction", frac)
    spark.conf.set("spark.graft.delta.comps.minPairs", "0")
    try body finally {
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
      spark.conf.unset("spark.graft.delta.comps.minPairs")
    }
  }

  test("readOrBuild builds once, then serves every later call from the artifact") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_mat_in").toString + "/t.parquet"
    spark.range(100).select(col("id"), (col("id") * 3).as("v"))
      .write.parquet(in)
    withCacheDir(cache) {
      Materialize.resetBuildCount("spec_tiny")
      def get() = Materialize.readOrBuild(spark, "spec_tiny", Seq(in),
        Seq("ver" -> "1"))(spark.read.parquet(in).withColumn("w", col("v") + 1))
      val first = get().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val second = get().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(Materialize.buildCount("spec_tiny") === 1)
      assert(first === second)
      assert(first.length === 100 && first.head === ((0L, 0L, 1L)))
    }
  }

  test("an input refresh invalidates the signature and triggers a rebuild") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_mat_in2").toString + "/t.parquet"
    spark.range(10).write.parquet(in)
    withCacheDir(cache) {
      Materialize.resetBuildCount("spec_inval")
      def get() = Materialize.readOrBuild(spark, "spec_inval", Seq(in),
        Seq("ver" -> "1"))(spark.read.parquet(in))
      assert(get().count() === 10)
      assert(Materialize.buildCount("spec_inval") === 1)
      // refresh the input: different length ⇒ different signature even
      // if the filesystem's mtime granularity hides the rewrite
      spark.range(25).write.mode("overwrite").parquet(in)
      assert(get().count() === 25)
      assert(Materialize.buildCount("spec_inval") === 2)
      // and the refreshed artifact is itself now stable
      assert(get().count() === 25)
      assert(Materialize.buildCount("spec_inval") === 2)
    }
  }

  test("suite mode: ONE pair-pipeline execution across all five consumer queries") {
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("neardup_pairs")
      Materialize.resetBuildCount("neardup_comps")
      // the five ngram-pair consumers, as the driver's Verify/Bench
      // would run them in one session
      Dedup.dedupNgramJaccard(spark, sf).collect()
      Dedup.dedupComponents(spark, sf).collect()
      GraphOps.graphTriangles(spark, sf).collect()
      Pipeline.splitAssignGrouped(spark, sf).collect()
      Pipeline.corpusClean(spark, sf).collect()
      assert(Materialize.buildCount("neardup_pairs") === 1,
        "the shingle self-join must execute once for the whole suite")
      assert(Materialize.buildCount("neardup_comps") === 1,
        "the component contraction must execute once for the whole suite")
      // the other two shared substrates: co-purchase pairs (link_predict
      // + graph_kcore) and the kNN edge relation (knn_join +
      // knn_pagerank + knn_communities)
      Materialize.resetBuildCount("copurchase_pairs")
      Materialize.resetBuildCount("knn_edges")
      GraphOps.linkPredictParts(spark, sf).collect()
      GraphOps.graphKcore(spark, sf).collect()
      graft.operators.Similarity.knnJoinEmbeddings(spark, sf).collect()
      GraphOps.knnPagerank(spark, sf).collect()
      GraphOps.knnCommunities(spark, sf).collect()
      assert(Materialize.buildCount("copurchase_pairs") === 1,
        "the lineitem self-join must execute once for the whole suite")
      assert(Materialize.buildCount("knn_edges") === 1,
        "the LSH-bucketed kNN join must execute once for the whole suite")
      // the curation flag leaf (round 15): both funnel consumers read
      // one materialized build of the stage-1–6 flag pipeline
      Materialize.resetBuildCount("curation_flags")
      Pipeline.curationReport(spark, sf).collect()
      Pipeline.curationBySource(spark, sf).collect()
      Pipeline.deconBySource(spark, sf).collect()
      assert(Materialize.buildCount("curation_flags") === 1,
        "the stage-1–6 flag pipeline must execute once for the whole suite")
    }
  }

  test("artifact read-back is bit-identical to the inline pair pipeline") {
    val cache = freshCacheDir()
    withCacheDir(cache) {
      val fromArtifact = Dedup.nearDupPairs(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val inline = Dedup.ngramJaccardPairs(
          graft.sources.Tables.documents(spark, sf), 128)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      // exact doubles: parquet round-trips IEEE bits, so == is the
      // correct comparison (bit-identical is the oracle contract)
      assert(fromArtifact === inline)
      assert(fromArtifact.nonEmpty)
    }
  }

  test("consumer plans start from the artifact FileScan, not the shingle pipeline") {
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Dedup.nearDupPairs(spark, sf).collect() // ensure built
      val p = Dedup.dedupNgramJaccard(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("neardup_pairs"), p.linesIterator.take(10).mkString("\n"))
      // no shingle explode anywhere in the consumer plan
      assert(!p.contains("Generate"), "consumer must not replay the shingle pipeline")
      val pt = GraphOps.graphTriangles(spark, sf)
        .queryExecution.analyzed.toString
      assert(!pt.contains("shingle"), "triangles must read the pair artifact")
    }
  }

  test("gc reaps only artifacts older than the age bound; a reaped artifact rebuilds") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_mat_gc").toString + "/t.parquet"
    spark.range(7).write.parquet(in)
    withCacheDir(cache) {
      Materialize.resetBuildCount("spec_gc")
      def get() = Materialize.readOrBuild(spark, "spec_gc", Seq(in),
        Seq("ver" -> "1"))(spark.read.parquet(in))
      assert(get().count() === 7)
      // young artifact survives a 1-hour bound
      assert(Materialize.gc(spark, 3600 * 1000L) === Nil)
      assert(get().count() === 7)
      assert(Materialize.buildCount("spec_gc") === 1)
      // an age-0 bound reaps it; the next read rebuilds transparently
      val reaped = Materialize.gc(spark, -1L)
      assert(reaped.exists(_.startsWith("spec_gc-")), reaped.toString)
      assert(get().count() === 7)
      assert(Materialize.buildCount("spec_gc") === 2)
    }
  }

  test("readOrBuildDelta: append takes the delta path, any other change or a decline falls back to full") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_mat_delta").toString + "/t.parquet"
    spark.range(10).write.parquet(in)
    withCacheDir(cache) {
      Materialize.resetBuildCount("spec_delta")
      var deltaCalls = 0
      def get() = Materialize.readOrBuildDelta(spark, "spec_delta", Seq(in),
        Seq("ver" -> "1")) { spark.read.parquet(in) } { (prev, _, deltaFiles) =>
        deltaCalls += 1
        prev.unionByName(spark.read.parquet(deltaFiles: _*))
      }
      assert(get().count() === 10)
      assert(Materialize.deltaBuildCount("spec_delta") === 0, "first build is full")
      // append: new part files land next to the old ones, old stats unchanged
      val stage = java.nio.file.Files.createTempDirectory("graft_mat_stage").toString + "/p"
      spark.range(100, 105).write.parquet(stage)
      appendParts(stage, in)
      assert(get().collect().map(_.getLong(0)).sorted === ((0L to 9L) ++ (100L to 104L)).toArray)
      assert(Materialize.deltaBuildCount("spec_delta") === 1, "append must take the delta path")
      assert(deltaCalls === 1)
      // an overwrite is NOT an append: full rebuild, no delta call
      spark.range(7).write.mode("overwrite").parquet(in)
      assert(get().count() === 7)
      assert(Materialize.deltaBuildCount("spec_delta") === 1)
      assert(deltaCalls === 1)
      // a declining delta builder (returns null) falls back to full
      val stage2 = java.nio.file.Files.createTempDirectory("graft_mat_stage2").toString + "/p"
      spark.range(200, 203).write.parquet(stage2)
      appendParts(stage2, in)
      val declined = Materialize.readOrBuildDelta(spark, "spec_delta", Seq(in),
        Seq("ver" -> "1")) { spark.read.parquet(in) } { (_, _, _) => null }
      assert(declined.count() === 10)
      assert(Materialize.deltaBuildCount("spec_delta") === 1, "a declined delta is a full build")
    }
  }

  /** Move every data part file from `stage` into the live dataset dir
    * under a unique name — a filesystem-level append, old files
    * untouched (the daily-crawl shape).
    */
  private def appendParts(stage: String, dest: String): Unit = {
    val dst = new java.io.File(dest)
    new java.io.File(stage).listFiles().filter(f =>
      f.getName.startsWith("part-")).zipWithIndex.foreach { case (f, i) =>
      val to = new java.io.File(dst, s"part-append-${System.nanoTime()}-$i-${f.getName.stripPrefix("part-")}")
      assert(f.renameTo(to), s"append move failed for $f")
    }
  }

  test("neardup delta-merge is value-identical to a full rebuild, including a cap-crossing append") {
    // corpus A: an exact near-dup pair (1,2), a doc that will pair
    // cross-snapshot (3), 120 docs sharing the hot shingle "zz qq ww"
    // (df 122 with X/Y — under the 128 cap), and the X/Y pair (130,131)
    // engineered at J = 4/5 = 0.8 WITH the hot shingle and 3/4 = 0.75
    // without it — the pair that must DIE when the append pushes the
    // shingle over the cap and the dirty-doc recompute runs
    def doc(id: Long, text: String) = (id, text)
    val a = Seq(
      doc(1, "alpha beta gamma delta epsilon"),
      doc(2, "alpha beta gamma delta epsilon"),
      doc(3, "one two three four five six"),
      doc(130, "zz qq ww t1 t2 t3"),
      doc(131, "zz qq ww t1 t2 t3 t4")) ++
      (10L to 129L).map(i => doc(i, s"zz qq ww u$i v$i w$i"))
    val b = Seq(
      doc(201, "one two three four five six"),
      doc(202, "omega psi chi phi upsilon"),
      doc(203, "omega psi chi phi upsilon")) ++
      (210L to 229L).map(i => doc(i, s"zz qq ww b$i c$i d$i"))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_corpus").toString
    a.toDF("doc_id", "text").repartition(2).write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_delta_stage").toString + "/p"
    b.toDF("doc_id", "text").repartition(2).write.parquet(stage)

    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))

    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)

    val cacheDelta = freshCacheDir()
    val (before, compsBefore) = withAppendFraction("100") { withCacheDir(cacheDelta) {
      Materialize.resetBuildCount("neardup_pairs")
      Materialize.resetBuildCount("neardup_index")
      Materialize.resetBuildCount("neardup_df")
      Materialize.resetBuildCount("neardup_comps")
      (pairsOf(Dedup.nearDupPairs(spark, dir)),
        labelsOf(Dedup.nearDupComponentLabels(spark, dir)))
    } }
    assert(before.map(t => (t._1, t._2)).contains((1L, 2L)))
    assert(before.map(t => (t._1, t._2)).contains((130L, 131L)), "J=0.8 pair exists pre-append")
    assert(!before.map(t => (t._1, t._2)).contains((3L, 201L)))
    assert(compsBefore.contains((131L, 130L)), "pre-append comp for the doomed pair")

    appendParts(stage, s"$dir/documents.parquet")
    val (viaDelta, compsDelta) = withAppendFraction("100") { withCacheDir(cacheDelta) {
      (pairsOf(Dedup.nearDupPairs(spark, dir)),
        labelsOf(Dedup.nearDupComponentLabels(spark, dir)))
    } }
    assert(Materialize.deltaBuildCount("neardup_pairs") === 1,
      "the append must maintain the pair artifact incrementally")
    assert(Materialize.buildCount("neardup_index") === 1,
      "the base index must NOT be rebuilt on append — the composed " +
        "snapshot index is lazy (no corpus-sized artifact rewrite)")
    // the cap-crossing append KILLS pair (130,131): a died edge can
    // split a component, so the comps delta must DECLINE to the full
    // solver (the merge-only fast path would be wrong here)
    assert(Materialize.deltaBuildCount("neardup_comps") === 0,
      "a removed pair must decline the comps delta to the full solver")
    assert(Materialize.buildCount("neardup_comps") === 2)
    val (viaFull, compsFull) = withCacheDir(freshCacheDir()) {
      (pairsOf(Dedup.nearDupPairs(spark, dir)),
        labelsOf(Dedup.nearDupComponentLabels(spark, dir)))
    }
    // VALUE-identical: same pairs, bit-equal jaccard doubles
    assert(viaDelta === viaFull)
    assert(compsDelta === compsFull, "declined comps delta still matches full")
    assert(!compsDelta.contains((131L, 130L)), "the split component's label is gone")
    val ids = viaDelta.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)), "clean-clean pair persists bit-identically")
    assert(ids.contains((3L, 201L)), "cross-snapshot pair appears")
    assert(ids.contains((202L, 203L)), "delta-internal pair appears")
    assert(!ids.contains((130L, 131L)),
      "the cap-crossing append must kill the J=0.8-with-hot-shingle pair")
  }

  test("an oversized append declines the delta and compacts to a new base") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_oversize").toString
    (1L to 40L).map(i => (i, s"base doc body x$i y$i z$i"))
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_delta_oversize_stage").toString + "/p"
    // the "append" is ~10x the base — past any sane crossover, the
    // delta path must decline and the full rebuild becomes the new base
    (1001L to 1400L).map(i => (i, s"appended doc body with much longer text a$i b$i c$i d$i e$i f$i"))
      .toDF("doc_id", "text").repartition(1).write.parquet(stage)
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("neardup_pairs")
      Dedup.nearDupPairs(spark, dir).collect()
      appendParts(stage, s"$dir/documents.parquet")
      Dedup.nearDupPairs(spark, dir).collect()
      assert(Materialize.deltaBuildCount("neardup_pairs") === 0,
        "an oversized append must decline the delta (cost-based compaction)")
      assert(Materialize.buildCount("neardup_pairs") === 2)
    }
  }

  test("comps delta: a component-merging append relabels only the merged components") {
    import spark.implicits._
    // Merging two existing components under append is only reachable
    // through the DIRTY path — at J ≥ 0.8 a single bridge doc cannot
    // be near-dup to two components that are not near-dups of each
    // other.  Engineered here via the DF cap: docs 1/2 end in the hot
    // shingle "p6 h1 h2" (base df = 2 + 126 fillers = 128 = cap,
    // kept); docs 5/6 are the same p-core WITHOUT the hot tail.
    // Pre-append J(1,5) = 4/(6+4−4) = 2/3 < 0.8; the appended batch
    // carries 20 more hot-shingle docs, pushing df to 148 > cap — the
    // hot shingle leaves the index, doc 1's size drops to 5, and
    // J(1,5) RISES to 4/(5+4−4) = 0.8: pairs {1,5},{1,6},{2,5},{2,6}
    // are ADDED (none die — (1,2) and (5,6) stay J=1), merging the
    // two components.  Exactly the merge-only append the comps delta
    // fast path exists for.
    val core = "p1 p2 p3 p4 p5 p6"
    val a = Seq(
      (1L, s"$core h1 h2"), (2L, s"$core h1 h2"),
      (5L, core), (6L, core)) ++
      (100L to 225L).map(i => (i, s"p6 h1 h2 u$i v$i w$i"))
    val b = (300L to 319L).map(i => (i, s"p6 h1 h2 aa$i bb$i cc$i")) ++
      Seq((400L, "omega psi chi phi upsilon tau sigma"),
        (401L, "omega psi chi phi upsilon tau sigma"))
    val dir = java.nio.file.Files.createTempDirectory("graft_comps_merge").toString
    a.toDF("doc_id", "text").repartition(2).write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_comps_merge_stage").toString + "/p"
    b.toDF("doc_id", "text").repartition(1).write.parquet(stage)
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val cache = freshCacheDir()
    val before = withAppendFraction("100") { withCacheDir(cache) {
      Materialize.resetBuildCount("neardup_pairs")
      Materialize.resetBuildCount("neardup_comps")
      labelsOf(Dedup.nearDupComponentLabels(spark, dir))
    } }
    assert(before.toSet === Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)),
      s"engineered base components wrong: ${before.toSeq}")
    appendParts(stage, s"$dir/documents.parquet")
    val viaDelta = withAppendFraction("100") { withCacheDir(cache) {
      labelsOf(Dedup.nearDupComponentLabels(spark, dir))
    } }
    assert(Materialize.deltaBuildCount("neardup_comps") === 1,
      "a merge-only append must take the comps delta path")
    val viaFull = withCacheDir(freshCacheDir()) {
      labelsOf(Dedup.nearDupComponentLabels(spark, dir))
    }
    assert(viaDelta === viaFull, "delta comps must be value-identical to the full solver")
    val m = viaDelta.toMap
    // {1,2} and {5,6} merged, rooted at the global minimum member id
    assert(Seq(1L, 2L, 5L, 6L).map(m) === Seq(1L, 1L, 1L, 1L))
    assert(m(400L) === 400L && m(401L) === 400L,
      "delta-internal component labels at its min id")
    assert(!m.contains(100L), "docs with no pairs stay unlabeled (solver contract)")
  }

  test("copurchase delta: an appended batch merges additively, value-identical to full") {
    import spark.implicits._
    // base: order 10 = {1,2,3}, order 20 = {4,5}, order 30 = {6}
    val base = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L), (30L, 6L))
    // append exercises all three delta terms: a NEW order 40 = {1,4,7}
    // (within-pairs), a new item 9 on EXISTING order 10 (cross pairs
    // vs {1,2,3}), a REPLAYED line (10,2) that must not double-count,
    // and order 50 = {4,5} repeating a BASE pair so the count MERGE
    // (1 + 1 = 2) is exercised, not just the union
    val app = Seq((40L, 1L), (40L, 4L), (40L, 7L), (10L, 9L), (10L, 2L),
      (50L, 4L), (50L, 5L))
    val dir = java.nio.file.Files.createTempDirectory("graft_cop").toString
    base.toDF("l_orderkey", "l_partkey").repartition(2)
      .write.parquet(s"$dir/lineitem.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_cop_stage").toString + "/p"
    app.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(stage)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).sortBy(_._1)
    val cache = freshCacheDir()
    val before = withAppendFraction("100") { withCacheDir(cache) {
      Materialize.resetBuildCount("copurchase_pairs")
      pairsOf(GraphOps.coPurchasePairs(spark, dir))
    } }
    assert(before.toMap === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (2L, 3L) -> 1L, (4L, 5L) -> 1L))
    appendParts(stage, s"$dir/lineitem.parquet")
    val viaDelta = withAppendFraction("100") { withCacheDir(cache) {
      pairsOf(GraphOps.coPurchasePairs(spark, dir))
    } }
    assert(Materialize.deltaBuildCount("copurchase_pairs") === 1,
      "a pure append must take the copurchase delta path")
    val viaFull = withCacheDir(freshCacheDir()) {
      pairsOf(GraphOps.coPurchasePairs(spark, dir))
    }
    assert(viaDelta === viaFull,
      "delta-merged pair counts must be value-identical to the full self-join")
    val m = viaDelta.toMap
    assert(m.size === 10)
    assert(m((4L, 5L)) === 2L, "base pair repeated by an appended order must SUM")
    assert(m((1L, 2L)) === 1L, "a replayed (ok, pk) line must not double-count")
    assert(Seq((1L, 9L), (2L, 9L), (3L, 9L)).forall(m(_) === 1L),
      "an item appended to an EXISTING order must form cross pairs")
    assert(Seq((1L, 4L), (1L, 7L), (4L, 7L)).forall(m(_) === 1L))
    // a SECOND append composes delta-on-delta: the prior artifact is
    // itself delta-built, prevFiles = base + append-1, and an item
    // landing on append-1's order 40 must cross-pair against ITS lines
    val app2 = Seq((40L, 8L), (60L, 2L), (60L, 3L))
    val stage2 = java.nio.file.Files.createTempDirectory("graft_cop_stage2").toString + "/p"
    app2.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(stage2)
    appendParts(stage2, s"$dir/lineitem.parquet")
    val viaDelta2 = withAppendFraction("100") { withCacheDir(cache) {
      pairsOf(GraphOps.coPurchasePairs(spark, dir))
    } }
    assert(Materialize.deltaBuildCount("copurchase_pairs") === 2)
    val viaFull2 = withCacheDir(freshCacheDir()) {
      pairsOf(GraphOps.coPurchasePairs(spark, dir))
    }
    assert(viaDelta2 === viaFull2, "delta-on-delta must equal the full self-join")
    val m2 = viaDelta2.toMap
    assert(Seq((1L, 8L), (4L, 8L), (7L, 8L)).forall(m2(_) === 1L),
      "an item appended onto a PREVIOUS append's order must cross-pair against its lines")
    assert(m2((2L, 3L)) === 2L, "order 60 repeats a base pair - support must sum")
  }

  test("knn_edges delta: append recomputes only dirty lids, value-identical to full") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 300L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_delta").toString
    base.toDF("vec_id", "embedding").repartition(2).write.parquet(s"$dir/embeddings.parquet")
    // append: vec 9001 is an exact copy of vec 42 (cos = 1 — must
    // enter 42's top-5, so 42 is provably dirty), plus fresh vectors
    val emb42 = base(41)._2
    val app = Seq((9001L, emb42)) ++ (9002L to 9010L).map(i => (i, vec()))
    val stage = java.nio.file.Files.createTempDirectory("graft_knn_delta_stage").toString + "/p"
    app.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    def edgesOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    val cache = freshCacheDir()
    val before = withCacheDir(cache) {
      Materialize.resetBuildCount("knn_edges")
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(before.nonEmpty)
    appendParts(stage, s"$dir/embeddings.parquet")
    val viaDelta = withCacheDir(cache) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(Materialize.deltaBuildCount("knn_edges") === 1,
      "the append must maintain the kNN edge artifact incrementally")
    val viaFull = withCacheDir(freshCacheDir()) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(viaDelta === viaFull, "delta kNN edges must be value-identical to a full rebuild")
    // the engineered exact-duplicate is rank-1 for lid 42 post-append
    assert(viaDelta.filter(_._1 == 42L).take(1).map(t => (t._3, t._4)).toSeq
      === Seq((9001L, 1.0)), "new exact-dup neighbor must displace 42's old top-1")
    // and 9001's own row exists (new lids are computed, not carried)
    assert(viaDelta.exists(_._1 == 9001L))
  }

  test("knn_edges delta: an over-budget batch still deltas (un-hinted join), value-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 200L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_budget").toString
    base.toDF("vec_id", "embedding").repartition(2).write.parquet(s"$dir/embeddings.parquet")
    val app = (9001L to 9008L).map(i => (i, vec()))
    val stage = java.nio.file.Files.createTempDirectory("graft_knn_budget_stage").toString + "/p"
    app.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    def edgesOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("knn_edges")
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    appendParts(stage, s"$dir/embeddings.parquet")
    // budget 0: every batch is "oversized" — the broadcast hint must
    // drop, but the delta itself still runs and stays exact (AQE picks
    // the join strategy; the decline is the hint's, not the delta's)
    spark.conf.set("spark.graft.delta.knnBroadcastBytes", "0")
    val viaDelta = try withCacheDir(cache) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    } finally spark.conf.unset("spark.graft.delta.knnBroadcastBytes")
    assert(Materialize.deltaBuildCount("knn_edges") === 1,
      "the over-budget batch must still take the delta path")
    val viaFull = withCacheDir(freshCacheDir()) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(viaDelta === viaFull,
      "un-hinted delta kNN edges must be value-identical to a full rebuild")
  }

  test("knn_edges delete: takedown rescores only lids that lost a neighbor, value-identical to full") {
    import spark.implicits._
    val rnd = new scala.util.Random(5151)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 300L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_del").toString
    base.toDF("vec_id", "embedding").repartition(1).write.parquet(s"$dir/embeddings.parquet")
    // the to-be-removed file: an exact copy of vec 42 (rank-1 in 42's
    // top-5, so 42 provably loses a neighbor) plus fresh vectors —
    // staged in BEFORE the first build, so it is part of the base
    val emb42 = base(41)._2
    val doomed = Seq((9001L, emb42)) ++ (9002L to 9020L).map(i => (i, vec()))
    val stage = java.nio.file.Files.createTempDirectory("graft_knn_del_stage").toString + "/p"
    doomed.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    appendParts(stage, s"$dir/embeddings.parquet")
    def edgesOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    val cache = freshCacheDir()
    val before = withCacheDir(cache) {
      Materialize.resetBuildCount("knn_edges")
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(before.filter(_._1 == 42L).take(1).map(_._3).toSeq === Seq(9001L),
      "pre-delete, the planted duplicate must be 42's top-1")
    // the takedown: remove the staged part file (a GDPR-style file-
    // level delete — survivors untouched)
    new java.io.File(s"$dir/embeddings.parquet").listFiles()
      .filter(_.getName.startsWith("part-append-"))
      .foreach(f => assert(f.delete(), s"could not remove $f"))
    val viaDelete = withCacheDir(cache) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(Materialize.deleteBuildCount("knn_edges") === 1,
      "the takedown must maintain the kNN edge artifact incrementally")
    val viaFull = withCacheDir(freshCacheDir()) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(viaDelete === viaFull,
      "delete-maintained kNN edges must be value-identical to a full rebuild")
    // no removed id survives on either side of any edge, and 42's
    // top-k REFILLED (k rows again, new top-1)
    assert(viaDelete.forall(t => t._1 < 9000L && t._3 < 9000L))
    val e42 = viaDelete.filter(_._1 == 42L)
    assert(e42.length === 5 && e42.head._3 != 9001L,
      "42 must refill its top-5 from the surviving candidate set")
  }

  test("knn_edges delete: an oversized takedown declines to a compacting full rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(5252)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_del_big").toString
    (1L to 150L).map(i => (i, vec())).toDF("vec_id", "embedding")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_knn_del_big_stage").toString + "/p"
    (201L to 350L).map(i => (i, vec())).toDF("vec_id", "embedding")
      .repartition(1).write.parquet(stage)
    appendParts(stage, s"$dir/embeddings.parquet")
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("knn_edges")
      graft.operators.Similarity.knnJoinEmbeddings(spark, dir).count()
    }
    new java.io.File(s"$dir/embeddings.parquet").listFiles()
      .filter(_.getName.startsWith("part-append-"))
      .foreach(f => assert(f.delete(), s"could not remove $f"))
    // ~half the corpus bytes removed — far past the compaction
    // fraction: the delete path must DECLINE and the full rebuild
    // compacts (a fresh base for later maintenance)
    val n = withCacheDir(cache) {
      graft.operators.Similarity.knnJoinEmbeddings(spark, dir).count()
    }
    assert(n > 0)
    assert(Materialize.deleteBuildCount("knn_edges") === 0,
      "an oversized takedown must decline to the full path")
    assert(Materialize.buildCount("knn_edges") === 2)
  }

  test("neardup delete: witness removal, cap re-admission, clean carry — value-identical to full") {
    import spark.implicits._
    // a/b: 11 words, 9 shingles each, 8 shared — one shared shingle is
    // the hot "w1 w2 w3" (df 131 > cap 128 pre-delete, so it is capped
    // OUT and j(a,b) = 7/9 < 0.8: NO pair).  Removing 3 of its hosts
    // drops df to 128: re-admission pushes j(a,b) to 8/10 = 0.8 — the
    // pair APPEARS under a takedown.  c/d: identical docs (pair at
    // j=1.0) with d removed — the pair whose only witness is removed,
    // dropped with NO recompute (c stays clean).  e/f: identical
    // surviving docs — their pair must carry bit-identically.
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val a = (1L, s"$w10 enda")
    val b = (2L, s"$w10 endb")
    val c = (3L, "m1 m2 m3 m4")
    val d = (4L, "m1 m2 m3 m4")
    val e = (5L, "n1 n2 n3 n4 n5")
    val f = (6L, "n1 n2 n3 n4 n5")
    def filler(i: Int) = (100L + i, s"w1 w2 w3 u$i")
    val keepDocs = Seq(a, b, c, e, f) ++ (1 to 126).map(filler)
    val doomedDocs = Seq(d) ++ (127 to 129).map(filler)
    def toDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_del").toString
    toDocs(keepDocs).repartition(1).write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_nd_del_stage").toString + "/p"
    toDocs(doomedDocs).repartition(1).write.parquet(stage)
    appendParts(stage, s"$dir/documents.parquet")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    // tiny engineered files are footer-dominated, so the takedown's
    // byte fraction would trip the compaction decline — lift it so the
    // SEMANTICS are what this test exercises
    withAppendFraction("0.95") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("neardup_pairs")
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(before.map(t => (t._1, t._2)).toSet === Set((3L, 4L), (5L, 6L)),
        s"pre-delete pairs: witness pair + carry pair only, got ${before.toSeq}")
      new java.io.File(s"$dir/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-append-"))
        .foreach(x => assert(x.delete(), s"could not remove $x"))
      val viaDelete = withCacheDir(cache) {
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(Materialize.deleteBuildCount("neardup_pairs") === 1,
        "the takedown must maintain the pair artifact incrementally")
      val viaFull = withCacheDir(freshCacheDir()) {
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(viaDelete === viaFull,
        "delete-maintained pairs must be value-identical to a full rebuild")
      assert(viaDelete.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (5L, 6L)),
        s"post-delete: (3,4) lost its witness, (1,2) appeared via cap re-admission, got ${viaDelete.toSeq}")
      assert(viaDelete.filter(_._1 == 1L).head._3 === 0.8,
        "the re-admitted shingle puts j(a,b) exactly at the threshold")
      // the carried pair is the SAME double, not a recompute artifact
      assert(viaDelete.filter(_._1 == 5L).head._3 === before.filter(_._1 == 5L).head._3)
    }
  }

  test("copurchase delete: takedown subtracts touched orders' pairs through the line-chunk LSM, value-identical to full at every step") {
    import spark.implicits._
    // file A (the dir write): order 10 = {1,2}, order 20 = {4,5}
    val keep = Seq((10L, 1L), (10L, 2L), (20L, 4L), (20L, 5L))
    // file D (staged BEFORE the build, so it is part of the base):
    // (10,3) — order 10 loses ONE of several lines on takedown;
    // order 50 = {4,5} — the (4,5) support must decrement 2→1;
    // order 60 = {6,7} — a pair dropping to zero; and a REPLAYED
    // (20,4) whose (ok,pk) also survives in file A — must subtract
    // nothing
    val doomedD = Seq((10L, 3L), (50L, 4L), (50L, 5L), (60L, 6L), (60L, 7L),
      (20L, 4L))
    // file E (appended AFTER the build — the delta path writes its own
    // line chunk): order 70 = {1,2} repeats a base pair, and (10,8)
    // cross-pairs onto order 10
    val appE = Seq((70L, 1L), (70L, 2L), (10L, 8L))
    val dir = java.nio.file.Files.createTempDirectory("graft_cop_del").toString
    val li = s"$dir/lineitem.parquet"
    keep.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(li)
    def stageIn(rows: Seq[(Long, Long)], tag: String): String = {
      val st = java.nio.file.Files.createTempDirectory(s"graft_cop_del_$tag").toString + "/p"
      rows.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(st)
      val beforeNames = new java.io.File(li).listFiles().map(_.getName).toSet
      appendParts(st, li)
      val added = new java.io.File(li).listFiles().map(_.getName).filterNot(beforeNames)
      assert(added.length === 1)
      added.head
    }
    val fileD = stageIn(doomedD, "d")
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).sortBy(_._1)
    def rm(name: String): Unit = {
      val f = new java.io.File(li, name)
      assert(f.delete(), s"could not remove $f")
    }
    withAppendFraction("100") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("copurchase_pairs")
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(before.toMap === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
        (4L, 5L) -> 2L, (6L, 7L) -> 1L))
      val fileE = stageIn(appE, "e")
      val afterApp = withCacheDir(cache) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(Materialize.deltaBuildCount("copurchase_pairs") === 1)
      assert(afterApp.toMap === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
        (4L, 5L) -> 2L, (6L, 7L) -> 1L, (1L, 8L) -> 1L, (2L, 8L) -> 1L,
        (3L, 8L) -> 1L))
      // takedown 1: remove base file D — lines recovered from the
      // FULL build's chunk; survivors include the appended file E
      rm(fileD)
      val viaDelete = withCacheDir(cache) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(Materialize.deleteBuildCount("copurchase_pairs") === 1,
        "the takedown must maintain the co-purchase artifact incrementally")
      val viaFull = withCacheDir(freshCacheDir()) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(viaDelete === viaFull,
        "delete-maintained co-purchase pairs must be value-identical to a full rebuild")
      assert(viaDelete.toMap === Map((1L, 2L) -> 2L, (4L, 5L) -> 1L,
        (1L, 8L) -> 1L, (2L, 8L) -> 1L),
        "order 10 keeps its surviving pairs, (4,5) decrements 2→1, (6,7) hits zero, the replayed (20,4) subtracts nothing")
      // takedown 2: remove the APPENDED file E — the original full
      // chunk is now only PARTIALLY valid (file D left the snapshot),
      // and E's lines come from the delta's own chunk: sequential
      // takedowns stay incremental purely on readAllWithin's
      // partial-validity semantics, no refresh chunk needed
      rm(fileE)
      val viaDelete2 = withCacheDir(cache) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(Materialize.deleteBuildCount("copurchase_pairs") === 2,
        "a second sequential takedown must stay incremental")
      val viaFull2 = withCacheDir(freshCacheDir()) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(viaDelete2 === viaFull2)
      assert(viaDelete2.toMap === Map((1L, 2L) -> 1L, (4L, 5L) -> 1L))
    }
  }

  test("copurchase delete: oversized takedown and missing chunk coverage both decline to a compacting full rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cop_del_big").toString
    val li = s"$dir/lineitem.parquet"
    (1L to 200L).map(i => (i / 4, i)).toDF("l_orderkey", "l_partkey")
      .repartition(1).write.parquet(li)
    val origFile = new java.io.File(li).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).head
    val st = java.nio.file.Files.createTempDirectory("graft_cop_del_big_s").toString + "/p"
    (1000L to 1200L).map(i => (i / 4, i)).toDF("l_orderkey", "l_partkey")
      .repartition(1).write.parquet(st)
    appendParts(st, li)
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("copurchase_pairs")
      GraphOps.coPurchasePairs(spark, dir).count()
    }
    // ~half the corpus bytes removed — past the compaction fraction
    new java.io.File(li).listFiles()
      .filter(_.getName.startsWith("part-append-"))
      .foreach(f => assert(f.delete(), s"could not remove $f"))
    withCacheDir(cache) { GraphOps.coPurchasePairs(spark, dir).count() }
    assert(Materialize.deleteBuildCount("copurchase_pairs") === 0,
      "an oversized takedown must decline to the full path")
    assert(Materialize.buildCount("copurchase_pairs") === 2)
    // chunk-coverage decline: reap every line chunk (gc/purge may
    // legitimately have done so), stage + remove another slice — the
    // delete path must decline instead of inventing the removed lines
    val st2 = java.nio.file.Files.createTempDirectory("graft_cop_del_big_s2").toString + "/p"
    (2000L to 2010L).map(i => (i / 4, i)).toDF("l_orderkey", "l_partkey")
      .repartition(1).write.parquet(st2)
    appendParts(st2, li)
    withAppendFraction("100") {
      withCacheDir(cache) { GraphOps.coPurchasePairs(spark, dir).count() }
    }
    new java.io.File(cache).listFiles()
      .filter(_.getName.startsWith("cop_lines-"))
      .foreach { d =>
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
        }
        rmTree(d)
      }
    // remove the ORIGINAL base file: the surviving snapshot has never
    // been built (removing the fresh append would just cache-hit the
    // pre-append artifact — the emergent cheapest-prior shortcut)
    assert(new java.io.File(li, origFile).delete())
    withAppendFraction("100") {
      withCacheDir(cache) { GraphOps.coPurchasePairs(spark, dir).count() }
    }
    assert(Materialize.deleteBuildCount("copurchase_pairs") === 0,
      "a takedown with no chunk coverage must decline to the full path")
  }

  test("maintained artifacts: a mixed add+remove change composes remove∘delta, declining to full if either leg declines") {
    import spark.implicits._
    val cache = freshCacheDir()
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed").toString + "/t.parquet"
    spark.range(10).repartition(1).write.parquet(dir)
    def stageIn(from: Long, until: Long): Unit = {
      val st = java.nio.file.Files.createTempDirectory("graft_mixed_s").toString + "/p"
      spark.range(from, until).repartition(1).write.parquet(st)
      appendParts(st, dir)
    }
    def rmAppended(): Unit = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-append-"))
      .foreach(x => assert(x.delete()))
    stageIn(10, 20)
    var deltaCalled = 0
    var removeCalled = 0
    var declineRemove = false
    var declineDelta = false
    def get(): Set[Long] = withCacheDir(cache) {
      Materialize.readOrBuildMaintained(spark, "spec_mixed", Seq(dir),
        Seq("ver" -> "1"))(spark.read.parquet(dir)) { (prev, _, appended) =>
        deltaCalled += 1
        if (declineDelta) null
        else prev.unionByName(spark.read.parquet(appended: _*))
      } { (_, prevStats, removed) =>
        removeCalled += 1
        if (declineRemove) null
        else spark.read.parquet((prevStats.keySet -- removed).toSeq.sorted: _*)
      }.as[Long].collect().toSet
    }
    Materialize.resetBuildCount("spec_mixed")
    assert(get() === (0L until 20L).toSet)
    assert(deltaCalled === 0 && removeCalled === 0)
    // mixed 1: remove the appended file AND add a different one — the
    // change routes as remove∘delta over the unpublished intermediate
    rmAppended()
    stageIn(50, 55)
    assert(get() === ((0L until 10L) ++ (50L until 55L)).toSet,
      "the composed remove∘delta result must equal full over the current snapshot")
    assert(removeCalled === 1 && deltaCalled === 1,
      "a mixed change must invoke BOTH legs, remove first")
    assert(Materialize.deltaBuildCount("spec_mixed") === 1 &&
      Materialize.deleteBuildCount("spec_mixed") === 1,
      "the mixed composition attributes one delete + one delta build")
    // mixed 2: the remove leg declines — the delta leg must not run
    // and the full path takes over, with no maintenance counters
    declineRemove = true
    rmAppended()
    stageIn(70, 73)
    assert(get() === ((0L until 10L) ++ (70L until 73L)).toSet)
    assert(removeCalled === 2 && deltaCalled === 1,
      "a declined remove must short-circuit the delta leg")
    assert(Materialize.deltaBuildCount("spec_mixed") === 1 &&
      Materialize.deleteBuildCount("spec_mixed") === 1,
      "a declined composition must not count as maintenance builds")
    // mixed 3: remove succeeds but the delta leg declines — still full
    declineRemove = false
    declineDelta = true
    rmAppended()
    stageIn(80, 84)
    assert(get() === ((0L until 10L) ++ (80L until 84L)).toSet)
    assert(removeCalled === 3 && deltaCalled === 2)
    assert(Materialize.deltaBuildCount("spec_mixed") === 1 &&
      Materialize.deleteBuildCount("spec_mixed") === 1)
    // pure delete still routes to the remove leg alone
    declineDelta = false
    rmAppended()
    assert(get() === (0L until 10L).toSet)
    assert(removeCalled === 4 && deltaCalled === 2)
    assert(Materialize.deleteBuildCount("spec_mixed") === 2 &&
      Materialize.deltaBuildCount("spec_mixed") === 1)
  }

  test("copurchase mixed: a same-epoch crawl+takedown composes remove∘delta, value-identical to full") {
    import spark.implicits._
    val keep = Seq((10L, 1L), (10L, 2L), (20L, 4L), (20L, 5L))
    val doomed = Seq((10L, 3L), (50L, 4L), (50L, 5L))
    val app = Seq((70L, 1L), (70L, 2L), (10L, 8L))
    val dir = java.nio.file.Files.createTempDirectory("graft_cop_mixed").toString
    val li = s"$dir/lineitem.parquet"
    keep.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(li)
    val st = java.nio.file.Files.createTempDirectory("graft_cop_mixed_d").toString + "/p"
    doomed.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(st)
    appendParts(st, li)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).sortBy(_._1)
    withAppendFraction("100") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("copurchase_pairs")
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(before.toMap === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
        (4L, 5L) -> 2L))
      // the mixed mutation, one snapshot step: the takedown AND the
      // day's crawl land together
      new java.io.File(li).listFiles().filter(_.getName.startsWith("part-append-"))
        .foreach(f => assert(f.delete()))
      val st2 = java.nio.file.Files.createTempDirectory("graft_cop_mixed_a").toString + "/p"
      app.toDF("l_orderkey", "l_partkey").repartition(1).write.parquet(st2)
      appendParts(st2, li)
      val viaMixed = withCacheDir(cache) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(Materialize.deltaBuildCount("copurchase_pairs") === 1 &&
        Materialize.deleteBuildCount("copurchase_pairs") === 1,
        "the mixed snapshot must cost one delete + one delta build, not a full rebuild")
      val viaFull = withCacheDir(freshCacheDir()) {
        pairsOf(GraphOps.coPurchasePairs(spark, dir))
      }
      assert(viaMixed === viaFull,
        "the composed remove∘delta must be value-identical to the full self-join")
      assert(viaMixed.toMap === Map((1L, 2L) -> 2L, (4L, 5L) -> 1L,
        (1L, 8L) -> 1L, (2L, 8L) -> 1L))
    }
  }

  test("knn_edges mixed: a same-epoch crawl+takedown composes remove∘delta, value-identical to full") {
    import spark.implicits._
    val rnd = new scala.util.Random(7272)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 300L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_mixed").toString
    base.toDF("vec_id", "embedding").repartition(1).write.parquet(s"$dir/embeddings.parquet")
    // doomed (part of the base): an exact copy of vec 42 — its removal
    // must evict 42's top-1 and refill
    val doomed = Seq((9001L, base(41)._2)) ++ (9002L to 9010L).map(i => (i, vec()))
    val stD = java.nio.file.Files.createTempDirectory("graft_knn_mixed_d").toString + "/p"
    doomed.toDF("vec_id", "embedding").repartition(1).write.parquet(stD)
    appendParts(stD, s"$dir/embeddings.parquet")
    def edgesOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    val cache = freshCacheDir()
    val before = withCacheDir(cache) {
      Materialize.resetBuildCount("knn_edges")
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(before.filter(_._1 == 42L).take(1).map(_._3).toSeq === Seq(9001L))
    // the mixed step: the takedown of the doomed file + an appended
    // batch that plants an exact copy of vec 57 (displaces 57's top-1
    // through the DELTA leg, while the REMOVE leg refills 42)
    new java.io.File(s"$dir/embeddings.parquet").listFiles()
      .filter(_.getName.startsWith("part-append-"))
      .foreach(f => assert(f.delete()))
    val app = Seq((9501L, base(56)._2)) ++ (9502L to 9510L).map(i => (i, vec()))
    val stA = java.nio.file.Files.createTempDirectory("graft_knn_mixed_a").toString + "/p"
    app.toDF("vec_id", "embedding").repartition(1).write.parquet(stA)
    appendParts(stA, s"$dir/embeddings.parquet")
    val viaMixed = withCacheDir(cache) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(Materialize.deltaBuildCount("knn_edges") === 1 &&
      Materialize.deleteBuildCount("knn_edges") === 1,
      "the mixed snapshot must cost one delete + one delta build")
    val viaFull = withCacheDir(freshCacheDir()) {
      edgesOf(graft.operators.Similarity.knnJoinEmbeddings(spark, dir))
    }
    assert(viaMixed === viaFull,
      "the composed remove∘delta kNN edges must be value-identical to a full rebuild")
    assert(viaMixed.forall(t => !(t._1 >= 9001L && t._1 <= 9010L) &&
      !(t._3 >= 9001L && t._3 <= 9010L)), "no removed id survives")
    assert(viaMixed.filter(_._1 == 42L).take(1).map(_._3).toSeq !== Seq(9001L),
      "42's evicted slot must refill from the survivors")
    assert(viaMixed.filter(_._1 == 57L).take(1).map(t => (t._3, t._4)).toSeq
      === Seq((9501L, 1.0)), "the appended exact-dup must displace 57's top-1")
    assert(viaMixed.exists(_._1 == 9501L), "appended lids get their own edges")
  }

  test("neardup mixed: a same-epoch crawl+takedown runs the FUSED single-pass builder, value-identical to full") {
    import spark.implicits._
    // base: (1,2) identical pair in the keep file; (3,4) identical
    // pair with 4 in the doomed file.  Mixed step removes 4 and
    // appends 7 (identical to 3): (1,2) carries, (3,4) dies with its
    // witness, (3,7) appears through the delta leg.
    val keepDocs = Seq((1L, "p1 p2 p3 p4 p5"), (2L, "p1 p2 p3 p4 p5"),
      (3L, "q1 q2 q3 q4 q5")) ++ (1 to 40).map(i => (100L + i, s"f$i g$i h$i k$i"))
    val doomedDocs = Seq((4L, "q1 q2 q3 q4 q5"))
    val appDocs = Seq((7L, "q1 q2 q3 q4 q5"))
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_mixed").toString
    keepDocs.toDF("doc_id", "text").repartition(1)
      .write.parquet(s"$dir/documents.parquet")
    val stD = java.nio.file.Files.createTempDirectory("graft_nd_mixed_d").toString + "/p"
    doomedDocs.toDF("doc_id", "text").repartition(1).write.parquet(stD)
    appendParts(stD, s"$dir/documents.parquet")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    withAppendFraction("100") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("neardup_pairs")
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(before.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (3L, 4L)))
      new java.io.File(s"$dir/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-append-"))
        .foreach(f => assert(f.delete()))
      val stA = java.nio.file.Files.createTempDirectory("graft_nd_mixed_a").toString + "/p"
      appDocs.toDF("doc_id", "text").repartition(1).write.parquet(stA)
      appendParts(stA, s"$dir/documents.parquet")
      val viaMixed = withCacheDir(cache) {
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(Materialize.deltaBuildCount("neardup_pairs") === 1 &&
        Materialize.deleteBuildCount("neardup_pairs") === 1,
        "the mixed snapshot must cost one delete + one delta build")
      assert(Materialize.mixedFusedBuildCount("neardup_pairs") === 1,
        "round 17: the pair substrate's mixed path must be the FUSED builder, not the composition")
      val viaFull = withCacheDir(freshCacheDir()) {
        pairsOf(Dedup.nearDupPairs(spark, dir))
      }
      assert(viaMixed === viaFull,
        "the fused mixed pairs must be value-identical to a full rebuild")
      assert(viaMixed.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (3L, 7L)),
        s"witness death + delta-appeared pair, got ${viaMixed.toSeq}")
      // the carried pair is the same double, not a recompute artifact
      assert(viaMixed.filter(_._1 == 1L).head._3 === before.filter(_._1 == 1L).head._3)
    }
  }

  test("curation_flags delta: append re-elects touched groups and maintains decon through cap flips, value-identical to full") {
    import spark.implicits._
    // base corpus, engineered so the append exercises every delta leg:
    //  - docs 10/12: identical texts (fp group; 10 wins k1) — the
    //    append adds doc 8 with the SAME text and a SMALLER id, so k1
    //    must re-elect inside the touched fp group (10 loses);
    //  - docs 14/16 and 18/20: two identical-text near-dup components
    //    — the append adds doc 15 pairing with BOTH (a doc whose text
    //    matches neither exactly... here: same text as 14 and 18 is
    //    impossible, so 15 duplicates 14's text and 17 duplicates
    //    18's, while 15/17 share their own text? keep it simple: the
    //    append adds doc 22 with 14's text so comp {14,16,22} gains a
    //    member (touched comp, k2 re-election path);
    //  - doc 2 (even): shares the 5-gram "alpha beta gamma delta
    //    epsilon" with NO base odd doc — the appended ODD doc 21
    //    carries it, flipping decon(2) false→true;
    //  - doc 4 (even) and doc 5 (odd): share the hot 5-gram
    //    "c1 c2 c3 c4 c5" also carried by 126 base fillers (df = 128,
    //    exactly AT the cap → kept; decon(4) = true) — the appended
    //    doc 30 carries it too, pushing df to 129 > cap: the shingle
    //    flips OUT and decon(4) must recompute to false.
    val hot = "c1 c2 c3 c4 c5"
    val baseDocs =
      Seq(
        (2L, "alpha beta gamma delta epsilon zeta", "a"),
        (4L, s"$hot only4", "a"),
        (5L, s"$hot only5", "a"),
        (10L, "dup one text x1 x2 x3", "a"),
        (12L, "dup one text x1 x2 x3", "a"),
        (14L, "pair a text y1 y2 y3", "b"),
        (16L, "pair a text y1 y2 y3", "b"),
        (18L, "pair b text z1 z2 z3", "b"),
        (20L, "pair b text z1 z2 z3", "b")) ++
        (1 to 126).map(i => (100L + i, s"$hot u$i", if (i % 2 == 0) "a" else "b"))
    val appDocs = Seq(
      (8L, "dup one text x1 x2 x3", "a"),    // smaller id wins k1
      (21L, "alpha beta gamma delta epsilon other", "b"), // odd: new train evidence for 2
      (22L, "pair a text y1 y2 y3", "b"),    // joins comp {14,16}
      (30L, s"$hot over", "a"))              // pushes the hot 5-gram over the cap
    val dir = java.nio.file.Files.createTempDirectory("graft_flags_delta").toString
    baseDocs.toDF("doc_id", "text", "source").repartition(1)
      .write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_flags_delta_s").toString + "/p"
    appDocs.toDF("doc_id", "text", "source").repartition(1).write.parquet(stage)
    def flagsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_toks"), r.getAs[String]("fp"), r.getAs[Long]("comp"),
        r.getAs[Boolean]("decon"), r.getAs[Boolean]("g_keep"),
        r.getAs[Boolean]("c_keep"), r.getAs[Boolean]("k1"), r.getAs[Boolean]("k2"),
        r.getAs[Boolean]("a2"), r.getAs[Boolean]("k3"), r.getAs[Boolean]("k4"),
        r.getAs[Boolean]("k5"), r.getAs[String]("h")))
      .sortBy(_._1)
    withAppendFraction("100") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("curation_flags")
        flagsOf(Pipeline.curationFlags(spark, dir))
      }
      val bBy = before.map(t => t._1 -> t).toMap
      assert(bBy(10L)._9 === true && bBy(12L)._9 === false, "pre-append k1: 10 wins its fp group")
      assert(bBy(2L)._6 === false, "pre-append decon(2): no odd partner yet")
      assert(bBy(4L)._6 === true, "pre-append decon(4): the hot 5-gram is at the cap and shared with odd 5")
      appendParts(stage, s"$dir/documents.parquet")
      val viaDelta = withCacheDir(cache) {
        flagsOf(Pipeline.curationFlags(spark, dir))
      }
      assert(Materialize.deltaBuildCount("curation_flags") === 1,
        "the append must maintain the flag leaf incrementally")
      val viaFull = withCacheDir(freshCacheDir()) {
        flagsOf(Pipeline.curationFlags(spark, dir))
      }
      assert(viaDelta === viaFull,
        "delta-maintained flags must be value-identical to a full rebuild")
      val dBy = viaDelta.map(t => t._1 -> t).toMap
      assert(dBy(8L)._9 === true && dBy(10L)._9 === false,
        "the appended smaller id must win the touched fp group's k1 election")
      assert(dBy(2L)._6 === true,
        "decon(2) must flip true: the appended odd doc brings the shared 5-gram")
      assert(dBy(4L)._6 === false,
        "decon(4) must flip false: the append pushed its only shared 5-gram over the cap")
      assert(dBy(22L)._5 === dBy(14L)._5 && dBy(22L)._5 === dBy(16L)._5,
        "the appended near-dup must join the existing component")
      // the cap-out cascades to every even filler that relied on the
      // hot 5-gram for its decon verdict — the dirty set is postings
      // of the flipped shingle, not just the doc that motivated it
      assert(bBy(102L)._6 === true && dBy(102L)._6 === false,
        "even fillers lose their decon evidence with the capped-out shingle")
      // genuinely untouched rows carry bit-identically
      Seq(18L, 20L).foreach(i => assert(dBy(i) === bBy(i), s"doc $i must carry unchanged"))
    }
  }

  /** Shared fixture for the flag-leaf takedown tests: a base corpus of
    * TWO files where the removable one carries (a) the k1 winner of an
    * fp group (inheritance on delete), (b) the only odd witness of
    * even doc 2's 5-gram (decon true→false), and (c) the 129th holder
    * of the hot 5-gram, whose removal drops its df back to the 128 cap
    * (decon false→true re-admission for doc 4 and the even fillers).
    */
  private def stageFlagsDeleteCorpus(): String = {
    import spark.implicits._
    val hot = "c1 c2 c3 c4 c5"
    val mainDocs =
      Seq(
        (2L, "alpha beta gamma delta epsilon zeta", "a"),
        (4L, s"$hot only4", "a"),
        (5L, s"$hot only5", "a"),
        (10L, "dup one text x1 x2 x3", "a"),
        (12L, "dup one text x1 x2 x3", "a"),
        (18L, "pair b text z1 z2 z3", "b"),
        (20L, "pair b text z1 z2 z3", "b")) ++
        (1 to 126).map(i => (100L + i, s"$hot u$i", if (i % 2 == 0) "a" else "b"))
    val removableDocs = Seq(
      (8L, "dup one text x1 x2 x3", "a"),   // k1 winner — its loss re-elects 10
      (21L, "alpha beta gamma delta epsilon other", "b"), // doc 2's only odd witness
      (301L, s"$hot u301", "b"))            // 129th hot holder — removal re-admits
    val dir = java.nio.file.Files.createTempDirectory("graft_flags_del").toString
    mainDocs.toDF("doc_id", "text", "source").repartition(1)
      .write.parquet(s"$dir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_flags_del_s").toString + "/p"
    removableDocs.toDF("doc_id", "text", "source").repartition(1).write.parquet(stage)
    appendParts(stage, s"$dir/documents.parquet") // BEFORE the first build: both files are base
    dir
  }

  private def flagTuples(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
      r.getAs[Long]("n_toks"), r.getAs[String]("fp"), r.getAs[Long]("comp"),
      r.getAs[Boolean]("decon"), r.getAs[Boolean]("g_keep"),
      r.getAs[Boolean]("c_keep"), r.getAs[Boolean]("k1"), r.getAs[Boolean]("k2"),
      r.getAs[Boolean]("a2"), r.getAs[Boolean]("k3"), r.getAs[Boolean]("k4"),
      r.getAs[Boolean]("k5"), r.getAs[String]("h")))
    .sortBy(_._1)

  test("curation_flags delete: k1 inheritance, decon witness loss AND cap re-admission, value-identical to full") {
    val dir = stageFlagsDeleteCorpus()
    withAppendFraction("100") {
      val cache = freshCacheDir()
      val before = withCacheDir(cache) {
        Materialize.resetBuildCount("curation_flags")
        flagTuples(Pipeline.curationFlags(spark, dir))
      }
      val bBy = before.map(t => t._1 -> t).toMap
      assert(bBy(8L)._9 === true && bBy(10L)._9 === false, "pre-delete k1: 8 wins the fp group")
      assert(bBy(2L)._6 === true, "pre-delete decon(2): odd 21 is the witness")
      assert(bBy(4L)._6 === false, "pre-delete decon(4): the hot 5-gram is OVER the cap (129)")
      assert(bBy(102L)._6 === false, "pre-delete: even fillers carry no evidence either")
      // takedown: the removable file leaves disk
      new java.io.File(s"$dir/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-append-")).foreach(f => assert(f.delete()))
      val viaDelete = withCacheDir(cache) {
        flagTuples(Pipeline.curationFlags(spark, dir))
      }
      assert(Materialize.deleteBuildCount("curation_flags") === 1,
        "the takedown must maintain the flag leaf incrementally")
      val viaFull = withCacheDir(freshCacheDir()) {
        flagTuples(Pipeline.curationFlags(spark, dir))
      }
      assert(viaDelete === viaFull,
        "delete-maintained flags must be value-identical to a full rebuild")
      val dBy = viaDelete.map(t => t._1 -> t).toMap
      assert(!dBy.contains(8L) && !dBy.contains(21L) && !dBy.contains(301L),
        "removed docs' rows must leave the leaf")
      assert(dBy(10L)._9 === true && dBy(12L)._9 === false,
        "k1 inheritance: the next-smallest id takes the lost election")
      assert(dBy(2L)._6 === false,
        "decon(2) must flip false: its only odd witness was removed")
      assert(dBy(4L)._6 === true,
        "decon(4) must flip true: the removal dropped the hot 5-gram back under the cap")
      assert(dBy(102L)._6 === true,
        "re-admission reaches every even holder of the capped-back shingle")
      Seq(18L, 20L).foreach(i => assert(dBy(i) === bBy(i), s"doc $i must carry unchanged"))
    }
  }

  test("curation_flags mixed: same-epoch takedown + crawl composes remove∘delta, value-identical to full") {
    import spark.implicits._
    val dir = stageFlagsDeleteCorpus()
    withAppendFraction("100") {
      val cache = freshCacheDir()
      withCacheDir(cache) {
        Materialize.resetBuildCount("curation_flags")
        Pipeline.curationFlags(spark, dir).count()
      }
      // one snapshot change: the removable file leaves AND a crawl
      // batch lands — doc 9 re-contests the fp group 8 vacated (the
      // composed election must pick 9, not 10), doc 23 brings doc 2's
      // witness 5-gram back on the odd side (decon(2) stays true
      // through loss + replacement)
      new java.io.File(s"$dir/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-append-")).foreach(f => assert(f.delete()))
      val stage2 = java.nio.file.Files.createTempDirectory("graft_flags_mix_s").toString + "/p"
      Seq((9L, "dup one text x1 x2 x3", "a"),
          (23L, "alpha beta gamma delta epsilon anew", "b"))
        .toDF("doc_id", "text", "source").repartition(1).write.parquet(stage2)
      appendParts(stage2, s"$dir/documents.parquet")
      val viaMixed = withCacheDir(cache) {
        flagTuples(Pipeline.curationFlags(spark, dir))
      }
      assert(Materialize.deleteBuildCount("curation_flags") === 1 &&
        Materialize.deltaBuildCount("curation_flags") === 1,
        "the mixed change must compose one remove + one delta build")
      val viaFull = withCacheDir(freshCacheDir()) {
        flagTuples(Pipeline.curationFlags(spark, dir))
      }
      assert(viaMixed === viaFull,
        "mixed-maintained flags must be value-identical to a full rebuild")
      val mBy = viaMixed.map(t => t._1 -> t).toMap
      assert(mBy(9L)._9 === true && mBy(10L)._9 === false,
        "the appended smaller id must win the election the takedown vacated")
      assert(mBy(2L)._6 === true,
        "decon(2) must stay true: the crawl replaced the removed witness")
      assert(mBy(4L)._6 === true, "the re-admission still lands under composition")
    }
  }

  test("curation_flags delta on the real corpus: funnel consumers read identical values from delta-built and full-built leaves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_flags_sf").toString
    graft.sources.Tables.documents(spark, sf).write.parquet(s"$dir/documents.parquet")
    val docs = graft.sources.Tables.documents(spark, sf)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    // appended batch: copies of real docs under fresh ids (touched fp
    // groups + near-dup components + cross-parity 5-gram overlap — the
    // realistic crawl shape), one per 25 docs
    val stage = java.nio.file.Files.createTempDirectory("graft_flags_sf_s").toString + "/p"
    docs.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + maxId + 1)
      .repartition(1).write.parquet(stage)
    withAppendFraction("100") {
      val cache = freshCacheDir()
      withCacheDir(cache) {
        Materialize.resetBuildCount("curation_flags")
        Pipeline.curationFlags(spark, dir).count()
      }
      appendParts(stage, s"$dir/documents.parquet")
      def reportOf() = Pipeline.curationReport(spark, dir).collect()
        .map(_.toSeq).toSeq
      def matrixOf() = Pipeline.curationBySource(spark, dir).collect()
        .map(_.toSeq).toSeq
      val (repDelta, matDelta) = withCacheDir(cache) { (reportOf(), matrixOf()) }
      assert(Materialize.deltaBuildCount("curation_flags") === 1,
        "the real-corpus append must take the flag delta path")
      val (repFull, matFull) = withCacheDir(freshCacheDir()) { (reportOf(), matrixOf()) }
      assert(repDelta === repFull,
        "curation_report must be identical over delta-built and full-built leaves")
      assert(matDelta === matFull,
        "curation_by_source must be identical over delta-built and full-built leaves")
    }
  }

  test("gc leaves young in-flight .tmp-* builds alone even past the artifact age bound") {
    val cache = freshCacheDir()
    withCacheDir(cache) {
      // simulate a live concurrent build: a fresh .tmp dir whose mtime
      // is past the artifact bound (age-0) but inside the 24h grace —
      // a directory mtime only moves on direct-child creation, so a
      // long build hits exactly this state
      val tmp = new java.io.File(cache, ".spec_gc-deadbeef.tmp-live")
      assert(tmp.mkdirs())
      assert(Materialize.gc(spark, -1L) === Nil, "in-flight build must survive the artifact bound")
      assert(tmp.exists())
      // a crashed writer's orphan (mtime pushed past the grace) is reaped
      assert(tmp.setLastModified(System.currentTimeMillis() - Materialize.OrphanGraceMs - 60000))
      val reaped = Materialize.gc(spark, -1L)
      assert(reaped.contains(tmp.getName), reaped.toString)
      assert(!tmp.exists())
    }
  }

  test("concurrent identical builds: loser of the rename still reads a fresh artifact") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_mat_in3").toString + "/t.parquet"
    spark.range(50).write.parquet(in)
    withCacheDir(cache) {
      Materialize.resetBuildCount("spec_race")
      def get() = Materialize.readOrBuild(spark, "spec_race", Seq(in),
        Seq("ver" -> "1"))(spark.read.parquet(in))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val counts = Await.result(
        Future.sequence((1 to 4).map(_ => Future(get().count()))), 120.seconds)
      assert(counts.forall(_ == 50L))
      // every racer that missed the fresh-check built; all of them
      // ended up reading the one signature-keyed artifact
      assert(Materialize.buildCount("spec_race") >= 1)
      assert(get().count() === 50)
    }
  }

  test("purge tombstone: a build over purged inputs cannot publish; a re-created path can") {
    val cache = freshCacheDir()
    val in = java.nio.file.Files.createTempDirectory("graft_purge_ts").toString + "/t.parquet"
    spark.range(20).write.parquet(in)
    val parts = new java.io.File(in).listFiles().filter(_.getName.startsWith("part-"))
    withCacheDir(cache) {
      Materialize.readOrBuild(spark, "spec_ts", Seq(in), Seq("ver" -> "1"))(
        spark.read.parquet(in)).count()
      // takedown: the input files leave disk, the purge reaps the
      // artifact AND writes the timestamped tombstone ledger
      val partPaths = parts.map(_.getAbsolutePath).toSeq
      val bytes = parts.map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
      parts.foreach(f => assert(f.delete()))
      assert(Materialize.purgeContaining(spark, partPaths).nonEmpty)
      // a build whose manifest lists a purged path at a PRE-purge
      // mtime is vetoed at publish — repeatedly, so the bounded retry
      // fails loudly instead of resurrecting removed documents'
      // derived data (the in-flight-build compliance window)
      bytes.foreach { case (nm, bs) =>
        val f = new java.io.File(in, nm)
        java.nio.file.Files.write(f.toPath, bs)
        assert(f.setLastModified(System.currentTimeMillis() - 60000))
      }
      val e = intercept[IllegalArgumentException] {
        Materialize.readOrBuild(spark, "spec_ts", Seq(in), Seq("ver" -> "2"))(
          spark.read.parquet(in)).count()
      }
      assert(e.getMessage.contains("purge veto"))
      // but a legitimately RE-CREATED file (same path, post-purge
      // mtime — tomorrow's crawl re-emitting the filename) publishes:
      // the tombstone is scoped by time, not forever-by-path
      new java.io.File(in).listFiles().filter(_.getName.startsWith("part-"))
        .foreach(f => assert(f.setLastModified(System.currentTimeMillis() + 2000)))
      assert(Materialize.readOrBuild(spark, "spec_ts", Seq(in), Seq("ver" -> "3"))(
        spark.read.parquet(in)).count() === 20L)
    }
  }

  // ───────────────── materialized ANN index tier (round 17) ─────────────────

  test("ann index tier: cold artifacts reproduce the per-run entries bit-for-bit, one build each") {
    val S = graft.operators.Similarity
    val v = S.normalizedVecs(spark, sf)
    val n = S.corpusSize(spark, sf)
    def strs(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    withCacheDir(freshCacheDir()) {
      Seq("ivf", "pq", "ivfpq", "ivfpqr").foreach { vnt =>
        Materialize.resetBuildCount(s"annix_model_$vnt")
        Materialize.resetBuildCount(s"annix_codes_$vnt")
      }
      // the per-run reference paths re-train/re-encode inline — the
      // indexed driver entries must emit EXACTLY their rows (same
      // deterministic sample, same arithmetic, parquet round-trip
      // exact on doubles and ints)
      assert(strs(S.annIvf(spark, sf)) === strs(S.ivfSearch(v, S.queryVecs(v), 10, n)))
      assert(strs(S.annPq(spark, sf)) === strs(S.pqSearch(v, S.queryVecs(v), 10, n)))
      assert(strs(S.annIvfPq(spark, sf)) === strs(S.ivfPqSearch(v, S.queryVecs(v), 10, n)))
      assert(strs(S.annIvfPqResidual(spark, sf)) ===
        strs(S.ivfPqSearch(v, S.queryVecs(v), 10, n, residual = true)))
      // second invocation: pure cache hit — search-only, zero rebuilds
      S.annIvfPq(spark, sf).count()
      Seq("ivf", "pq", "ivfpq", "ivfpqr").foreach { vnt =>
        assert(Materialize.buildCount(s"annix_model_$vnt") === 1, s"model $vnt")
        assert(Materialize.buildCount(s"annix_codes_$vnt") === 1, s"codes $vnt")
      }
    }
  }

  /** Read a tier artifact's parquet straight from the cache root (the
    * driver queries' own leaf) — newest publication wins.
    */
  private def annArtifact(cache: String, name: String): org.apache.spark.sql.DataFrame = {
    val dirs = new java.io.File(cache).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"$name-"))
    assert(dirs.nonEmpty, s"no $name artifact in $cache")
    spark.read.parquet(dirs.maxBy(_.lastModified()).toString)
  }

  test("ann index append: model carried verbatim, codes delta equals appendToIndex's algebra") {
    import spark.implicits._
    val S = graft.operators.Similarity
    val rnd = new scala.util.Random(8642)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 240L).map(i => (i, vec()))
    val batch = (9001L to 9040L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_annix_app").toString
    base.toDF("vec_id", "embedding").repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_annix_app_stage").toString + "/p"
    batch.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    val cache = freshCacheDir()
    def codesOf(name: String) = annArtifact(cache, name)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
      .sortBy(_._1).toSeq
    val (baseCodes, baseModel) = withCacheDir(cache) {
      Materialize.resetBuildCount("annix_model_ivfpq")
      Materialize.resetBuildCount("annix_codes_ivfpq")
      S.annIvfPq(spark, dir).count()
      (codesOf("annix_codes_ivfpq"),
        annArtifact(cache, "annix_model_ivfpq").collect().map(_.toString).sorted.toSeq)
    }
    appendParts(stage, s"$dir/embeddings.parquet")
    withAppendFraction("1000") {
      withCacheDir(cache) { S.annIvfPq(spark, dir).count() }
    }
    assert(Materialize.deltaBuildCount("annix_model_ivfpq") === 1, "model must carry, not retrain")
    assert(Materialize.deltaBuildCount("annix_codes_ivfpq") === 1, "codes must delta, not re-encode")
    // the carried model is bit-identical (training-base rider included)
    assert(annArtifact(cache, "annix_model_ivfpq").collect().map(_.toString).sorted.toSeq
      === baseModel)
    // codes ≡ the public appendToIndex algebra on the same base —
    // encode ONLY the batch under the base-trained model, union
    val expected = S.appendToIndex(
      S.buildIvfPqIndex(base.toDF("vec_id", "embedding")),
      batch.toDF("vec_id", "embedding")).codes
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
      .sortBy(_._1).toSeq
    assert(codesOf("annix_codes_ivfpq") === expected)
    // base rows' cells + codes carried bit-identically inside that
    assert(codesOf("annix_codes_ivfpq").filter(_._1 <= 240L) === baseCodes)
  }

  test("ann index takedown: codes return to the base state exactly; oversized drift retrains") {
    import spark.implicits._
    val S = graft.operators.Similarity
    val rnd = new scala.util.Random(9753)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 200L).map(i => (i, vec()))
    val batch = (9001L to 9030L).map(i => (i, vec()))
    val dir = java.nio.file.Files.createTempDirectory("graft_annix_del").toString
    base.toDF("vec_id", "embedding").repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_annix_del_stage").toString + "/p"
    batch.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    val cache = freshCacheDir()
    def codesOf() = annArtifact(cache, "annix_codes_ivf")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val baseCodes = withCacheDir(cache) {
      Materialize.resetBuildCount("annix_model_ivf")
      Materialize.resetBuildCount("annix_codes_ivf")
      S.annIvf(spark, dir).count()
      codesOf()
    }
    val baseArtifacts = new java.io.File(cache).listFiles().map(_.getName).toSet
    val appended = new java.io.File(s"$dir/embeddings.parquet").listFiles()
      .filter(_.getName.startsWith("part-append-"))
    appendParts(stage, s"$dir/embeddings.parquet")
    withAppendFraction("1000") { withCacheDir(cache) { S.annIvf(spark, dir).count() } }
    assert(Materialize.deltaBuildCount("annix_codes_ivf") === 1)
    // reap the base-snapshot artifacts so the takedown can't resolve
    // as the emergent cheapest-prior cache hit — force the delete path
    new java.io.File(cache).listFiles()
      .filter(f => baseArtifacts.contains(f.getName))
      .foreach(f => { def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); () }; rm(f) })
    new java.io.File(s"$dir/embeddings.parquet").listFiles()
      .filter(_.getName.startsWith("part-append-")).foreach(f => assert(f.delete()))
    assert(appended != null) // silence unused warning paths
    withAppendFraction("1000") { withCacheDir(cache) { S.annIvf(spark, dir).count() } }
    assert(Materialize.deleteBuildCount("annix_model_ivf") === 1, "model carried through takedown")
    assert(Materialize.deleteBuildCount("annix_codes_ivf") === 1, "codes must semi-join survivors")
    // append∘delete of the same file is the identity on the codes —
    // bit-for-bit back to the base state (carried model ⇒ same cells)
    assert(codesOf() === baseCodes)
    // drift retrain: an append far past MaxAppendFraction of the
    // TRAINED base declines the carry — model full-retrains and the
    // fingerprint change forces a codes re-encode (never mixed models)
    val big = (20001L to 20600L).map(i => (i, vec()))
    val stage2 = java.nio.file.Files.createTempDirectory("graft_annix_del_s2").toString + "/p"
    big.toDF("vec_id", "embedding").repartition(1).write.parquet(stage2)
    appendParts(stage2, s"$dir/embeddings.parquet")
    val modelBuilds = Materialize.buildCount("annix_model_ivf")
    val modelDeltas = Materialize.deltaBuildCount("annix_model_ivf")
    withCacheDir(cache) { S.annIvf(spark, dir).count() }
    assert(Materialize.buildCount("annix_model_ivf") === modelBuilds + 1)
    assert(Materialize.deltaBuildCount("annix_model_ivf") === modelDeltas, "decline, not carry")
    val n = S.corpusSize(spark, dir)
    assert(annArtifact(cache, "annix_codes_ivf").count() === n)
  }

  // ───────────── materialized exact top-k (annix_exact, round 18) ─────────────

  test("annix_exact: artifact-backed ann_bruteforce is bit-identical to the inline scan, one build") {
    val S = graft.operators.Similarity
    withCacheDir(freshCacheDir()) {
      Materialize.resetBuildCount("annix_exact")
      val got = S.annBruteforce(spark, sf).collect().map(_.toString).toSeq
      val want = S.annBruteforceInline(spark, sf).collect().map(_.toString).toSeq
      assert(got === want)
      // further consumers (the re-rank entry + the label vote) ride
      // the same artifact — still exactly one build
      S.annBruteforce(spark, sf).count()
      S.knnLabelVote(spark, sf).count()
      assert(Materialize.buildCount("annix_exact") === 1)
    }
  }

  /** Engineered 4-dim exact-search corpus: fixture queries q100 = e1
    * and q200 = e2 sit in the base file; each axis cluster's members
    * score ≈1 against its query and ~0 against the other, so top-10
    * membership is determined by construction with a wide margin (no
    * accidental entrants, no boundary ties).
    */
  private def axisVec(axis: Int, i: Long, eps: Double): Array[Double] = {
    val v = Array.fill(4)(0.0); v(axis) = 1.0; v((axis + 1) % 4) = eps * i; v
  }

  private def writeExactCorpus(dir: String): Unit = {
    import spark.implicits._
    val base = Seq((100L, axisVec(0, 0, 0)), (200L, axisVec(1, 0, 0))) ++
      (21L to 90L).map(i => (i, axisVec(2, i, 1e-4)))
    base.toDF("vec_id", "embedding").repartition(1)
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def stageExactParts(dir: String, rows: Seq[(Long, Array[Double])]): Set[String] = {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_annx_stage").toString + "/p"
    rows.toDF("vec_id", "embedding").repartition(1).write.parquet(stage)
    val before = new java.io.File(s"$dir/embeddings.parquet").listFiles().map(_.getName).toSet
    appendParts(stage, s"$dir/embeddings.parquet")
    new java.io.File(s"$dir/embeddings.parquet").listFiles().map(_.getName).toSet -- before
  }

  private def freshFullExact(dir: String): Seq[String] =
    withCacheDir(freshCacheDir()) {
      graft.operators.Similarity.annBruteforce(spark, dir)
        .collect().map(_.toString).toSeq
    }

  test("annix_exact append: delta merge with real displacement is value-identical to full") {
    val S = graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_annx_app").toString
    writeExactCorpus(dir)
    // winners: ids 1..10 ≈ e1 (q100's top-10), 11..20 ≈ e2 (q200's)
    stageExactParts(dir, (1L to 10L).map(i => (i, axisVec(0, i, 1e-4))) ++
      (11L to 20L).map(i => (i, axisVec(1, i, 1e-4))))
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("annix_exact")
      S.annBruteforce(spark, dir).count()
      assert(Materialize.buildCount("annix_exact") === 1)
    }
    // batch: tighter clusters (eps 1e-6 ⇒ cos closer to 1) — the
    // entrants DISPLACE incumbents through the stored-k-th admission
    // filter; no candidate ids (nothing ≡ 0 mod 100) ⇒ fixture stable
    stageExactParts(dir, (9001L to 9005L).map(i => (i, axisVec(0, i - 9000, 1e-6))) ++
      (9011L to 9015L).map(i => (i, axisVec(1, i - 9010, 1e-6))))
    val got = withCacheDir(cache) {
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    assert(Materialize.deltaBuildCount("annix_exact") === 1, "must ride the delta path")
    assert(Materialize.buildCount("annix_exact") === 2)
    val want = freshFullExact(dir)
    assert(got === want)
    // displacement really happened: the new e1-cluster ids lead q100's list
    assert(got.count(r => r.startsWith("[100,") &&
      (9001L to 9005L).exists(i => r.contains(s",$i,"))) === 5)
  }

  test("annix_exact append that shifts the query fixture declines to a full rebuild") {
    val S = graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_annx_fix").toString
    writeExactCorpus(dir)
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("annix_exact")
      S.annBruteforce(spark, dir).count()
    }
    // id 9100 ≡ 0 mod 100 and the fixture (2 queries) is below
    // QueryCap — the batch changes the query set itself
    stageExactParts(dir, Seq((9100L, axisVec(0, 7, 1e-5))) ++
      (9001L to 9003L).map(i => (i, axisVec(2, i, 1e-4))))
    val got = withCacheDir(cache) {
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    assert(Materialize.deltaBuildCount("annix_exact") === 0, "fixture shift must decline")
    assert(Materialize.buildCount("annix_exact") === 2)
    assert(got === freshFullExact(dir))
    assert(got.exists(_.startsWith("[9100,")), "new candidate must BE a query after rebuild")
  }

  test("annix_exact takedown: unreferenced removal carries; referenced removal declines to full") {
    val S = graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_annx_del").toString
    writeExactCorpus(dir)
    val winners = stageExactParts(dir, (1L to 10L).map(i => (i, axisVec(0, i, 1e-4))) ++
      (11L to 20L).map(i => (i, axisVec(1, i, 1e-4))))
    // doomed: ids 401..420 ≈ e4 — ~0 against both queries, never
    // referenced (421 ≢ 0 mod 100 anywhere, so no fixture impact)
    val doomed = stageExactParts(dir, (401L to 420L).map(i => (i, axisVec(3, i, 1e-4))))
    val cache = freshCacheDir()
    val before = withCacheDir(cache) {
      Materialize.resetBuildCount("annix_exact")
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    doomed.foreach(nm => assert(new java.io.File(s"$dir/embeddings.parquet", nm).delete()))
    val afterUnref = withCacheDir(cache) {
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    assert(Materialize.deleteBuildCount("annix_exact") === 1, "unreferenced removal must carry")
    assert(Materialize.buildCount("annix_exact") === 2)
    assert(afterUnref === before, "top-k invariant under unreferenced removal")
    assert(afterUnref === freshFullExact(dir))
    // now remove the winners file: every row is referenced — the k-th
    // slot's replacements are unknowable from the artifact → full
    // (counters relative from here: the freshFullExact reference
    // builds above also tick the global per-name build counter)
    val b0 = Materialize.buildCount("annix_exact")
    winners.foreach(nm => assert(new java.io.File(s"$dir/embeddings.parquet", nm).delete()))
    val afterRef = withCacheDir(cache) {
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    assert(Materialize.deleteBuildCount("annix_exact") === 1, "referenced removal must DECLINE")
    assert(Materialize.buildCount("annix_exact") === b0 + 1)
    assert(afterRef === freshFullExact(dir))
    // vec_id is field 2 of "[q_id,rk,vec_id,cos6]" (a bare contains
    // would also match the rk field)
    assert(!afterRef.exists(r =>
      (1L to 20L).contains(r.stripPrefix("[").split(",")(2).toLong)))
  }

  test("annix_exact mixed (same-epoch takedown + crawl) composes remove then delta") {
    val S = graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_annx_mix").toString
    writeExactCorpus(dir)
    stageExactParts(dir, (1L to 10L).map(i => (i, axisVec(0, i, 1e-4))) ++
      (11L to 20L).map(i => (i, axisVec(1, i, 1e-4))))
    val doomed = stageExactParts(dir, (401L to 420L).map(i => (i, axisVec(3, i, 1e-4))))
    val cache = freshCacheDir()
    withCacheDir(cache) {
      Materialize.resetBuildCount("annix_exact")
      S.annBruteforce(spark, dir).count()
    }
    doomed.foreach(nm => assert(new java.io.File(s"$dir/embeddings.parquet", nm).delete()))
    stageExactParts(dir, (9001L to 9005L).map(i => (i, axisVec(0, i - 9000, 1e-6))))
    val got = withCacheDir(cache) {
      S.annBruteforce(spark, dir).collect().map(_.toString).toSeq
    }
    assert(Materialize.deleteBuildCount("annix_exact") === 1)
    assert(Materialize.deltaBuildCount("annix_exact") === 1)
    assert(Materialize.buildCount("annix_exact") === 2)
    assert(got === freshFullExact(dir))
  }
}
