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

    val cacheDelta = freshCacheDir()
    val before = withCacheDir(cacheDelta) {
      Materialize.resetBuildCount("neardup_pairs")
      Materialize.resetBuildCount("neardup_index")
      Materialize.resetBuildCount("neardup_df")
      pairsOf(Dedup.nearDupPairs(spark, dir))
    }
    assert(before.map(t => (t._1, t._2)).contains((1L, 2L)))
    assert(before.map(t => (t._1, t._2)).contains((130L, 131L)), "J=0.8 pair exists pre-append")
    assert(!before.map(t => (t._1, t._2)).contains((3L, 201L)))

    appendParts(stage, s"$dir/documents.parquet")
    val viaDelta = withCacheDir(cacheDelta) { pairsOf(Dedup.nearDupPairs(spark, dir)) }
    assert(Materialize.deltaBuildCount("neardup_pairs") === 1,
      "the append must maintain the pair artifact incrementally")
    assert(Materialize.buildCount("neardup_index") === 1,
      "the base index must NOT be rebuilt on append — the composed " +
        "snapshot index is lazy (no corpus-sized artifact rewrite)")
    val viaFull = withCacheDir(freshCacheDir()) { pairsOf(Dedup.nearDupPairs(spark, dir)) }
    // VALUE-identical: same pairs, bit-equal jaccard doubles
    assert(viaDelta === viaFull)
    val ids = viaDelta.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)), "clean-clean pair persists bit-identically")
    assert(ids.contains((3L, 201L)), "cross-snapshot pair appears")
    assert(ids.contains((202L, 203L)), "delta-internal pair appears")
    assert(!ids.contains((130L, 131L)),
      "the cap-crossing append must kill the J=0.8-with-hot-shingle pair")
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
}
