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
