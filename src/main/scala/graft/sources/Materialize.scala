package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize-once/read-many for suite-level shared intermediates.
  *
  * Several driver queries consume the same expensive intermediate (the
  * near-dup pair graph feeds dedup_ngram_jaccard, dedup_components,
  * graph_triangles, split_assign_grouped and corpus_clean; the
  * co-purchase pair relation feeds link_predict and graph_kcore).  At
  * 100 TB nobody recomputes a MinHash/shingle pair build per downstream
  * query — the pair graph is built ONCE per corpus snapshot and every
  * consumer reads the materialized copy.  This seam is that discipline:
  *
  *  - an artifact is keyed by a SIGNATURE = sha-256 over the builder's
  *    parameters plus the recursive (path, length, mtime) listing of
  *    its input datasets — any input refresh or parameter change yields
  *    a different artifact directory, so staleness is impossible by
  *    construction (read-if-fresh/else-compute);
  *  - the first consumer in a suite run computes the intermediate and
  *    writes it as parquet (write-to-temp + atomic rename, so a crashed
  *    or concurrent build can never publish a half-written artifact);
  *  - every consumer — including the builder itself, which re-reads
  *    what it just wrote — gets a plain parquet scan of the artifact,
  *    so downstream plans start from a FileScan instead of replaying
  *    the build pipeline, and the values are bit-identical across
  *    consumers because they are literally the same bytes (longs and
  *    doubles round-trip parquet exactly).
  *
  * The cache root defaults to `target/graft_cache` (local, gitignored)
  * and is overridable via `spark.graft.cache.dir` — on a cluster this
  * is a warehouse path; artifact retention there is an operational
  * TTL concern, not this seam's (artifacts are immutable, so deleting
  * an old one only costs a rebuild).
  */
object Materialize {

  /** Builds executed in this JVM per artifact name — the suite-mode
    * "ONE pair-pipeline execution" claim is pinned against this.
    */
  private val builds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def buildCount(name: String): Int =
    builds.getOrDefault(name, 0)

  /** Snapshot of every artifact's build count this JVM — Bench diffs
    * it around each query so the committed evidence names which query
    * paid which artifact build (cold-cache accounting, mechanical).
    */
  private[graft] def buildCounts: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    builds.asScala.map { case (k, v) => k -> v.toInt }.toMap
  }

  private[graft] def resetBuildCount(name: String): Unit = {
    builds.remove(name); ()
  }

  def cacheRoot(s: SparkSession): String =
    s.conf.get("spark.graft.cache.dir", "target/graft_cache")

  /** Return the artifact as a DataFrame, building it first if no fresh
    * materialization exists.  `inputs` are the dataset paths the build
    * reads (their stats enter the signature); `params` pin the builder
    * version and knobs.  `build` must be deterministic in its inputs —
    * the contract that makes read-back and recompute interchangeable.
    */
  def readOrBuild(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)])(build: => DataFrame): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val sig = signature(s, inputs, params)
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    val dest = new Path(root, s"$name-${sig.take(16)}")
    if (!isFresh(fs, dest, sig)) {
      builds.merge(name, 1, (a, b) => a + b)
      val tmp = new Path(root, s".${dest.getName}.tmp-${java.util.UUID.randomUUID}")
      build.write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(new Path(tmp, "_SIG"))
      try out.write(sig.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // A concurrent identical build may have published while we built.
      // Check BEFORE renaming: on local filesystems a rename onto an
      // existing directory can merge tmp INSIDE dest (and return true)
      // instead of failing, which would leave a hidden duplicate copy.
      if (fs.exists(dest)) {
        fs.delete(tmp, true)
        require(isFresh(fs, dest, sig), s"materialize race left no fresh artifact at $dest")
      } else if (!fs.rename(tmp, dest)) {
        // the race lost between the exists check and the rename; the
        // winner's bytes carry the same signature-keyed name
        fs.delete(tmp, true)
        require(isFresh(fs, dest, sig), s"materialize race left no fresh artifact at $dest")
      } else {
        // rename semantics vary across Hadoop FS impls — a move-into-
        // existing-directory fallback can leave the whole tmp dir as a
        // hidden '.tmp-*' child inside dest; reap any such directory
        // (plain '.crc' sidecar files are left alone)
        fs.listStatus(dest)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("."))
          .foreach(h => fs.delete(h.getPath, true))
      }
    }
    s.read.parquet(dest.toString)
  }

  private def isFresh(fs: FileSystem, dest: Path, sig: String): Boolean = {
    val sigFile = new Path(dest, "_SIG")
    fs.exists(sigFile) && {
      val in = fs.open(sigFile)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8) == sig
      } finally in.close()
    }
  }

  /** sha-256 hex over params + the sorted recursive (path, len, mtime)
    * stat listing of every input — a content-version key without
    * reading the data (mtime+length is the freshness contract object
    * stores and HDFS both honor).
    */
  private[graft] def signature(s: SparkSession, inputs: Seq[String],
      params: Seq[(String, String)]): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    params.sortBy(_._1).foreach { case (k, v) => lines += s"param|$k|$v" }
    inputs.sorted.foreach { in =>
      val p = new Path(absolutize(in))
      val fs = p.getFileSystem(conf)
      statRec(fs, p, lines)
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    md.digest().map(b => f"$b%02x").mkString
  }

  private def statRec(fs: FileSystem, p: Path,
      acc: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).sortBy(_.getPath.getName).foreach(c => statRec(fs, c.getPath, acc))
    else acc += s"file|${p.toString}|${st.getLen}|${st.getModificationTime}"
  }

  /** Cache janitor: delete artifacts whose publication is older than
    * `maxAgeMs` (by the artifact directory's own mtime — set at the
    * atomic rename, i.e. publication time).  Artifacts are immutable
    * and signature-keyed, so deletion is always SAFE — the worst case
    * is a rebuild on next read — which is why a blunt age policy
    * suffices; a superseded artifact (inputs refreshed → new sig → new
    * directory) stops being read immediately and ages out here.
    * In-flight `.tmp-*` directories belong to their writer and get a
    * much larger grace period ([[OrphanGraceMs]], 24h minimum): a
    * directory's mtime only updates on direct-child creation, so a
    * long-running build whose last part-file opened before `maxAgeMs`
    * would otherwise be reaped mid-write.  A crashed writer's orphan
    * still ages out past the grace bound.  Returns the deleted names.
    */
  def gc(s: SparkSession, maxAgeMs: Long): Seq[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val now = System.currentTimeMillis()
    fs.listStatus(root).toSeq
      .filter { st =>
        val inFlight = st.getPath.getName.startsWith(".")
        val bound = if (inFlight) math.max(maxAgeMs, OrphanGraceMs) else maxAgeMs
        st.isDirectory && now - st.getModificationTime > bound
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
  }

  /** Minimum age before an in-flight `.tmp-*` build directory may be
    * reaped as a crashed-writer orphan — far beyond any live build.
    */
  val OrphanGraceMs: Long = 24L * 60 * 60 * 1000

  /** Scheme-less paths are local-filesystem relative: absolutize against
    * the JVM cwd so the Hadoop Path doesn't resolve against fs.defaultFS's
    * working directory.
    */
  private def absolutize(path: String): String =
    if (path.contains("://")) path
    else new java.io.File(path).getAbsolutePath
}
