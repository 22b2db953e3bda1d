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
    builds.remove(name); deltaBuilds.remove(name); deleteBuilds.remove(name)
    mixedFusedBuilds.remove(name); ()
  }

  /** Delta builds executed in this JVM per artifact name — the
    * append-costs-the-delta claim is pinned against this.
    */
  private val deltaBuilds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def deltaBuildCount(name: String): Int =
    deltaBuilds.getOrDefault(name, 0)

  /** Delete (takedown) builds executed in this JVM per artifact name —
    * the removal-costs-the-dirty-set claim is pinned against this.
    */
  private val deleteBuilds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def deleteBuildCount(name: String): Int =
    deleteBuilds.getOrDefault(name, 0)

  /** FUSED mixed builds (round 17) — pins that a same-epoch
    * add+remove ran the registered single-pass builder, not the
    * remove∘delta composition.
    */
  private val mixedFusedBuilds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def mixedFusedBuildCount(name: String): Int =
    mixedFusedBuilds.getOrDefault(name, 0)

  def cacheRoot(s: SparkSession): String =
    s.conf.get("spark.graft.cache.dir", "target/graft_cache")

  /** Return the artifact as a DataFrame, building it first if no fresh
    * materialization exists.  `inputs` are the dataset paths the build
    * reads (their stats enter the signature); `params` pin the builder
    * version and knobs.  `build` must be deterministic in its inputs —
    * the contract that makes read-back and recompute interchangeable.
    */
  def readOrBuild(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)])(build: => DataFrame): DataFrame =
    readOrBuildAttempt(s, name, inputs, params, PurgeRetries)(build)

  /** Attempts bound for a build whose publish is vetoed by a purge
    * tombstone (each retry re-stats the inputs, so it only recurs if
    * ANOTHER takedown landed mid-rebuild — twice is already a storm).
    */
  private val PurgeRetries = 3

  private def readOrBuildAttempt(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)], attempts: Int)(build: => DataFrame): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val lines = statLines(s, inputs, params)
    val sig = sha256(lines)
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    val dest = new Path(root, s"$name-${sig.take(16)}")
    if (!isFresh(fs, dest, sig)) {
      builds.merge(name, 1, (a, b) => a + b)
      if (!publish(fs, root, dest, sig, lines, build)) {
        // a takedown purged one of our inputs while we built: re-stat
        // (the removed files are gone → new signature) and rebuild
        require(attempts > 1, s"$name: purge veto persisted across rebuilds")
        return readOrBuildAttempt(s, name, inputs, params, attempts - 1)(build)
      }
    }
    Scan.parquet(s, dest.toString)
  }

  /** Incremental variant: when the input change is a pure APPEND of a
    * previously materialized snapshot (every old file byte-identical by
    * stat, ≥ 1 new file), `delta(prevArtifact, prevFiles, deltaFiles)`
    * builds the new artifact from the old one plus only the appended
    * files — the incremental-view-maintenance path that makes a 100 TB
    * daily-crawl append cost the delta, not the corpus.  The callback
    * may return null to DECLINE (e.g. a required companion artifact
    * from the prior snapshot is missing), falling back to `full`.
    * Any non-append change (rewrite, delete, param change) takes the
    * `full` path.  Correctness contract: delta(prev, old, new) must be
    * value-identical to full on old+new — spec-pinned for every
    * registered delta builder.
    */
  def readOrBuildDelta(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)])(full: => DataFrame)(
      delta: (DataFrame, Seq[String], Seq[String]) => DataFrame): DataFrame =
    readOrBuildMaintained(s, name, inputs, params)(full)(delta)((_, _, _) => null)

  /** The fully-maintained variant: [[readOrBuildDelta]] plus a PURE
    * DELETE path — the takedown mutation (GDPR removal, license
    * retraction), the second-most-common corpus change after the
    * crawl append.  When the current snapshot is a prior one with ≥ 1
    * file REMOVED and every surviving file byte-identical by stat,
    * `remove(prevArtifact, prevStats, removedFiles)` builds the new
    * artifact from the old one minus the removed files' contribution.
    * `prevStats` maps every PRIOR file path to its recorded
    * `"len|mtime"` manifest stat — the removed files no longer exist
    * on disk, so their sizes (for cost-based declines) and identities
    * come from the prior manifest, never a live stat.  The callback
    * may return null to DECLINE → full rebuild (which compacts).
    *
    * A MIXED change (round 16) — files both added and removed, every
    * shared file stat-identical: the most common REAL corpus mutation
    * (a day's crawl batched WITH the day's takedowns) — routes as the
    * COMPOSITION remove∘delta of the two registered callbacks: the
    * remove callback builds the surviving-prefix state from the prior
    * artifact (its eager sidecar refreshes align the delta leg's base
    * lookup), and the delta callback appends onto that UNPUBLISHED
    * intermediate — which is why delete builders must derive their
    * survivor set from `prevStats − removed`, never the live
    * directory listing (the appended files are already on disk when
    * the remove leg runs).  Declines if EITHER leg declines; counted
    * as one delete build + one delta build.  Any rewrite (a shared
    * path with a different stat) still takes the full path.
    * Correctness contract, mirroring the delta's: remove(prev, stats,
    * removed) must be value-identical to full on the surviving files
    * — spec-pinned for every registered delete builder.
    */
  def readOrBuildMaintained(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)])(full: => DataFrame)(
      delta: (DataFrame, Seq[String], Seq[String]) => DataFrame)(
      remove: (DataFrame, Map[String, String], Seq[String]) => DataFrame): DataFrame =
    readOrBuildMaintainedFused(s, name, inputs, params)(full)(delta)(remove)(
      (_, _, _, _) => null)

  /** [[readOrBuildMaintained]] plus an optional FUSED mixed builder
    * (round 17): `mixed(prevArtifact, prevStats, removedFiles,
    * appendedFiles)` handles a same-epoch add+remove in ONE pass —
    * one dirty set, one carry scan, no checkpointed intermediate —
    * where the generic remove∘delta composition pays both legs'
    * linear floors (measured at par with a full rebuild for the pair
    * substrate at sf10).  Returning null falls back to the
    * composition, whose correctness contract is unchanged; a fused
    * build is counted as one delta + one delete (the composition's
    * accounting) plus the [[mixedFusedBuildCount]] pin.
    */
  def readOrBuildMaintainedFused(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)])(full: => DataFrame)(
      delta: (DataFrame, Seq[String], Seq[String]) => DataFrame)(
      remove: (DataFrame, Map[String, String], Seq[String]) => DataFrame)(
      mixed: (DataFrame, Map[String, String], Seq[String], Seq[String]) => DataFrame): DataFrame =
    readOrBuildMaintainedAttempt(s, name, inputs, params, PurgeRetries)(
      full)(delta)(remove)(mixed)

  private def readOrBuildMaintainedAttempt(s: SparkSession, name: String,
      inputs: Seq[String], params: Seq[(String, String)], attempts: Int)(
      full: => DataFrame)(
      delta: (DataFrame, Seq[String], Seq[String]) => DataFrame)(
      remove: (DataFrame, Map[String, String], Seq[String]) => DataFrame)(
      mixed: (DataFrame, Map[String, String], Seq[String], Seq[String]) => DataFrame): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val lines = statLines(s, inputs, params)
    val sig = sha256(lines)
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    val dest = new Path(root, s"$name-${sig.take(16)}")
    if (!isFresh(fs, dest, sig)) {
      val viaAppend = findPrior(fs, root, name, dest, lines) match {
        case Some((prevDir, prevFiles)) =>
          val cur = fileLines(lines).keys.toSeq.sorted
          val deltaFiles = cur.filterNot(prevFiles.contains)
          Option(delta(Scan.parquet(s, prevDir.toString), prevFiles, deltaFiles))
        case None => None
      }
      val viaDelete =
        if (viaAppend.isDefined) None
        else findPriorSuperset(fs, root, name, dest, lines) match {
          case Some((prevDir, prevStats)) =>
            val removed = (prevStats.keySet -- fileLines(lines).keySet).toSeq.sorted
            Option(remove(Scan.parquet(s, prevDir.toString), prevStats, removed))
          case None => None
        }
      // the MIXED shape composes remove∘delta over one unpublished
      // intermediate; the lazy localCheckpoint keeps the delta leg's
      // several reads of that intermediate from re-running the remove
      // plan per consumer
      var mixedFused = false
      val viaMixed =
        if (viaAppend.isDefined || viaDelete.isDefined) None
        else findPriorMixed(fs, root, name, dest, lines) match {
          case Some((prevDir, prevStats)) =>
            val curFiles = fileLines(lines)
            val removed = (prevStats.keySet -- curFiles.keySet).toSeq.sorted
            val appended = (curFiles.keySet -- prevStats.keySet).toSeq.sorted
            val survivors = (prevStats.keySet & curFiles.keySet).toSeq.sorted
            val prev = Scan.parquet(s, prevDir.toString)
            // the registered FUSED builder first (one pass, no
            // intermediate); null → the generic remove∘delta
            // composition over the two registered callbacks
            Option(mixed(prev, prevStats, removed, appended)) match {
              case some @ Some(_) => mixedFused = true; some
              case None =>
                Option(remove(prev, prevStats, removed))
                  .map(_.localCheckpoint(false))
                  .flatMap(mid => Option(delta(mid, survivors, appended)))
            }
          case None => None
        }
      val built = viaAppend.orElse(viaDelete).orElse(viaMixed)
      builds.merge(name, 1, (a, b) => a + b)
      if (!publish(fs, root, dest, sig, lines, built.getOrElse(full))) {
        // purge-tombstone veto: re-stat (removed files gone → new
        // signature) and re-run the whole maintenance resolution —
        // the purge may also have deleted the prior artifact the
        // maintenance legs would have read
        require(attempts > 1, s"$name: purge veto persisted across rebuilds")
        return readOrBuildMaintainedAttempt(
          s, name, inputs, params, attempts - 1)(full)(delta)(remove)(mixed)
      }
      // count maintenance builds only once their artifact has
      // published — a failed publish must not skew the
      // maintenance-costs-the-delta evidence counters; a mixed build
      // (fused or composed) attributes ONE delete + ONE delta build
      if (viaAppend.isDefined || viaMixed.isDefined)
        deltaBuilds.merge(name, 1, (a, b) => a + b)
      if (viaDelete.isDefined || viaMixed.isDefined)
        deleteBuilds.merge(name, 1, (a, b) => a + b)
      if (mixedFused)
        mixedFusedBuilds.merge(name, 1, (a, b) => a + b)
    }
    Scan.parquet(s, dest.toString)
  }

  /** The freshest prior artifact of `name` whose manifest is an
    * append-prefix of the current snapshot: same params, every listed
    * file present with identical (len, mtime) stats, and at least one
    * current file it doesn't have.  Returns its DataFrame + file list
    * — the seam a delta builder uses to read the PREVIOUS snapshot's
    * companion artifact (e.g. the pair delta reading the old index).
    */
  private[graft] def readPrior(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)]): Option[(DataFrame, Seq[String])] = {
    val conf = s.sparkContext.hadoopConfiguration
    val lines = statLines(s, inputs, params)
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    val dest = new Path(root, s"$name-${sha256(lines).take(16)}")
    findPrior(fs, root, name, dest, lines).map { case (dir, files) =>
      (Scan.parquet(s, dir.toString), files)
    }
  }

  /** Read the artifact keyed to EXACTLY this input file set, if fresh —
    * how a delta builder fetches a companion artifact of the same base
    * snapshot (e.g. the base pairs aligned with the base index).
    */
  private[graft] def readIfFresh(s: SparkSession, name: String, inputs: Seq[String],
      params: Seq[(String, String)]): Option[DataFrame] = {
    val conf = s.sparkContext.hadoopConfiguration
    val sig = sha256(statLines(s, inputs, params))
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    val dest = new Path(root, s"$name-${sig.take(16)}")
    if (isFresh(fs, dest, sig)) Some(Scan.parquet(s, dest.toString)) else None
  }

  private def findPrior(fs: FileSystem, root: Path, name: String, dest: Path,
      curLines: Seq[String]): Option[(Path, Seq[String])] = {
    if (!fs.exists(root)) return None
    val curFiles = fileLines(curLines)
    val curParams = paramLines(curLines)
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(s"$name-") && p.getName != dest.getName &&
        !p.getName.startsWith("."))
      .flatMap { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).flatMap { m =>
          val prevLines = m.linesIterator.toSeq
          val prevFiles = fileLines(prevLines)
          val isPrefix = paramLines(prevLines) == curParams &&
            prevFiles.nonEmpty && prevFiles.size < curFiles.size &&
            prevFiles.forall { case (f, st) => curFiles.get(f).contains(st) }
          if (isPrefix) Some((p, prevFiles.keys.toSeq.sorted)) else None
        }
      }
      .sortBy { case (_, files) => -files.size } // largest prefix wins
      .headOption
  }

  /** The freshest prior artifact of `name` whose manifest is a strict
    * SUPERSET of the current snapshot: same params, every current file
    * present in the prior with identical (len, mtime) stats, ≥ 1 prior
    * file no longer present — the pure-delete twin of [[findPrior]].
    * Returns the prior dir plus its full path → "len|mtime" stat map
    * (the only surviving record of the removed files' identities and
    * sizes).  The prior with the FEWEST removals wins: it is the
    * closest snapshot, so the delete set — and the rescore work — is
    * minimal.
    */
  private def findPriorSuperset(fs: FileSystem, root: Path, name: String, dest: Path,
      curLines: Seq[String]): Option[(Path, Map[String, String])] = {
    if (!fs.exists(root)) return None
    val curFiles = fileLines(curLines)
    val curParams = paramLines(curLines)
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(s"$name-") && p.getName != dest.getName &&
        !p.getName.startsWith("."))
      .flatMap { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).flatMap { m =>
          val prevLines = m.linesIterator.toSeq
          val prevFiles = fileLines(prevLines)
          val isSuperset = paramLines(prevLines) == curParams &&
            curFiles.nonEmpty && prevFiles.size > curFiles.size &&
            curFiles.forall { case (f, st) => prevFiles.get(f).contains(st) }
          if (isSuperset) Some((p, prevFiles)) else None
        }
      }
      .sortBy { case (_, files) => files.size } // fewest removals wins
      .headOption
  }

  /** The closest prior artifact for a MIXED change: same params, ≥ 1
    * manifest file no longer present (removed), ≥ 1 current file the
    * manifest lacks (appended), ≥ 1 shared file, and every SHARED path
    * stat-identical — a shared path with a different stat is a
    * rewrite, which no maintenance algebra covers, so such a prior is
    * disqualified.  Closest = most surviving files (largest shared
    * set), then fewest removals.  Returns the prior dir plus its full
    * path → "len|mtime" stat map (the removed files' only surviving
    * record, as in [[findPriorSuperset]]).
    */
  private def findPriorMixed(fs: FileSystem, root: Path, name: String, dest: Path,
      curLines: Seq[String]): Option[(Path, Map[String, String])] = {
    if (!fs.exists(root)) return None
    val curFiles = fileLines(curLines)
    val curParams = paramLines(curLines)
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(s"$name-") && p.getName != dest.getName &&
        !p.getName.startsWith("."))
      .flatMap { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).flatMap { m =>
          val prevLines = m.linesIterator.toSeq
          val prevFiles = fileLines(prevLines)
          val shared = prevFiles.keySet & curFiles.keySet
          val fits = paramLines(prevLines) == curParams && shared.nonEmpty &&
            (prevFiles.keySet -- curFiles.keySet).nonEmpty &&
            (curFiles.keySet -- prevFiles.keySet).nonEmpty &&
            shared.forall(f => prevFiles(f) == curFiles(f))
          if (fits) Some((p, prevFiles, shared.size)) else None
        }
      }
      .sortBy { case (_, prevFiles, nShared) => (-nShared, prevFiles.size) }
      .headOption
      .map { case (p, prevFiles, _) => (p, prevFiles) }
  }

  /** The largest artifact of `name` whose manifest files are a
    * sub-map of `within` (path and "len|mtime" stat both equal) under
    * the same params — how a DELETE builder locates the base-snapshot
    * companion artifact (bucket sidecar, DF sidecar) when some of the
    * base's files no longer exist on disk: the alignment check runs
    * manifest-vs-manifest, never a live stat.  Returns the artifact's
    * DataFrame plus its file list.
    */
  private[graft] def readWithin(s: SparkSession, name: String,
      within: Map[String, String],
      params: Seq[(String, String)]): Option[(DataFrame, Seq[String])] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val wantParams = params.sortBy(_._1).map { case (k, v) => s"param|$k|$v" }
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(s"$name-") && !p.getName.startsWith("."))
      .flatMap { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).flatMap { m =>
          val prevLines = m.linesIterator.toSeq
          val files = fileLines(prevLines)
          val fits = paramLines(prevLines) == wantParams && files.nonEmpty &&
            files.forall { case (f, st) => within.get(f).contains(st) }
          if (fits) Some((p, files)) else None
        }
      }
      .sortBy { case (_, files) => -files.size } // largest base wins
      .headOption
      .map { case (p, files) => (Scan.parquet(s, p.toString), files.keys.toSeq.sorted) }
  }

  /** Every artifact of `name` whose manifest params equal `params` and
    * whose file list INTERSECTS `within` with matching "len|mtime"
    * stats — the chunked-sidecar lookup (the co-purchase `cop_lines`
    * LSM): a chunk keyed to a file set that only PARTIALLY survives
    * still carries valid per-file rows for the surviving
    * (stat-identical) subset, so it is returned with exactly that
    * subset rather than discarded the way [[readWithin]]'s
    * whole-manifest alignment would.  Files absent from `within` or
    * recorded there with a different stat (rewritten) are excluded
    * from the valid set — THE CALLER MUST FILTER ROWS to the valid
    * files.  Returns (artifact DataFrame, valid file subset) per
    * matching chunk; chunks with an empty valid subset are omitted.
    */
  private[graft] def readAllWithin(s: SparkSession, name: String,
      within: Map[String, String],
      params: Seq[(String, String)]): Seq[(DataFrame, Seq[String])] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val wantParams = params.sortBy(_._1).map { case (k, v) => s"param|$k|$v" }
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(s"$name-") && !p.getName.startsWith("."))
      .flatMap { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).flatMap { m =>
          val prevLines = m.linesIterator.toSeq
          val valid = fileLines(prevLines).collect {
            case (f, st) if within.get(f).contains(st) => f
          }.toSeq.sorted
          if (paramLines(prevLines) == wantParams && valid.nonEmpty)
            Some((Scan.parquet(s, p.toString), valid))
          else None
        }
      }
  }

  /** Byte length recorded in a manifest "len|mtime" stat value. */
  private[graft] def statLen(st: String): Long =
    st.substring(0, st.indexOf('|')).toLong

  private def paramLines(lines: Seq[String]): Seq[String] = lines.filter(_.startsWith("param|"))

  private def fileLines(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith("file|")).map { l =>
      val rest = l.stripPrefix("file|")
      val cut = rest.lastIndexOf('|', rest.lastIndexOf('|') - 1)
      (rest.substring(0, cut), rest.substring(cut + 1)) // path -> "len|mtime"
    }.toMap

  private def readSmallFile(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }

  /** Write-to-temp + atomic publish, with the signature and the full
    * input manifest (the stat lines) riding inside the artifact — the
    * manifest is what makes a later snapshot's append detectable.
    */
  /** Returns true iff a fresh artifact is committed at `dest` (ours or
    * a racing identical build's); false iff the artifact was DROPPED
    * because its manifest intersects the purge tombstone ledger — a
    * takedown ran while this build was in flight, so the artifact
    * carries removed documents' derived data and must not survive.
    * On false the caller re-stats its inputs (the removed files are
    * gone from disk → new signature → a compliant rebuild).
    */
  private def publish(fs: FileSystem, root: Path, dest: Path, sig: String,
      lines: Seq[String], df: DataFrame): Boolean = {
    val tmp = new Path(root, s".${dest.getName}.tmp-${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val out = fs.create(new Path(tmp, "_SIG"))
    try out.write(sig.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val mf = fs.create(new Path(tmp, "_MANIFEST"))
    try mf.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8)) finally mf.close()
    // A concurrent identical build may have published while we built.
    // Check BEFORE renaming: on local filesystems a rename onto an
    // existing directory can merge tmp INSIDE dest (and return true)
    // instead of failing, which would leave a hidden duplicate copy.
    if (fs.exists(dest)) {
      fs.delete(tmp, true)
      require(isFresh(fs, dest, sig), s"materialize race left no fresh artifact at $dest")
      true
    } else if (!fs.rename(tmp, dest)) {
      // the race lost between the exists check and the rename; the
      // winner's bytes carry the same signature-keyed name
      fs.delete(tmp, true)
      require(isFresh(fs, dest, sig), s"materialize race left no fresh artifact at $dest")
      true
    } else {
      // rename semantics vary across Hadoop FS impls — a move-into-
      // existing-directory fallback can leave the whole tmp dir as a
      // hidden '.tmp-*' child inside dest; reap any such directory
      // (plain '.crc' sidecar files are left alone)
      fs.listStatus(dest)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("."))
        .foreach(h => fs.delete(h.getPath, true))
      // Purge-tombstone re-check, AFTER the rename: a concurrent
      // [[purgeContaining]] writes its ledger before scanning the root,
      // so either its scan sees this artifact (and deletes it) or this
      // check sees its ledger (and drops the artifact) — the in-flight-
      // build-publishes-after-purge compliance window is closed in both
      // interleavings.
      val purged = purgedSet(fs, root)
      if (purged.nonEmpty && fileLines(lines).exists { case (p, st) =>
            purged.get(p).exists(statMtime(st) <= _) }) {
        fs.delete(dest, true)
        false
      } else true
    }
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

  /** The current recursive data-file listing of an input dataset, as
    * the same fully-qualified path strings the _MANIFEST records — the
    * seam a builder uses to key a companion artifact on the files of
    * the snapshot it is building (so a later append's delta path gets
    * a signature-exact cache hit on that companion).
    */
  private[graft] def listFiles(s: SparkSession, input: String): Seq[String] =
    statList(s, input).map(_._1).sorted

  /** Total byte length of a set of data files — the cheap size signal
    * a delta builder's cost-based decline reads (stat-only, no data).
    */
  private[graft] def totalBytes(s: SparkSession, paths: Seq[String]): Long =
    paths.map(in => statList(s, in).map(_._2).sum).sum

  /** Recursive (qualified path, length) stat listing of one input. */
  private def statList(s: SparkSession, input: String): Seq[(String, Long)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = new Path(absolutize(input))
    statRec(p.getFileSystem(conf), p, acc)
    acc.toSeq.map { l =>
      // same parse as fileLines: the two final '|' fields are len|mtime
      val rest = l.stripPrefix("file|")
      val mtimeCut = rest.lastIndexOf('|')
      val lenCut = rest.lastIndexOf('|', mtimeCut - 1)
      (rest.substring(0, lenCut), rest.substring(lenCut + 1, mtimeCut).toLong)
    }
  }

  /** sha-256 hex over params + the sorted recursive (path, len, mtime)
    * stat listing of every input — a content-version key without
    * reading the data (mtime+length is the freshness contract object
    * stores and HDFS both honor).
    */
  private[graft] def signature(s: SparkSession, inputs: Seq[String],
      params: Seq[(String, String)]): String =
    sha256(statLines(s, inputs, params))

  private def sha256(lines: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The canonical param + input-stat line list — both the signature
    * preimage and the persisted _MANIFEST content.
    */
  private def statLines(s: SparkSession, inputs: Seq[String],
      params: Seq[(String, String)]): Seq[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    params.sortBy(_._1).foreach { case (k, v) => lines += s"param|$k|$v" }
    inputs.sorted.foreach { in =>
      val p = new Path(absolutize(in))
      val fs = p.getFileSystem(conf)
      statRec(fs, p, lines)
    }
    lines.toSeq
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

  /** COMPLIANCE purge: delete every retained artifact whose manifest
    * lists any of `removedFiles` as an input — the disk half of the
    * takedown story.  A GDPR/license takedown must remove the
    * documents' DERIVED data too (their pairs, edges, fingerprints
    * inside superseded artifacts), not merely stop serving it; [[gc]]
    * is age-based and would retain such an artifact for its whole TTL.
    * Exactly the artifacts built WHILE the removed files were present
    * match (their manifests list the files); artifacts of older
    * snapshots that predate the removed files carry none of their
    * data, don't match, and stay — so the emergent cheapest-prior
    * behavior (a takedown of recent epochs resolving as a cache hit
    * on the pre-append artifact) is compliant and survives the purge.
    *
    * ORDER CONTRACT: run the substrate refreshes FIRST (the delete
    * builders read the retained prior artifact as their input — see
    * [[graft.streaming.CorpusMaintain.takedownEpochPurge]] for the
    * sequenced form), then purge; the refreshed artifact is keyed to
    * the surviving snapshot, lists no removed file, and is untouched.
    * Artifacts are immutable and signature-keyed, so the purge is
    * always SAFE — worst case is a rebuild on next read.
    *
    * Paths are matched after the same qualification the manifests
    * record (`fs.makeQualified` — removed files no longer exist, so
    * they cannot be stat'ed).  Returns the deleted artifact names.
    *
    * CONCURRENCY: a build in flight during the purge is invisible to
    * the scan (its `.tmp-*` dir has no committed manifest), so the
    * purge also writes a timestamped tombstone ledger ([[PurgeLedger]])
    * BEFORE scanning; [[publish]] re-checks that ledger after its
    * rename and drops any artifact whose manifest lists a purged path
    * at a pre-purge mtime — between the two orderings no offending
    * artifact survives, without assuming a single writer.
    */
  def purgeContaining(s: SparkSession, removedFiles: Seq[String]): Seq[String] = {
    if (removedFiles.isEmpty) return Nil
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(absolutize(cacheRoot(s)))
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val doomed = removedFiles
      .map(f => fs.makeQualified(new Path(absolutize(f))).toString).toSet
    // Tombstone ledger FIRST, scan second: a build in flight during
    // this purge publishes its artifact only after re-checking the
    // ledger (see [[publish]]) — writing the ledger before the scan
    // means one of the two sides always sees the other, so no artifact
    // listing a purged input can survive either interleaving.  The
    // ledger is a union-on-write text file: concurrent purges are
    // last-writer-wins on the FILE but each writer unions the prior
    // contents, so a lost entry requires two purges racing within one
    // read-modify-write — and even then the loser's scan already
    // deleted every matching artifact on disk.
    val now = System.currentTimeMillis()
    writePurgeLedger(fs, root,
      purgedSet(fs, root) ++ doomed.map(_ -> now).toMap)
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => !p.getName.startsWith("."))
      .filter { p =>
        readSmallFile(fs, new Path(p, "_MANIFEST")).exists { m =>
          fileLines(m.linesIterator.toSeq).keys.exists(doomed.contains)
        }
      }
      .map { p => fs.delete(p, true); p.getName }
  }

  /** Purge tombstone ledger: `qualifiedPath|purgeEpochMs` per line
    * under the cache root, read by [[publish]]'s post-rename
    * compliance check.  The timestamp scopes the tombstone: an
    * artifact is doomed only if its manifest records the path with an
    * mtime ≤ the purge time — a later re-crawl that legitimately
    * re-creates the same filename produces manifests with a NEWER
    * mtime, which publish correctly lets through (a bare path
    * tombstone would doom every future snapshot of that file).
    */
  private val PurgeLedger = "_PURGED"

  private def purgedSet(fs: FileSystem, root: Path): Map[String, Long] =
    readSmallFile(fs, new Path(root, PurgeLedger))
      .map(_.linesIterator.filter(_.nonEmpty).map { l =>
        val cut = l.lastIndexOf('|')
        (l.substring(0, cut), l.substring(cut + 1).toLong)
      }.toList.groupMapReduce(_._1)(_._2)(math.max))
      .getOrElse(Map.empty)

  private def writePurgeLedger(fs: FileSystem, root: Path,
      entries: Map[String, Long]): Unit = {
    val out = fs.create(new Path(root, PurgeLedger), true)
    try out.write(entries.toSeq.sorted.map { case (p, t) => s"$p|$t" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** mtime component of a manifest "len|mtime" stat. */
  private def statMtime(st: String): Long =
    st.substring(st.indexOf('|') + 1).toLong

  /** Scheme-less paths are local-filesystem relative: absolutize against
    * the JVM cwd so the Hadoop Path doesn't resolve against fs.defaultFS's
    * working directory.
    */
  private def absolutize(path: String): String =
    // ":/" (not just "://") — Hadoop Path.toString renders the local
    // scheme as "file:/tmp/...", and manifest-recorded paths carry it
    if (path.contains(":/")) path
    else new java.io.File(path).getAbsolutePath
}
