package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Scan-width guard for compute-bound scans (the r18 §4 "narrow-scan
  * widening rule", promoted in r19 from per-operator calls in
  * [[graft.operators.Similarity]] to the ONE read-layer seam).
  *
  * The problem class: a compute-bound scan is only as parallel as the
  * scan's partitioning, and parquet written by a single writer often
  * lands as ONE row group — Spark plans byte-range splits, but every
  * split except the one holding the row group's start offset yields
  * zero rows, so the whole per-row compute (BPE encode, dot products,
  * simhash, audio decode) collapses onto ONE task while 31 cores idle.
  * Caught live on the r18 sf10 cold pass (one thread 500+ s inside
  * DotProduct at machine load ~1); r18 fixed the embedding side
  * per-operator, and the committed sf10 warm telemetry named the text
  * side next (chunk_docs_bpe 86.7 s, quality_lr 83.1 s, lm_score
  * 77.2 s, mm_audio_spectral 71.7 s, dedup_simhash 70.3 s — all
  * task≈wall, gc≈0: the same single-task shape).
  *
  * The guard: widen a narrower-than-cluster input to the scheduler's
  * width with one bounded round-robin shuffle of the projected input
  * bytes — trivial next to the compute it parallelizes — and NEVER
  * touch an input that is already wide, already shuffled, or too
  * small to matter:
  *
  *  - '''bytes gate''' (`minBytes`): below it one task finishes in
  *    sub-seconds and the shuffle would be pure overhead on every tiny
  *    query (measured r18 at sf0.1: ann_bruteforce 0.46→1.03 s with an
  *    ungated widen).  The read-layer default [[Scan.WidenMinBytes]]
  *    keeps every bundled-SF gate/bench plan byte-identical to r18
  *    (sf0.1 documents = 584 KB) while engaging at sf1 (5.8 MB) where
  *    the oracle hash gate can verify value-identity end-to-end.
  *    Row-gated callers (the τ-prune family gates on corpus rows it
  *    already counted) pass 0 to keep their own gate authoritative.
  *
  *  - '''shape gate''': only a scan-shaped plan (leaf / Project /
  *    Filter / alias) is probed and widened.  Anything else either
  *    already crossed an exchange — its width is
  *    `spark.sql.shuffle.partitions`, i.e. cluster width, so widening
  *    is a no-op that would still pay a shuffle — or carries an
  *    explicit user repartition/coalesce we must respect.  This also
  *    closes the r18 ADVICE hazard: probing `.rdd` on a plan with
  *    upstream exchanges makes AQE materialize those stages at
  *    plan-build time (an undocumented extra action on user corpora);
  *    a scan-shaped plan has no stages, so its `.rdd` conversion is
  *    pure planning.  (Known residual, documented not fixed: a plan
  *    whose exchange output AQE coalesced below cluster width stays
  *    narrow — coalescing targets ~64 MB/partition, so the residual is
  *    bounded compute; disable coalescing for pathological cases.)
  *
  *  - '''width probe''': for a parquet relation, the ROW-GROUP count
  *    from the file footers (see [[Scan.parquetScanUnits]] — planned
  *    split count lies about a one-row-group file); for any other
  *    leaf, `rdd.getNumPartitions` on the scan-shaped plan (no stages
  *    ⇒ no execution).  At 100 TB a real table is thousands of files
  *    ≥ cluster width and the guard is a structural no-op decided on
  *    the file listing alone; it never REDUCES partitioning.
  *
  * Value-neutrality: widening is a row-preserving repartition — every
  * consumer in this repo is partitioning-independent by the engine's
  * determinism discipline (order-insensitive/exact-decimal aggregates,
  * sorted limits, total-order presentation sorts), pinned hash-level
  * by the sf1 oracle gate where the read-layer guard ENGAGES
  * (ScanWidenSpec + the committed r19 sf1 gate run).
  */
object Scan {

  /** Read-layer engage threshold: comfortably above the bundled-SF
    * files (≤780 KB at sf0.1) so driver gate/bench plans are untouched,
    * comfortably below the first scale where single-task compute scans
    * cost minutes (sf1 documents 5.8 MB / embeddings 7.8 MB, sf10
    * ~58/31 MB).
    */
  val WidenMinBytes: Long = 4L << 20

  /** Inferred parquet schemas memoized by input signature — see
    * [[Scan.parquet]].  Values are pure `StructType`s (session-free,
    * tiny), so the map cannot pin a stopped session; the size guard
    * only matters to long test JVMs churning temp dirs.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** `spark.read.parquet` with the footer schema memoized per input
    * signature.
    *
    * Measured (r20, this harness): schema inference reads parquet
    * footers on the driver on EVERY `spark.read.parquet` call — ~70 ms
    * per call vs ~8 ms with an explicit schema.  Queries construct
    * 2–8 table/artifact reads each, so inference dominated query
    * CONSTRUCTION time in the driver bench (q9_profit: 0.37 s of its
    * 1.1 s total was construction).  A file set's schema is immutable,
    * so it is cached keyed by the (path, length, mtime) signature of
    * the listed leaves plus the schema-affecting session confs: any
    * rewrite/append/delete changes the signature and re-infers — the
    * [[Materialize]] freshness discipline applied to schemas.  The
    * LISTING still happens on every call (it IS the cache key), so a
    * caller can never read a stale file set; only the footer read is
    * skipped.  Scale-safe by construction: at 100 TB this saves a
    * footer fetch per query on thousand-file tables while Spark's own
    * `InMemoryFileIndex` listing (unchanged) remains the real cost.
    * Any listing failure falls back to the plain inferring read so
    * error behavior (missing path, empty dir) is identical.
    */
  def parquet(s: org.apache.spark.sql.SparkSession, paths: String*): DataFrame = {
    val sig =
      try {
        val conf = s.sparkContext.hadoopConfiguration
        val sb = new StringBuilder()
        // schema-affecting confs: two sessions with different parquet
        // type mappings must not share an inferred schema
        sb.append(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"))
        sb.append('|').append(s.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true"))
        paths.sorted.foreach { p =>
          val path = new Path(p)
          val fs = path.getFileSystem(conf)
          val st = fs.getFileStatus(path)
          if (st.isDirectory) {
            fs.listStatus(path).sortBy(_.getPath.getName).foreach { f =>
              val n = f.getPath.getName
              if (!n.startsWith("_") && !n.startsWith(".")) {
                sb.append('\n').append(f.getPath.toString)
                  .append('#').append(f.getLen).append('#').append(f.getModificationTime)
              }
            }
          } else {
            sb.append('\n').append(st.getPath.toString)
              .append('#').append(st.getLen).append('#').append(st.getModificationTime)
          }
        }
        Some(sb.toString())
      } catch { case scala.util.control.NonFatal(_) => None }
    sig match {
      case None => s.read.parquet(paths: _*)
      case Some(k) =>
        if (schemaCache.size > 4096) schemaCache.clear()
        val schema = schemaCache.computeIfAbsent(k, _ => s.read.parquet(paths: _*).schema)
        s.read.schema(schema).parquet(paths: _*)
    }
  }

  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case n: Project => scanShaped(n.child)
    case n: Filter => scanShaped(n.child)
    case n: SubqueryAlias => scanShaped(n.child)
    case _ => false
  }

  /** Effective scan parallelism of a parquet relation: the ROW-GROUP
    * count, not the planned split count.  Spark plans byte-range
    * splits at `totalBytes / cores` (floored at the 4 MB open cost),
    * so a one-row-group file still PLANS many partitions — but a row
    * group is readable by exactly one split, so every planned split
    * except the one holding its start offset yields ZERO rows and
    * `rdd.getNumPartitions` reports a parallelism the scan does not
    * have (this is precisely how the r16/r17 sf10 single-task scans
    * hid from a partition-count probe).  Footer metadata is the truth;
    * reading it costs one ~8-byte-indexed metadata fetch per file,
    * paid only when the relation has fewer files than the cluster has
    * slots (≥ `target` files is wide by construction — at 100 TB this
    * returns on the file count alone, no footer I/O).
    */
  private def parquetScanUnits(v: DataFrame, target: Int): Option[Int] = {
    val fsRel = v.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l.relation
    }.collect { case fs: HadoopFsRelation
        if fs.fileFormat.isInstanceOf[ParquetFileFormat] => fs }
    fsRel.map { fs =>
      val files = fs.location.inputFiles
      if (files.length >= target) files.length
      else {
        val conf = v.sparkSession.sessionState.newHadoopConf()
        var units = 0
        val it = files.iterator
        while (units < target && it.hasNext) {
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(it.next()), conf))
          try units += r.getRowGroups.size finally r.close()
        }
        units
      }
    }
  }

  /** Exact row count of a row-preserving parquet scan from footer
    * metadata — no job, no action.  `Some(n)` iff the plan is a bare
    * parquet relation under row-preserving nodes only (Project/alias;
    * a Filter changes the count and returns None).  Closes the r18
    * ADVICE contract gap on the `...For` entries: a materialized-table
    * corpus no longer pays the documented one-`count()` action just to
    * feed the τ/widen row gate — the footers already know n.  Cost:
    * one metadata read per file, same as [[parquetScanUnits]]; callers
    * fall back to `count()` for anything the footers can't answer.
    */
  def leafRowCount(v: DataFrame): Option[Long] = {
    def rowPreserving(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case n: Project => rowPreserving(n.child)
      case n: SubqueryAlias => rowPreserving(n.child)
      case _ => false
    }
    if (!rowPreserving(v.queryExecution.analyzed)) None
    else v.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l.relation
    }.collect { case fs: HadoopFsRelation
        if fs.fileFormat.isInstanceOf[ParquetFileFormat] => fs }
      .map { fs =>
        val conf = v.sparkSession.sessionState.newHadoopConf()
        fs.location.inputFiles.map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
          try r.getRecordCount finally r.close()
        }.sum
      }
  }

  /** Row count for the `...For` gate contracts: footer metadata when
    * the frame is a row-preserving parquet scan (free), one `count()`
    * action otherwise — the r18 one-count contract survives verbatim
    * as the fallback, a materialized table stops paying it.
    */
  def countFor(v: DataFrame): Long = leafRowCount(v).getOrElse(v.count())

  /** Widen `v` to the scheduler's width iff it is a scan-shaped plan,
    * at least `minBytes` of input (planner stats — file sizes for a
    * parquet scan, no execution), and effectively narrower than
    * `defaultParallelism` (row groups for parquet, planned partitions
    * otherwise).  Identity — the input frame itself — in every other
    * case.
    */
  def widen(v: DataFrame, minBytes: Long = WidenMinBytes): DataFrame = {
    val target = v.sparkSession.sparkContext.defaultParallelism
    val qe = v.queryExecution
    if (!scanShaped(qe.analyzed)) v
    else if (qe.optimizedPlan.stats.sizeInBytes < minBytes) v
    else parquetScanUnits(v, target) match {
      case Some(u) => if (u >= target) v else v.repartition(target)
      case None =>
        // non-parquet leaf (LocalRelation, csv, …): planned partitions
        // are the only cheap signal, and with no exchanges in the plan
        // the .rdd conversion is pure planning
        if (v.rdd.getNumPartitions >= target) v else v.repartition(target)
    }
  }
}
