package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the [[graft.sources.Materialize]] delta seam —
  * the deployment form a crawl pipeline actually runs: a stream of
  * incoming documents is appended to the corpus directory micro-batch
  * by micro-batch, and the delta-maintained substrates refresh after
  * each epoch, so the near-dup pair graph (and through it components
  * and every downstream consumer) stays live against the growing
  * corpus at batch cadence while each epoch costs the DELTA, not the
  * corpus.
  *
  * Epoch discipline (the [[Frizzle]]/[[AnnServe]] ack pattern): the
  * append and the refresh run inside the checkpointed foreachBatch
  * epoch.  The append is IDEMPOTENT per epoch — batch files are named
  * by epoch id and any files of a replayed epoch are deleted before
  * the re-write — so at-least-once delivery upgrades to an
  * effectively-once corpus append, and a crashed epoch's partial
  * files are overwritten on replay, never duplicated.  Artifact
  * freshness is Materialize's job, unchanged from the batch path:
  * each refresh re-keys on the corpus file stats, detects the append
  * prefix against the prior manifest and runs the registered delta
  * builder — including its cost-based declines — so stream-final ≡
  * batch-full value identity holds by construction (spec-pinned in
  * StreamingSpec, the same contract MaterializeSpec pins batch-side).
  *
  * The file moves use local-filesystem renames (the corpus layouts
  * the tests and probes exercise); on a cluster the same shape is an
  * object-store/HDFS rename — the epoch-keyed naming and
  * delete-before-rewrite idempotency carry over unchanged.
  */
object CorpusMaintain {

  /** Start maintaining: each micro-batch of `docStream` (any frame
    * schema-compatible with the corpus's documents table) is appended
    * to `corpusDir/documents.parquet`, then the delta-maintained
    * near-dup pair artifact refreshes and the resulting frame is
    * handed to `onEpoch` with its epoch id.  Empty batches skip both
    * (no append, no refresh, no callback).
    */
  def maintainNearDup(s: SparkSession, corpusDir: String, docStream: DataFrame,
      checkpoint: String,
      onEpoch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(batch.toDF(), s"$corpusDir/documents.parquet", epoch)
          onEpoch(graft.operators.Dedup.nearDupPairs(s, corpusDir), epoch)
        }
      }
      .start()

  /** Transactional twin of [[maintainNearDup]] — the message-stream
    * shape the frafka surface actually carries: each micro-batch of
    * order lines (schema-compatible with the lineitem table — at
    * minimum l_orderkey, l_partkey) appends to
    * `corpusDir/lineitem.parquet` under the same epoch-idempotent
    * naming, then the delta-maintained co-purchase pair artifact
    * refreshes ([[graft.operators.GraphOps.coPurchasePairs]]'s
    * additive order algebra: the epoch costs its own lines' pairs +
    * a semi-filtered prior scan, never the corpus self-join), so the
    * basket graph every recommender/k-core consumer reads stays live
    * at ingest cadence.  Stream-final ≡ batch-full value identity is
    * spec-pinned.
    */
  def maintainCoPurchase(s: SparkSession, corpusDir: String, lineStream: DataFrame,
      checkpoint: String,
      onEpoch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    lineStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(batch.toDF(), s"$corpusDir/lineitem.parquet", epoch)
          onEpoch(graft.operators.GraphOps.coPurchasePairs(s, corpusDir), epoch)
        }
      }
      .start()

  /** The embedding-side twin — keeps the kNN edge relation live
    * against an embedding stream (the ANN serving corpus's ingest
    * path): each micro-batch (schema-compatible with the embeddings
    * table — vec_id, embedding, label) appends to
    * `corpusDir/embeddings.parquet` under the same epoch-idempotent
    * naming, then the delta-maintained knn_edges artifact refreshes
    * ([[graft.operators.Similarity.knnJoinEmbeddings]]'s
    * appendToIndex algebra: encode/bucket only the new vectors,
    * recompute top-k only for ids with a new candidate — including
    * its MaxAppendFraction decline), so pagerank/communities/
    * label-noise consumers read a graph that is value-identical to a
    * full rebuild at every epoch.  With this, all THREE streaming
    * substrate families (document near-dup, transactional co-purchase,
    * embedding kNN) maintain through one idempotent epoch shape.
    */
  def maintainKnn(s: SparkSession, corpusDir: String, embStream: DataFrame,
      checkpoint: String,
      onEpoch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(batch.toDF(), s"$corpusDir/embeddings.parquet", epoch)
          onEpoch(graft.operators.Similarity.knnJoinEmbeddings(s, corpusDir), epoch)
        }
      }
      .start()

  /** The curation-funnel twin — keeps the stage-1–6 FLAG LEAF live
    * against a document stream (round 17: the last delta-maintained
    * substrate gains its epoch-wise streaming form).  Each micro-batch
    * appends to `corpusDir/documents.parquet` under the same
    * epoch-idempotent naming, then the flag artifact refreshes through
    * [[graft.operators.Pipeline.curationFlags]]'s maintenance — the
    * round-16 append delta (row-local flags for the batch only,
    * subset-window re-elections, decon over the composed 5-gram
    * sidecars) — so curation_report / curation_by_source /
    * decon_by_source read funnel numbers that are value-identical to
    * a batch full build at every epoch.  Takedowns ride
    * [[takedownEpoch]] unchanged: the next refresh detects the
    * pure-delete shape and runs the round-17 flag delete builder.
    */
  def maintainFlags(s: SparkSession, corpusDir: String, docStream: DataFrame,
      checkpoint: String,
      onEpoch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(batch.toDF(), s"$corpusDir/documents.parquet", epoch)
          onEpoch(graft.operators.Pipeline.curationFlags(s, corpusDir), epoch)
        }
      }
      .start()

  /** The materialized-ANN twin — the annix index tier's epoch-wise
    * streaming form (its batch algebra is the round-17 Materialize
    * seam wiring).  Each micro-batch (schema-compatible with the
    * embeddings table) appends to `corpusDir/embeddings.parquet` under
    * the same epoch-idempotent naming, then the per-snapshot index
    * artifacts refresh through
    * [[graft.operators.Similarity.annIndexed]]'s maintenance: the
    * MODEL relation carries verbatim across appends (the FAISS
    * add-after-train discipline — retrain only past the drift bound),
    * the CODES relation encodes ONLY the batch ([[graft.operators
    * .Similarity.appendToIndex]]'s algebra) as an unsorted LSM tail.
    * A query stream served off the artifact ([[AnnServe]]) therefore
    * reads an index that tracks ingest at batch-encode cost, never a
    * per-epoch retrain/re-encode.  Takedowns ride [[takedownEpoch]]
    * unchanged (survivor semi-join on the codes, carried model).
    * `onEpoch` receives the refreshed codes relation.
    */
  def maintainAnnIndex(s: SparkSession, corpusDir: String, embStream: DataFrame,
      checkpoint: String, variant: String = "ivfpq",
      onEpoch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(batch.toDF(), s"$corpusDir/embeddings.parquet", epoch)
          val (codes, _, _, _) =
            graft.operators.Similarity.annIndexed(s, corpusDir, variant)
          onEpoch(codes, epoch)
        }
      }
      .start()

  /** TAKEDOWN: remove one ingested epoch's files from a corpus
    * dataset — the retraction a GDPR/license request forces on a
    * crawl pipeline, at the same file granularity the stream ingests
    * at (the epoch is the natural takedown unit: "delete everything
    * batch N brought in").  Removing whole epoch files leaves every
    * survivor byte-identical, which is exactly the PURE-DELETE shape
    * [[graft.sources.Materialize.readOrBuildMaintained]] detects —
    * the next substrate read runs the registered delete builder
    * (dirty-set rescore + sidecar refresh) instead of a full rebuild,
    * and stream-final ≡ batch-over-survivors value identity holds by
    * construction (spec-pinned in StreamingSpec).  Idempotent: a
    * replayed takedown finds no files and is a no-op.  Returns the
    * number of files removed.
    */
  def takedownEpoch(corpusDir: String, dataset: String, epoch: Long): Int =
    takedownEpochFiles(corpusDir, dataset, epoch).length

  private def takedownEpochFiles(corpusDir: String, dataset: String,
      epoch: Long): Seq[java.io.File] = {
    val dest = new java.io.File(s"$corpusDir/$dataset")
    require(dest.isDirectory, s"corpus dataset dir missing: $dest")
    val doomed = Option(dest.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"part-epoch$epoch-")).toSeq
    doomed.foreach(f => require(f.delete(), s"takedown could not remove $f"))
    doomed
  }

  /** [[takedownEpoch]] plus the COMPLIANCE half of the delete story:
    * after the epoch's files are removed, `refresh` runs the caller's
    * substrate reads (e.g. `Dedup.nearDupPairs` /
    * `Similarity.knnJoinEmbeddings` — each detects the pure-delete
    * shape and runs its delete builder OFF THE RETAINED PRIOR
    * artifact), and only THEN [[graft.sources.Materialize
    * .purgeContaining]] drops every retained artifact whose manifest
    * lists a removed file — so the removed docs' derived data (pairs,
    * edges, fingerprints inside superseded artifacts) leaves the DISK,
    * not just the served artifact.  The sequencing is the point: purge
    * first and the delete algebra would lose its prior input and
    * decline to a full rebuild; refresh first and the new artifact —
    * keyed to the surviving snapshot, listing no removed file —
    * survives the purge while every pre-purge artifact built with the
    * removed files present is dropped.  Artifacts of snapshots that
    * PREDATE the removed epoch carry none of its data and stay, so
    * the emergent cheapest-prior shortcut cannot resurrect purged
    * data by construction.  Idempotent like [[takedownEpoch]]: a
    * replay removes nothing, refreshes a no-op, purges nothing.
    * Returns (files removed, artifact names purged).
    */
  def takedownEpochPurge(s: SparkSession, corpusDir: String, dataset: String,
      epoch: Long)(refresh: => Unit): (Int, Seq[String]) = {
    val removed = takedownEpochFiles(corpusDir, dataset, epoch)
    if (removed.nonEmpty) refresh
    val purged = graft.sources.Materialize.purgeContaining(
      s, removed.map(_.getPath))
    (removed.length, purged)
  }

  /** Idempotent filesystem append: write the batch to a staging dir
    * that is a SIBLING of the dataset dir (same filesystem, so the
    * per-file rename is the atomic syscall — `java.io.File.renameTo`
    * cannot cross mount points, and a /tmp staging dir fails every
    * epoch on hosts where /tmp is tmpfs), delete any prior files of
    * the same epoch (the replay case), then move the part files into
    * the live dataset under epoch-keyed names.  The staging dir (with
    * its _SUCCESS and .crc sidecars) is deleted in a finally so a
    * long-running stream leaks nothing per epoch.  Old files are
    * never touched — the pure-append shape Materialize's prefix
    * detection keys on.
    */
  private[graft] def appendEpoch(batch: DataFrame, destDir: String, epoch: Long): Unit = {
    val dest = new java.io.File(destDir)
    require(dest.isDirectory, s"corpus dataset dir missing: $destDir")
    val tmp = new java.io.File(dest.getParentFile,
      s".graft_epoch_staging-${dest.getName}-$epoch")
    try {
      batch.write.mode("overwrite").parquet(tmp.getPath)
      dest.listFiles().filter(_.getName.startsWith(s"part-epoch$epoch-"))
        .foreach(f => require(f.delete(), s"could not delete replayed epoch file $f"))
      tmp.listFiles().filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (f, i) =>
          val to = new java.io.File(dest,
            s"part-epoch$epoch-$i-${f.getName.stripPrefix("part-")}")
          require(f.renameTo(to), s"epoch append move failed for $f")
        }
    } finally rmTree(tmp)
  }

  /** Recursive delete for the staging dir's finally-cleanup: a write
    * that fails midway can leave a non-empty `_temporary` subdirectory,
    * on which a flat `listFiles().foreach(_.delete())` fails silently
    * and leaks one dot-prefixed staging dir per failed epoch.
    */
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
