package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{AnnIndex, Similarity}

/** Streaming ANN serving over a persisted IVF-PQ index — the
  * build/serve closure of the index story: [[Similarity.buildIvfPqIndex]]
  * builds and [[AnnIndex.write]] persists ONCE, then a live query
  * stream searches it micro-batch by micro-batch, the "vector lookup
  * service" image every retrieval pipeline ends in.
  *
  * Execution shape per micro-batch: the batch of query vectors runs the
  * EXACT batch search ([[Similarity.searchIvfPqIndex]]) as a
  * stream-static pattern — the streaming side is the tiny broadcast
  * query relation (probe pairs + ADC tables), the static side is the
  * cell-partitioned on-disk code relation, and the probe equi-join's
  * `cid` predicate prunes unprobed cell DIRECTORIES at the scan, so a
  * batch of q queries physically reads ~nprobe/C of the code files no
  * matter how large the index is.  Going through `foreachBatch` rather
  * than a hand-built incremental plan is deliberate: per-query top-k
  * has no cross-batch state (each query's answer is complete within
  * its batch), so the streaming query IS the batch query per epoch —
  * parity with the batch entry holds by construction and is
  * spec-pinned, and every future improvement to the batch search path
  * serves streams for free.
  *
  * At-least-once delivery: `sink` runs inside the checkpointed
  * foreachBatch epoch (the [[Frizzle]] ack discipline); an idempotent
  * sink (e.g. [[Sinks.idempotentParquet]]-style per-epoch overwrite)
  * upgrades it to effectively-once.
  */
object AnnServe {

  /** Start serving: each micro-batch of `queryStream` (any frame with
    * (vec_id, embedding), the [[Similarity.searchIvfPqIndex]] query
    * contract — ≤ its broadcast budget per batch) is searched against
    * `index` and the top-`k` result frame handed to `sink` with its
    * epoch id.  Empty batches skip the search (no probe scan, no sink
    * call).
    */
  def serve(index: AnnIndex, corpus: DataFrame, queryStream: DataFrame,
      k: Int, checkpoint: String, sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        if (!batch.isEmpty) sink(Similarity.searchIvfPqIndex(index, corpus, batch, k), epoch)
      }
      .start()

  /** Convenience: serve straight from an index directory on disk —
    * [[AnnIndex.read]] (tombstone-aware) + [[serve]].
    */
  def serveFrom(s: SparkSession, indexPath: String, corpus: DataFrame,
      queryStream: DataFrame, k: Int, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    serve(AnnIndex.read(s, indexPath), corpus, queryStream, k, checkpoint, sink)
}
