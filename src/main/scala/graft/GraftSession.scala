package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft defaults.
  *
  * Tuned for the local[32] test harness but cluster-safe: AQE owns
  * runtime partition coalescing and skew-join splitting, so the static
  * `shuffle.partitions` is only an upper bound that a real deployment
  * overrides with `--conf`.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // InferFiltersFromGenerate synthesizes `size(e) > 0 AND
      // isnotnull(e)` below every non-outer explode/posexplode and
      // predicate pushdown then carries it through Projects and
      // Exchanges down to the scan, re-substituting the generator
      // child each time.  For this engine's generators the child is
      // per-row COMPUTE (bpe_chunk_seqs, word_shingles, window_hashes,
      // split+transform chains), so the inferred filter (a) evaluates
      // that compute an extra time per row and (b) lands BELOW the
      // Scan.widen exchange, pinning the duplicated compute to the
      // scan's row-group width — the exact narrow-scan shape the
      // read-layer widen exists to prevent (measured r19: the sf10
      // chunk_docs_bpe residual at task/wall 1.9).  The filter is
      // result-redundant — a non-outer Generate already drops empty
      // and null arrays — so excluding the rule is value-identical on
      // every plan; the only thing lost is pre-shuffle pruning of
      // would-be-empty rows, worthless when deciding emptiness costs
      // the same compute the shuffle defers.  A stored-array explode
      // (where the filter would push to parquet for free) does not
      // occur in this engine's plans: every exploded array is derived.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
