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
      // the generated-class cache defaults to 100 entries; a single
      // wide union query (ann_recall_report: ~200 codegen units) evicts
      // its own run-1 entries and re-compiles EVERY unit on every
      // execution (~200 × ~18 ms of Janino per run, measured r20).
      // 4096 entries holds the whole suite's units; compiled-class
      // memory is driver-side and bounded (static conf, read once at
      // first session creation).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run `body` with AQE disabled on `s` — for DRIVER-LOOP actions over
    * bounded-key aggregates (LR/BPE/Lloyd/pagerank-style trainer
    * iterations, each a collect of ≤ a few dozen rows).
    *
    * Why: under AQE every materialized shuffle stage is its OWN job, so
    * a trainer iteration that is one map-side-partial aggregate costs
    * 2+ job round-trips; without AQE the same action is ONE job
    * spanning the stages.  Per-job fixed cost (~30-45 ms in the r20
    * harness measurement) times 12-50 iterations dominated these
    * queries' wall at the driver's SF.  Scale-safe by scope: AQE's
    * value (runtime coalescing, skew splits) is in corpus-sized
    * exchanges; a trainer-loop aggregate ships ≤ keys×partitions
    * partial rows regardless of corpus size, so there is nothing for
    * AQE to adapt — the static `shuffle.partitions` reduce side is
    * bounded and the values are partitioning-independent either way.
    * The flag is restored in a finally; trainer loops are
    * single-threaded driver code (nothing else plans on the session
    * mid-loop in this engine).
    */
  def withoutAqe[T](s: SparkSession)(body: => T): T = {
    val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** [[withoutAqe]] plus a pinned reduce width for the scope — for
    * driver-loop aggregates whose KEY SPACE IS PROVABLY BOUNDED by the
    * caller (LR's dim+1 gradient keys, Lloyd's k·dim ≤ collect-budget
    * keys).  Measured (r20): AQE-off alone halves the per-iteration
    * job count but leaves the static `shuffle.partitions` reduce width
    * (32 near-empty tasks per iteration at the driver's SF — the task
    * launches ate the job saving); a bounded key space justifies
    * `partitions` = 1 at ANY corpus size because only map-side partial
    * rows (≤ keys × map-partitions, with the keys bound proven at the
    * call site) cross the exchange.  Both confs restore in a finally.
    */
  def boundedAgg[T](s: SparkSession, partitions: Int = 1)(body: => T): T = {
    val prevA = s.conf.get("spark.sql.adaptive.enabled", "true")
    val prevP = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try body finally {
      s.conf.set("spark.sql.adaptive.enabled", prevA)
      s.conf.set("spark.sql.shuffle.partitions", prevP)
    }
  }
}
