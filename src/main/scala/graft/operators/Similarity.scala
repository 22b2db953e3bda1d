package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKScoredAgg
import graft.functions.VectorFunctions._
import graft.sources.{Scan, Tables}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `annBruteforce` is the exact baseline: broadcast the (small) query
  * set against the corpus and keep top-k per query.  `annLsh` is the
  * scale path: L random-hyperplane tables × b bits bucket the corpus so
  * a query only scores its bucket cohort — the shuffle is keyed by
  * (table, bucket) and touches a vanishing fraction of the corpus.
  * `annIvf` is the quantizer path: a coarse k-means splits the corpus
  * into cells and queries probe only the nearest few.
  *
  * All three broadcast the QUERY side — that is what keeps the plans
  * corpus-scan-shaped — so |Q| must be O(1) in corpus size.  The named
  * driver entries use a fixed-size deterministic fixture
  * ([[QueryCap]]); the `...For` variants accept a user query frame and
  * enforce [[MaxQueries]] loudly instead of OOMing an executor
  * mid-join.
  */
object Similarity {

  /** Hard cap on a user-supplied query frame: the query side is
    * broadcast to every executor, so it must stay a few tens of MB —
    * 65,536 queries × (64-double embedding + ids) ≈ 35 MB.  Larger
    * query sets are a different problem shape (corpus×corpus join):
    * route them through [[Dedup.dedupEmbeddingLsh]]-style bucketing
    * instead.
    */
  val MaxQueries = 65536

  /** Driver-collect budget for [[kmeansTrain]]: each Lloyd pass
    * collects ≤ k·dim (cid, pos, decimal-sum) rows — ~50 B each, so
    * 2²⁴ cells ≈ 800 MB of driver heap at the very worst.  Every other
    * driver action in this file is contract-bounded (MaxQueries, the
    * ≤64k training sample, the O(1) model relation); this pins the one
    * that scales with a user-chosen k·dim product.
    */
  private[operators] val KmeansCollectBudget = 1L << 24

  /** Size of the built-in deterministic query fixture.  The cap (with
    * the ascending-id total order) makes |Q| independent of corpus
    * size: every 100th vector WITHOUT a cap is n/100 rows — a broadcast
    * and a scored set that grow linearly with the corpus, the classic
    * hidden O(n²/100).
    */
  private[graft] val QueryCap = 1024

  /** Query fixture: the first [[QueryCap]] of every-100th vectors in
    * ascending id order — deterministic, SF-independent, and O(1) in
    * corpus size.  orderBy+limit plans as TakeOrderedAndProject: each
    * partition keeps ≤ cap rows and only the winners reach the driver.
    */
  private[graft] def queryVecs(v: DataFrame): DataFrame =
    v.filter(col("vec_id") % 100 === 0)
      .orderBy(col("vec_id"))
      .limit(QueryCap)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))

  /** Normalize any (vec_id, embedding) frame to (vec_id, e, nrm). */
  private def prep(raw: DataFrame): DataFrame =
    raw
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      // zero vectors have no direction: cosine would be NULL in Spark
      // and NaN in DuckDB — excluded identically on both sides
      .filter(col("nrm") > 0)

  private def vecs(s: SparkSession, dir: String): DataFrame =
    prep(Tables.embeddings(s, dir))

  /** User query frame → broadcast-ready (q_id, qe, qnrm), with the
    * [[MaxQueries]] contract enforced.  The limit+eager-checkpoint
    * runs the user's query pipeline exactly ONCE and materializes at
    * most MaxQueries+1 rows (bounded regardless of how large the
    * frame really is); the contract count and the downstream
    * broadcast both read the materialized leaf, so an expensive
    * upstream pipeline never executes twice.
    */
  private def asQueries(queries: DataFrame): DataFrame = {
    val q = prep(queries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))
      .limit(MaxQueries + 1)
      .localCheckpoint(eager = true)
    val nq = q.count()
    require(nq <= MaxQueries,
      s"query frame exceeds the $MaxQueries-row broadcast contract " +
        "(for corpus-sized query sets use an LSH-bucketed self-join instead)")
    q
  }

  /** Shared top-k tail: map-side combining [[TopKScoredAgg]] aggregator —
    * each partition carries ≤2k candidates per query, only the winners
    * cross the shuffle (a row_number window would shuffle every scored
    * row; at 100 TB that is the difference between shuffling |corpus|×|Q|
    * and |Q|×k).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    present(topKRows(scored, k))

  /** The top-k aggregate WITHOUT the presentation projection: (q_id,
    * rk, vec_id, cos) with cos at FULL precision.  Split out so the
    * [[annExactDf]] artifact can store exact doubles — rounding
    * before storage would make the maintained-merge's admission
    * filter and the bit-identity contract both lossy — while the
    * query surface keeps emitting the rounded presentation form.
    */
  private def topKRows(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(TopKScoredAgg.topKScored(col("cos"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).as("rk"), col("t.id").as("vec_id"),
        col("t.score").as("cos"))

  private def present(rows: DataFrame): DataFrame =
    rows.select(col("q_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("q_id"), col("rk"))

  /** Target corpus rows scored against the queries when deriving a τ
    * sample.  Selectivity of the resulting prune is ≈
    * kk/[[TauSampleRows]] of the candidate stream, so 4096 turns a
    * top-10 scan's aggregate input down ~400×.
    */
  private[graft] val TauSampleRows = 4096

  /** Bounded LAYOUT-INDEPENDENT corpus sample for the τ probe:
    * id-hash striding admits ≈ [[TauSampleRows]]..2× rows spread
    * uniformly over the corpus regardless of file order.  The r17
    * `limit(TauSampleRows)` read only the FIRST partitions — cheaper
    * (no full pass) but adversarial to layout: a corpus
    * range-partitioned or sorted by anything correlated with
    * similarity puts the 4096 WORST candidates first, and the sampled
    * kk-th score collapses to far below the true admission bound,
    * silently degrading the prune to ~no-op (exact either way — the
    * τ proof is per-subset — just slow exactly when the corpus is
    * curated).  xxhash64(vec_id) decorrelates the sample from both
    * file order and id assignment; the probe leg becomes one extra
    * codegen'd hash-filter scan, which at sf10 is single-digit
    * seconds against the ~150 s the prune saves per scan query.
    */
  private[graft] def tauSample(corpus: DataFrame, n: Long): DataFrame = {
    val stride = math.max(1L, n / TauSampleRows)
    corpus.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
  }

  /** τ-prune engages only when the corpus meaningfully exceeds the
    * sample: below this the sample IS (most of) the corpus, so the
    * probe pass roughly doubles the scan for no aggregate savings —
    * measured on the sf0.1 gate (~2k vectors): ann_bruteforce
    * 0.46→1.03 s WITH an ungated prune, vs the 2× WIN at sf1's 20k
    * (5.2→2.4 s) and the growing win beyond.  4×sample splits those
    * measured decades.
    */
  private[graft] val TauPruneMinRows = 4L * TauSampleRows

  /** Sampled admission threshold (τ-prune) for the broadcast-query
    * scored-scan family: compute each query's kk-th best score over a
    * bounded corpus sample, then drop scored pairs below it BEFORE the
    * top-k aggregate.
    *
    * Why: the scoring scan (join + score expression) runs inside
    * whole-stage codegen, but [[TopKScoredAgg]] is a
    * TypedImperativeAggregate whose update path evaluates per row in
    * interpreted mode — at |Q|·|corpus| candidate pairs that
    * interpreted tail dominates the query (measured: most of ann_pq's
    * sf10 cost).  A codegen'd `cos ≥ τ` filter in the scan stage cuts
    * the aggregate's input to roughly kk/|sample| of the stream.
    *
    * Why it is EXACT: for any sample S ⊆ candidates, the kk-th best
    * score in S is ≤ the kk-th best in the full stream, so `cos ≥ τ`
    * keeps a superset of every row that can place in the top kk —
    * including all ties at the admission boundary.  The aggregate's
    * result is bit-identical; only its input size changes.  Queries
    * with fewer than kk sampled candidates (small corpus, or a
    * filtered scan whose predicate misses the sample) get τ = −∞, i.e.
    * no pruning — the prune degrades to the old plan, never past it.
    *
    * `score` must map a corpus subset to (q_id, vec_id, cos) — it is
    * applied twice, once to the bounded sample and once to the full
    * corpus; both plans share the same broadcast query relation.
    *
    * `n` gates the prune ([[TauPruneMinRows]]): None (a caller
    * without a known corpus size) or a small corpus fall through to
    * the plain scan.  The `...For` public entries supply `n` via
    * [[graft.sources.Scan.countFor]] (r19): a materialized parquet
    * table answers from footer METADATA — no action at all — and
    * anything else pays the r18 one-count contract verbatim (one
    * `count()` at plan-build; a non-materialized corpus pipeline
    * re-executes under it, and a STREAMING frame throws on it —
    * streaming corpora are unsupported across this family; the top-k
    * aggregate and presentation sort are batch-only regardless).
    */
  /** Compute-bound broadcast scans are only as parallel as the scan's
    * partitioning — the r18 narrow-scan widening rule, since r19 the
    * shared [[graft.sources.Scan.widen]] read-layer seam (full
    * rationale there).  Internal corpora arrive pre-widened through
    * [[graft.sources.Tables.embeddings]]; these call sites remain for
    * the `...For` user-corpus paths, with `minBytes = 0` because each
    * site either gates on a corpus row count it already paid for
    * (τ-prune family) or is a cold build whose encode dominates any
    * input size.  The shape gate inside Scan.widen means a
    * user-supplied corpus with upstream exchanges is no longer probed
    * via `.rdd` (which would make AQE materialize those stages at
    * plan-build time — the r18 ADVICE hazard): a post-exchange plan is
    * already at cluster width.
    */
  private def widen(v: DataFrame): DataFrame =
    graft.sources.Scan.widen(v, minBytes = 0L)

  private def tauPrune(score: DataFrame => DataFrame, corpusIn: DataFrame,
      kk: Int, n: Option[Long]): DataFrame = {
    // below the prune gate the corpus is small enough that one task is
    // sub-second — widening there would add a shuffle to every tiny
    // query; the gated paths are exactly the compute-bound ones
    if (!n.exists(_ >= TauPruneMinRows)) return score(corpusIn)
    val corpus = widen(corpusIn)
    val noTau = lit(-1e300)
    val tau = tauThresholds(score, corpus, kk, n.get)
    score(corpus)
      .join(broadcast(tau), Seq("q_id"), "left_outer")
      .filter(col("cos") >= coalesce(col("tau"), noTau))
      .select(col("q_id"), col("vec_id"), col("cos"))
  }

  /** Per-query sampled admission thresholds: the kk-th best score
    * over the [[tauSample]] spread, −∞ for a query with fewer than kk
    * sampled candidates.  Split out of [[tauPrune]] so the layout-
    * robustness spec can observe the thresholds (and the implied
    * selectivity) directly.  collect_list+sort_array, not
    * TopKScoredAgg: the sample aggregate is itself interpreted-
    * update, and an append is ~free per row where a heap insert is
    * not; |sample|·|Q| doubles is ≤ 32 MB.
    */
  private[graft] def tauThresholds(score: DataFrame => DataFrame, corpus: DataFrame,
      kk: Int, n: Long): DataFrame = {
    val noTau = lit(-1e300)
    score(tauSample(corpus, n))
      .groupBy(col("q_id"))
      .agg(sort_array(collect_list(col("cos")), asc = false).as("ss"))
      .select(col("q_id"),
        when(size(col("ss")) >= kk, element_at(col("ss"), kk))
          .otherwise(noTau).as("tau"))
  }

  private def bruteforceRows(v: DataFrame, q: DataFrame, k: Int,
      n: Option[Long]): DataFrame = {
    def score(c: DataFrame) = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKRows(tauPrune(score, v, k, n), k)
  }

  private def bruteforce(v: DataFrame, q: DataFrame, k: Int,
      n: Option[Long] = None): DataFrame =
    present(bruteforceRows(v, q, k, n))

  /** Exact cosine top-10 per fixture query.  Since round 18 the
    * result rides the [[annExactDf]] artifact — build-once per corpus
    * snapshot through the Materialize seam, exactly like the trained
    * annix tier — so a warm invocation is a FileScan of |Q|·k rows
    * plus a trivial re-rank, not a |Q|·n corpus scan (the r17 warm
    * sf10 bench priced that scan at 189 s here plus 484 s re-paid
    * inside ann_recall_report).  The cold build is [[
    * annBruteforceInline]], so the artifact is bit-identical to the
    * inline scan by construction; the maintained append/delete paths
    * are VALUE-identical to a full rebuild (spec-pinned) — exact
    * search has no model state to carry, unlike the trained tier.
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame =
    present(topKRows(
      annExactDf(s, dir).select(col("q_id"), col("vec_id"), col("cos")), 10))

  /** The pre-artifact inline form (cold-build body of [[annExactDf]],
    * and the spec's reference): query side broadcast (bounded by
    * [[QueryCap]]), corpus scanned once with no shuffle of corpus
    * rows, τ-pruned, top-k map-side.  Exact all-pairs against the
    * FULL corpus is |Q|·n scoring work — the reference form the
    * approximate paths are judged against, priced for bounded |Q|.
    */
  private[graft] def annBruteforceInline(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    bruteforce(v, queryVecs(v), 10, Some(corpusSize(s, dir)))
  }

  /** Public exact-top-k entry for a user query set.  Both frames carry
    * (vec_id, embedding); `queries` must respect [[MaxQueries]]
    * (asserted).  Work is |Q|·|corpus| exact scoring — the right tool
    * for a bounded query set against any corpus size.  Same
    * plan-build-time contract as [[annIvfFor]]: n via
    * [[graft.sources.Scan.countFor]] — footer metadata for a
    * materialized parquet table, one `count()` action otherwise —
    * feeding the [[TauPruneMinRows]] gate on the sampled admission
    * threshold.
    */
  def annBruteforceFor(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    bruteforce(prep(corpus), asQueries(queries), k, Some(Scan.countFor(corpus)))

  // same |Q|·n scoring shape as the τ-pruned family → same narrow-
  // input widening (the predicate is cheap but the dot is not), under
  // the same size gate: below it one task is sub-second and the
  // shuffle would be pure overhead (sf0.1 A/B: 0.21→0.40 s ungated)
  private def rangeSearch(vIn: DataFrame, q: DataFrame, tau: Double,
      n: Option[Long] = None): DataFrame = {
    val v = if (n.exists(_ >= TauPruneMinRows)) widen(vIn) else vIn
    v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos6"))
      .orderBy(col("q_id"), col("vec_id"))
  }

  /** Radius (range) search: ALL neighbors with cosine ≥ τ per fixture
    * query, not a fixed k — the retrieval primitive when the question
    * is "everything at least this similar" (near-duplicate harvesting
    * around a probe set, contamination sweeps around known test docs).
    * Same broadcast-query corpus-scan shape as [[annBruteforce]], but
    * with NO top-k state at all: the τ predicate runs inside the scan
    * stage, so the operator is a pure scan-filter whose output — not
    * the corpus — is the only thing the presentation sort touches.
    */
  def annRange(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    rangeSearch(v, queryVecs(v), 0.2, Some(corpusSize(s, dir)))
  }

  /** Public radius-search entry for a user query set, under the same
    * [[MaxQueries]] broadcast contract (and the same one-action
    * materialization of `queries`) as [[annBruteforceFor]] — including
    * its one-`Scan.countFor(corpus)` contract (r18: feeds the widen gate).
    */
  def annRangeFor(corpus: DataFrame, queries: DataFrame, tau: Double): DataFrame =
    rangeSearch(prep(corpus), asQueries(queries), tau, Some(Scan.countFor(corpus)))

  /** Shared random-hyperplane machinery: 8 tables × b sign bits from a
    * fixed seeded gaussian matrix compiled into the plan as literals.
    * `hyperplaneBuckets(e, bits)` → `array<struct<tbl,bucket>>`.
    *
    * b is DERIVED FROM CORPUS SIZE: b = clamp(⌈log₂(n / 8)⌉, 6, 24), so
    * expected bucket occupancy stays ~8 per table at any n.  A fixed b
    * is a scale bug — 6 bits is 64 buckets forever, which makes
    * candidate volume Θ(n²/64); with b growing as log₂ n the per-query
    * cohort is Θ(tables · target_bucket) = O(1) rows regardless of
    * corpus size.  (At the spec corpus n=500 this derives b=6, so
    * small-scale results are identical to a hand-tuned setting.)
    */
  private[operators] val LshTables = 8

  def lshBitsFor(n: Long): Int =
    math.max(6, math.min(24,
      math.ceil(math.log(math.max(n, 1L) / 8.0) / math.log(2.0)).toInt))

  /** One native [[graft.functions.HyperplaneBuckets]] call: all
    * `tables × bits` sign-bit dot products in a single pass with the
    * plane matrix as a reference object.  Bucket values are
    * bit-identical to the literal construction it replaced (same RNG
    * stream order, same left-to-right fold — pinned by
    * SimilaritySpec against [[literalHyperplaneBuckets]]).
    */
  private[graft] def hyperplaneBuckets(e: Column, bits: Int): Column =
    graft.functions.HyperplaneBuckets.hyperplaneBuckets(e, LshTables, bits, 12345L)

  /** The unrolled-literal formulation the native expression replaced
    * (each plane's 64 literals once in the tree, `when(dot > 0)` per
    * bit) — kept as the parity reference for the spec.
    */
  private[graft] def literalHyperplaneBuckets(e: Column, bits: Int): Column = {
    val rnd = new scala.util.Random(12345)
    val tables = (0 until LshTables).map { t =>
      val bucket = (0 until bits).map { b =>
        val plane = array(Seq.fill(64)(rnd.nextGaussian()).map(lit): _*)
        when(dot(plane, e) > 0, lit(1L << (bits - 1 - b))).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    array(tables: _*)
  }

  private[graft] def normalizedVecs(s: SparkSession, dir: String): DataFrame = vecs(s, dir)

  /** Corpus row count for parameter derivation.  This IS a Spark job,
    * but a cheap one: a zero-column parquet scan reads row-group
    * metadata only.  Memoized per SNAPSHOT, not per path: the memo key
    * is the same (path, len, mtime) stat signature the Materialize
    * seam keys artifacts on (a driver-side file stat, no job), so a
    * pure cache-hit read of a maintained artifact — knn_pagerank /
    * knn_communities / label_noise_knn riding knn_edges — skips the
    * count job entirely, while ANY change to the files under the path
    * yields a new signature and a fresh count.  A plain path-keyed
    * memo would return stale counts after the data changes in a
    * long-lived session, silently mis-sizing buckets/cells — the
    * stat-signature key removes that hazard by construction.
    */
  private val corpusSizeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def corpusSize(s: SparkSession, dir: String): Long = {
    val key = graft.sources.Materialize.signature(
      s, Seq(s"$dir/embeddings.parquet"), Nil)
    // bound the memo (a long-lived session touching many snapshots):
    // entries are ~100 bytes, 4096 is plenty and a clear only costs a
    // re-count
    if (corpusSizeMemo.size > 4096) corpusSizeMemo.clear()
    // count OUTSIDE the map's bin lock: computeIfAbsent would hold the
    // bin for the whole Spark job, serializing unrelated keys that hash
    // to the same bin (and a re-entrant memo call inside the mapping
    // function throws).  A racing duplicate count is idempotent and
    // cheap (metadata-only scan), so putIfAbsent is the right trade.
    Option(corpusSizeMemo.get(key)).map(_.longValue()).getOrElse {
      val n = Tables.embeddings(s, dir).count()
      corpusSizeMemo.putIfAbsent(key, n)
      n
    }
  }

  private def lshSearch(v: DataFrame, q0: DataFrame, k: Int, bits: Int): DataFrame = {
    def buckets(e: Column): Column = hyperplaneBuckets(e, bits)
    val corpus = v.select(col("vec_id"), col("e"), col("nrm"), explode(buckets(col("e"))).as("tb"))
      .select(col("vec_id"), col("e"), col("nrm"), col("tb.tbl"), col("tb.bucket"))
    val q = q0
      .select(col("q_id"), col("qe"), col("qnrm"), explode(buckets(col("qe"))).as("tb"))
      .select(col("q_id"), col("qe"), col("qnrm"), col("tb.tbl"), col("tb.bucket"))
    // score FIRST, dedupe multi-table hits after: the cosine is
    // deterministic per (q, v) so duplicates are identical, and the
    // dedupe exchange then carries 3 skinny columns instead of two
    // 64-double arrays per row (which would also force the aggregate
    // into sort-based mode — array types have no mutable agg buffer)
    val scored = corpus.as("c").join(broadcast(q).as("q"),
        col("c.tbl") === col("q.tbl") && col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id"), col("c.vec_id"),
        (dot(col("q.qe"), col("c.e")) / (col("q.qnrm") * col("c.nrm"))).as("cos"))
      .dropDuplicates("q_id", "vec_id")
    topKPerQuery(scored, k)
  }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    lshSearch(v, queryVecs(v), 10, lshBitsFor(corpusSize(s, dir)))
  }

  /** Public LSH entry for a user query set ([[MaxQueries]] contract,
    * asserted).  Bucket width derives from the corpus row count — NOTE:
    * this `...For` entry runs actions at PLAN-BUILD time (the bounded
    * query materialization plus one `Scan.countFor(corpus)`), so `corpus`
    * should be a materialized (parquet-backed) table, where the count
    * is a metadata-only scan; on a derived frame it executes the full
    * upstream pipeline once per call.
    */
  def annLshFor(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    lshSearch(prep(corpus), asQueries(queries), k, lshBitsFor(Scan.countFor(corpus)))

  /** Approximate k-NN JOIN: top-k cosine neighbors in `right` for
    * EVERY row of `left` — the corpus×corpus retrieval shape the
    * [[MaxQueries]] broadcast contract exists to refuse, in its
    * scale-safe LSH-bucketed form (pair a fresh crawl with its nearest
    * curated docs, label a whole corpus by neighbors, build a kNN
    * graph for clustering).
    *
    * Shape: only 24 B/row bucket KEYS ride the bucket exchange and the
    * bipartite bucket join ([[Dedup.dedupMinhash]]'s trade — never the
    * 512 B embeddings); candidate (l, r) pairs dedupe across the 8
    * tables; both sides' vectors come back by ID joins just for the
    * surviving candidates; [[TopKScoredAgg]] then keeps ≤2k rows per
    * left id map-side, so the final shuffle is |left|·k.  Candidate
    * volume is Σ_bucket |L_b|·|R_b| with bucket width growing as
    * log₂ n ([[lshBitsFor]]) — O(1) expected cohort per row at any
    * corpus size, and AQE skew-splits a hot bucket.  Approximate by
    * construction → rows-only oracle; the spec pins recall against
    * exact bruteforce on the fixture queries.
    */
  /** Candidate stage of [[knnJoin]]: deduped (lid, vec_id) pairs with
    * a `hits` column counting how many of the 8 LSH tables the pair
    * collided in.  The count rides the SAME exchange a bare
    * dropDuplicates would take (a keyed aggregate with map-side
    * partials over the 16 B/row pair keys), so exposing it is free —
    * it exists as a diagnostic and as the measurement surface for
    * candidate-pruning experiments.
    *
    * MEASURED, then REJECTED (round 8): pruning pairs with `hits < 2`
    * before the vector rejoin looks like a cheap plan win, but at the
    * derived bucket widths one-table collisions ARE the signal: at
    * sf0.01 (n=500, b=6) 93% of candidate pairs collide in exactly
    * one table and the prune drops avg recall@10 0.180 → 0.020; at
    * sf0.1 (n=2000, b=8) 98% are one-table and recall falls 0.150 →
    * 0.055 even with a per-lid keep-best fallback (coverage 80%
    * without it).  A per-lid top-64-by-hits cap keeps full coverage
    * but still cuts sf0.1 recall to 0.120 — hit count is too coarse a
    * similarity proxy at log₂(n/8) bits, where a true neighbor's
    * per-table collision probability is well under 1.  The candidate
    * exchange is skinny and the scoring join is bounded by
    * Σ_bucket |L_b|·|R_b| with O(1) expected cohorts, so the unpruned
    * plan IS the scale plan.
    */
  private[graft] def knnJoinCandidates(left: DataFrame, right: DataFrame,
      bits: Int, excludeSelf: Boolean = true): DataFrame = {
    val l = prep(left).select(col("vec_id").as("lid"), col("e").as("le"))
    val r = prep(right)
    val lb = l.select(col("lid"), explode(hyperplaneBuckets(col("le"), bits)).as("tb"))
      .select(col("lid"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val rb = r.select(col("vec_id"), explode(hyperplaneBuckets(col("e"), bits)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val joined = lb.hint("merge").join(rb.hint("merge"), Seq("tbl", "bucket"))
    (if (excludeSelf) joined.filter(col("lid") =!= col("vec_id")) else joined)
      .groupBy(col("lid"), col("vec_id")).agg(count(lit(1)).as("hits"))
  }

  /** Scoring stage of [[knnJoin]]: both sides' vectors come back by ID
    * joins for the surviving candidate pairs only, then
    * [[TopKScoredAgg]] keeps ≤2k rows per left id map-side.
    */
  private[graft] def knnJoinScore(left: DataFrame, right: DataFrame,
      cand: DataFrame, k: Int): DataFrame = {
    val l = prep(left)
      .select(col("vec_id").as("lid"), col("e").as("le"), col("nrm").as("lnrm"))
    val r = prep(right)
    val scored = cand
      .join(l.hint("merge"), "lid")
      .join(r.hint("merge"), "vec_id")
      .select(col("lid").as("q_id"), col("vec_id"),
        (dot(col("le"), col("e")) / (col("lnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** `excludeSelf` controls the `lid =!= vec_id` candidate filter:
    * true (default) for the self-join shape (kNN graph over one
    * corpus), where an id paired with itself is a degenerate cos = 1
    * "neighbor"; pass FALSE when left and right are DIFFERENT corpora
    * (fresh crawl vs curated docs) — there numerically coinciding ids
    * are distinct documents, and the filter would silently drop
    * legitimate neighbor pairs.
    */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int, bits: Int,
      excludeSelf: Boolean = true): DataFrame =
    knnJoinScore(left, right,
      knnJoinCandidates(left, right, bits, excludeSelf)
        .select(col("lid"), col("vec_id")), k)

  /** Driver entry: the embedding corpus kNN-joined against itself
    * (k = 5, self-pairs excluded) — the kNN-graph build, materialized
    * once per corpus snapshot ([[graft.sources.Materialize]]): the
    * knn_join query, knn_pagerank and knn_communities all consume this
    * edge relation, and at 100 TB the LSH-bucketed self-join is the
    * expensive stage all three would otherwise replay.  Deterministic
    * build (seeded hyperplanes, exact top-k tie order), so read-back
    * is bit-identical to the inline join.
    */
  def knnJoinEmbeddings(s: SparkSession, dir: String): DataFrame = {
    // the bit width rides in the PARAMS even though it is derived from
    // the inputs (same files ⇒ same bits, so keying is unchanged):
    // the prior-artifact detection requires param equality, so any
    // snapshot change that crosses an [[lshBitsFor]] step makes BOTH
    // maintenance shapes miss structurally and the full rebuild is
    // automatic — without this, a shrink across a step could still
    // find an ANCIENT bucket sidecar at the new width inside the prev
    // manifest and wrongly carry rows bucketed at the old width
    val bits = lshBitsFor(corpusSize(s, dir))
    graft.sources.Materialize.readOrBuildMaintained(s, "knn_edges",
      inputs = Seq(s"$dir/embeddings.parquet"),
      params = Seq("k" -> "5", "bits" -> bits.toString, "ver" -> "1")) {
      // a full (re)build compacts: the current snapshot becomes the
      // new base, so pay its bucket sidecar now (one encode pass the
      // build runs anyway) — every later append then buckets ONLY its
      // new vectors (the eager-sidecar discipline from the pair delta)
      val emb = Tables.embeddings(s, dir)
      knnBaseBuckets(s,
        graft.sources.Materialize.listFiles(s, s"$dir/embeddings.parquet"), bits)
      knnJoin(emb, emb, 5, bits)
    } { (prevEdges, prevFiles, deltaFiles) =>
      knnEdgesDelta(s, dir, prevEdges, prevFiles, deltaFiles)
    } { (prevEdges, prevStats, removedFiles) =>
      knnEdgesDelete(s, bits, prevEdges, prevStats, removedFiles)
    }
  }

  /** The (vec_id, tbl, bucket) LSH assignment of an explicit BASE file
    * set, materialized once per base snapshot — the persisted-index
    * half of [[knnEdgesDelta]]'s appendToIndex algebra: an appended
    * snapshot's bucket table is composed LAZILY as base FileScan ∪
    * encode(appended), so an append never re-encodes (or rewrites) the
    * corpus-sized assignment.
    */
  private def knnBaseBuckets(s: SparkSession, baseFiles: Seq[String], bits: Int): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "knn_buckets", baseFiles,
      Seq("bits" -> bits.toString, "tables" -> LshTables.toString, "ver" -> "1")) {
      bucketsOf(graft.sources.Scan.parquet(s, baseFiles: _*).select(col("vec_id"), col("embedding")), bits)
    }

  private def bucketsOf(vecsRaw: DataFrame, bits: Int): DataFrame =
    prep(vecsRaw)
      .select(col("vec_id"), explode(hyperplaneBuckets(col("e"), bits)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))

  /** Incremental kNN-graph maintenance on append — the
    * [[appendToIndex]] algebra applied to the edge substrate, aligned
    * at the BASE snapshot (the one whose bucket sidecar exists).
    * Under append the corpus only grows, so an existing lid's
    * candidate set can only GAIN the new vectors that share a bucket
    * with it — and for ANY deterministic total order (the scorer's is
    * score desc, id asc), topK(A ∪ B) = topK(topK(A) ∪ B).  So a
    * dirty lid needs exactly: its PREVIOUS top-k rescored (exact
    * doubles — the dot is deterministic) merged with its NEW
    * collisions, never a re-scan of its whole candidate set.  Per
    * append: encode ONLY this batch's vectors (the hyperplanes are
    * seeded constants; base assignments read back as a FileScan of
    * the sidecar), ONE broadcast join batch×composed finds every
    * collision involving a batch vector — which yields, in both
    * orientations, the existing lids' new candidates AND the new
    * lids' full candidate sets — and the scorer runs over
    * (prev-top-k ∪ new-collision) pairs only; clean lids carry over
    * bit-identically.  Nothing corpus-sized is recomputed or
    * shuffled: the composed assignment streams once through the
    * broadcast join, and the remaining corpus-sized term is the
    * artifact REWRITE (k rows per vector — the carried rows pass
    * through to the new parquet), the honest floor of maintaining a
    * materialized graph as one plain-FileScan artifact.
    *
    * Declines (→ full rebuild, which compacts) when: the bucket
    * sidecar for the base is missing; the appended corpus crosses an
    * [[lshBitsFor]] bucket-width step, which re-keys every bucket; or
    * the cumulative append exceeds the compaction fraction (the
    * [[graft.operators.Dedup.MaxAppendFraction]] discipline).
    */
  /** Byte budget on the APPEND BATCH's parquet files above which the
    * delta's collision join drops its forced `broadcast` hint.  The
    * hint exists for the streaming-cadence epoch — a few thousand
    * vectors whose 8-rows-each bucket table is a trivially
    * broadcastable relation, where the single-stage plan avoids
    * shuffling the corpus-sized composed assignment.  But the only
    * OTHER bound on this path, [[graft.operators.Dedup
    * .MaxAppendFraction]], is relative to BASE bytes: at a 100 TB
    * corpus it admits a one-shot 30 TB append whose bucket table a
    * forced hint would still try to broadcast, bypassing AQE's own
    * threshold and OOMing executors + driver instead of degrading.
    * Past this budget the join runs un-hinted on (tbl, bucket) and
    * AQE picks the strategy from measured sizes.  The delta parquet
    * bytes are a free file-stat and an over-estimate of batchB's
    * in-memory size (the files carry the full embedding vectors;
    * batchB is 8 skinny (id, tbl, bucket) rows per vector), so the
    * gate errs on the safe side.  Overridable for spec engineering
    * via `spark.graft.delta.knnBroadcastBytes`.
    */
  private[graft] val KnnDeltaBroadcastBytesDefault = 256L << 20

  private[graft] def knnDeltaBroadcastBytes(s: SparkSession): Long =
    s.conf.get("spark.graft.delta.knnBroadcastBytes",
      KnnDeltaBroadcastBytesDefault.toString).toLong

  private def knnEdgesDelta(s: SparkSession, dir: String, prevEdges: DataFrame,
      prevFiles: Seq[String], deltaFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val nAll = corpusSize(s, dir)
    val bits = lshBitsFor(nAll)
    // the freshest base with a bucket sidecar at the CURRENT bit width;
    // bits are stable across ~8x growth (lshBitsFor steps per doubling
    // of n/8), so a step change simply compacts
    val prior = M.readPrior(s, "knn_buckets", Seq(s"$dir/embeddings.parquet"),
      Seq("bits" -> bits.toString, "tables" -> LshTables.toString, "ver" -> "1"))
    if (prior.isEmpty) return null
    val (baseBuckets, baseFiles) = prior.get
    val appended = ((prevFiles ++ deltaFiles).toSet -- baseFiles).toSeq.sorted
    if (appended.isEmpty) return null
    val maxFrac = graft.operators.Dedup.maxAppendFraction(s)
    if (M.totalBytes(s, appended) > maxFrac * M.totalBytes(s, baseFiles)) return null
    val composedB = baseBuckets.unionByName(bucketsOf(
      graft.sources.Scan.parquet(s, appended: _*).select(col("vec_id"), col("embedding")), bits))
    // every collision involving a vector of THIS batch (earlier
    // appends are already reflected in prevEdges), both orientations
    val batchB = bucketsOf(
      graft.sources.Scan.parquet(s, deltaFiles: _*).select(col("vec_id"), col("embedding")), bits)
    val hits = knnCollisionHits(composedB, batchB,
      batchBytes = M.totalBytes(s, deltaFiles),
      budgetBytes = knnDeltaBroadcastBytes(s))
      .localCheckpoint(eager = true)
    val newCand = hits.select(col("cid").as("lid"), col("nid").as("vec_id"))
      .unionByName(hits.select(col("nid").as("lid"), col("cid").as("vec_id")))
      .distinct()
    val dirtyIds = newCand.select(col("lid").as("vec_id")).distinct()
    // the dirty lids' previous top-k re-enter the scorer as candidate
    // pairs (their cosines recompute to the same doubles), so the
    // per-lid merge is topK(prevTopK ∪ newCollisions) — exact
    val prevTop = prevEdges
      .join(dirtyIds.select(col("vec_id").as("q_id")), Seq("q_id"), "left_semi")
      .select(col("q_id").as("lid"), col("vec_id"))
    val cand = newCand.unionByName(prevTop).distinct()
    val all = Tables.embeddings(s, dir)
    val fresh = knnJoinScore(all, all, cand, 5)
    val carried = prevEdges
      .join(dirtyIds.select(col("vec_id").as("q_id")), Seq("q_id"), "left_anti")
    carried.unionByName(fresh)
  }

  /** Takedown maintenance for the kNN edge substrate — the
    * [[deleteFromIndex]] algebra applied to the materialized graph:
    * under DELETE the corpus only shrinks, so an existing lid's
    * candidate set can only LOSE members — a lid whose previous top-k
    * contains no removed id keeps its rows BIT-IDENTICALLY (removal
    * cannot add candidates), and a "dirty" lid (one that lost a
    * neighbor) needs its top-k REFILLED from its full bucket-collision
    * candidate set within the surviving corpus, because the evicted
    * slot's replacement is whatever ranked k+1th — information the
    * artifact no longer holds.  Removed ids never need enumerating:
    * a prev edge row's neighbor validity is a join against the
    * surviving id relation (the removed files are gone, so their
    * vectors simply don't exist).  Work: one skinny id scan, one
    * k·n-row validity join (the same linear floor as the artifact
    * rewrite), one survivor encode pass refreshing the bucket sidecar
    * (which the NEXT append or takedown then hits as its aligned
    * base — without the refresh every second maintenance step would
    * decline for want of alignment), and bucket re-probe + rescore
    * for the dirty lids only — |dirty| ≲ k · |removed| in
    * expectation.  Saved vs full: the corpus-wide collision join and
    * the score-everything pass.
    *
    * Declines (→ full rebuild, which compacts) when the removed bytes
    * exceed the [[graft.operators.Dedup.MaxAppendFraction]] fraction
    * of the prev corpus (per the prior manifest's recorded lengths —
    * removed files cannot be live-stat'ed), where compaction wins.
    * A shrink across an [[lshBitsFor]] step never reaches this
    * builder at all: the bit width rides in the artifact params
    * (see [[knnJoinEmbeddings]]), so prior detection itself misses
    * and the full rebuild is structural.
    *
    * Everything derives from `prevStats − removed`, NEVER the live
    * directory listing: under the pure-delete shape the two coincide,
    * but under the round-16 MIXED composition (remove∘delta) the
    * appended files are already on disk when this leg runs, and a
    * live read would leak them into the survivor state.  `bits` comes
    * from the caller for the same reason — it is the artifact's
    * params value, shared by the prior and the snapshot under build.
    */
  private def knnEdgesDelete(s: SparkSession, bits: Int, prevEdges: DataFrame,
      prevStats: Map[String, String], removedFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val removedBytes = removedFiles.map(f => M.statLen(prevStats(f))).sum
    val prevBytes = prevStats.values.map(M.statLen).sum
    if (removedBytes > graft.operators.Dedup.maxAppendFraction(s) * prevBytes) return null
    // refresh the sidecar FOR THE SURVIVORS (one linear encode pass +
    // skinny write — the eager-sidecar discipline): it is this
    // delete's clean candidate table (no stale assignments for
    // removed vectors) AND the base alignment the NEXT maintenance
    // step (append delta or another takedown) gets as a cache hit —
    // without it, every second maintenance step would decline to a
    // full rebuild for want of an aligned sidecar
    val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
    val curB = knnBaseBuckets(s, survivors, bits)
    val emb = graft.sources.Scan.parquet(s, survivors: _*)
    val curIds = emb.select(col("vec_id"))
    // one pass over the k·n prev rows: drop removed lids, split the
    // survivors into carried (every neighbor still present — rows
    // carry bit-identically) and dirty (≥ 1 neighbor removed — top-k
    // must refill from the full surviving candidate set)
    val tagged = prevEdges
      .join(curIds.select(col("vec_id").as("q_id")), Seq("q_id"), "left_semi")
      .join(curIds.select(col("vec_id").as("nok")).withColumn("ok", lit(true)),
        col("vec_id") === col("nok"), "left")
    val lidLoss = tagged.groupBy(col("q_id"))
      .agg(max(when(col("ok").isNull, 1).otherwise(0)).as("lost"))
      .localCheckpoint(eager = true)
    val dirtyLids = lidLoss.filter(col("lost") === 1).select(col("q_id"))
    val carried = prevEdges
      .join(lidLoss.filter(col("lost") === 0).select(col("q_id")), Seq("q_id"), "left_semi")
    // dirty refill: full bucket re-probe within the surviving corpus —
    // no forced broadcast (|dirty| is data-dependent; AQE picks from
    // measured sizes, the knnCollisionHits discipline)
    val dirtyB = curB.join(dirtyLids.withColumnRenamed("q_id", "vec_id"),
      Seq("vec_id"), "left_semi")
    val cands = dirtyB.as("d").join(curB.as("c"), Seq("tbl", "bucket"))
      .filter(col("d.vec_id") =!= col("c.vec_id"))
      .select(col("d.vec_id").as("lid"), col("c.vec_id").as("vec_id"))
      .distinct()
    val fresh = knnJoinScore(emb, emb, cands, 5)
    carried.unionByName(fresh)
  }

  /** The delta's collision join — every (composed, batch) bucket
    * co-occurrence, self-pairs dropped.  Force-broadcasts ONLY a
    * budget-bounded batch: batchB is exactly [[LshTables]] skinny rows
    * per appended vector, so the batch's parquet bytes (a pure
    * file-stat, embedding-dominated — hence an over-estimate of
    * batchB's in-memory size) bound it for free.  The
    * MaxAppendFraction decline is relative to BASE bytes and admits a
    * one-shot append far past broadcastable size at large corpora; a
    * forced hint there would bypass AQE's own threshold and OOM
    * executors + driver instead of degrading.  Small
    * (streaming-cadence) epochs keep the hint — the single-stage
    * broadcast plan that never shuffles the corpus-sized composed
    * assignment is the fast path — and an oversized batch falls back
    * to an un-hinted equi-join on (tbl, bucket), where AQE picks the
    * strategy from measured sizes.  Seam is separate from
    * [[knnEdgesDelta]] so the spec can pin BOTH branches' plan shape
    * directly (hint present under budget, absent over it).
    */
  private[graft] def knnCollisionHits(composedB: DataFrame, batchB: DataFrame,
      batchBytes: Long, budgetBytes: Long): DataFrame = {
    val batchSide =
      if (batchBytes <= budgetBytes) broadcast(batchB.as("n")) else batchB.as("n")
    composedB.as("c")
      .join(batchSide, Seq("tbl", "bucket"))
      .filter(col("c.vec_id") =!= col("n.vec_id"))
      .select(col("c.vec_id").as("cid"), col("n.vec_id").as("nid"))
  }

  /** Past this cell count the centroids move from plan literals to a
    * broadcast relation: C·65 literal doubles are fine in codegen at
    * 256 cells (~16k nodes) and pathological at 4096 (~266k — constant
    * folding and method-size limits both blow up).
    */
  private[graft] val LiteralCells = 256

  /** Ceiling (in C·dim doubles) for the map-side [[graft.functions
    * .CellAssigner]] argmax: the centroid table rides the task binary
    * as one reference object, so the bound is serialized-plan size,
    * not codegen size.  2²² doubles = 32 MB — an order of magnitude
    * above the IVF clamp's worst case (4096 cells × dim 64 = 256 k)
    * and far below anything that would strain stage broadcast; a
    * user-supplied centroid table beyond it falls to the
    * broadcast-relation argmax, which scales to any C at the price of
    * one corpus shuffle.
    */
  private[graft] val CellExprBudget = 1L << 22

  /** IVF (inverted-file) ANN: a coarse k-means quantizer splits the
    * corpus into C cells; queries probe only the nprobe nearest cells
    * and re-rank exactly inside them.
    *
    * Scale design: C ≈ √n clamped to [16, 4096], so the probed
    * fraction nprobe/C = 1/√C vanishes as the corpus grows.  Training
    * runs DRIVER-LOCAL on a bounded deterministic sample (hash-rate
    * filter keeping ≈64k vectors — a pure scan-filter, no full-corpus
    * persist and no repeated corpus scans, collected and sorted by id
    * so results are independent of partition layout): k-means needs a
    * representative sample, not the population, so training cost is
    * O(sample), independent of corpus size.  The learned centroids are
    * broadcast model state (C×dim doubles), never the data — embedded
    * as plan literals up to [[LiteralCells]] (zero-shuffle map-side
    * assignment), as a broadcast relation beyond it (assignment becomes
    * a broadcast product + one argmax aggregation over the corpus —
    * the price of cell counts past the codegen literal budget).
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    // rides the materialized IVF-Flat index (see the tier block below
    // encodeForIndex): train + assign are paid once per snapshot via
    // the Materialize seam, a query pays probe-pruned FileScan +
    // broadcast probe join + exact in-cell scoring only.  Cold-build
    // results are bit-identical to the per-run [[ivfSearch]] (the
    // parity spec pins it).
    val (codes, _, centsOpt, _) = annIndexed(s, dir, "ivf")
    if (codes == null) return emptyTopK(s)
    val v = vecs(s, dir)
    val q0 = queryVecs(v).localCheckpoint(eager = true)
    ivfFlatSearchOn(codes, centsOpt.get, q0, 10)
  }

  /** Public IVF entry for a user query set ([[MaxQueries]] contract,
    * asserted).  Same plan-build-time action contract as [[annLshFor]]:
    * `corpus` should be a materialized table (one `Scan.countFor(corpus)` per
    * call derives the cell count).
    */
  def annIvfFor(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    ivfSearch(prep(corpus), asQueries(queries), k, Scan.countFor(corpus))

  /** `forceCells` overrides the √n cell derivation (spec hook for the
    * broadcast-relation path at small n).
    */
  private[graft] def ivfSearch(v: DataFrame, q0: DataFrame, k: Int, n: Long,
      forceCells: Option[Int] = None): DataFrame = {
    val s = v.sparkSession
    val cells0 = forceCells.getOrElse(
      math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt)))
    // bounded deterministic sample ([[trainingSample]]); empty corpus →
    // empty result with the contract schema, not a crash inside training
    val units = trainingSample(v, n)
    if (units.isEmpty) return emptyTopK(s)
    val cells = math.min(cells0, units.length)
    // nprobe ~ √cells keeps recall while the probed fraction
    // nprobe/cells = 1/√cells VANISHES as the corpus grows (a
    // constant-ratio formula would pin per-query work at a fixed
    // fraction of the corpus forever)
    val nprobe = math.max(4, math.ceil(math.sqrt(cells.toDouble)).toInt)

    val cents = sphericalKMeans(units, cells, 5)
    val (corpusAssigned, q) = coarseAssign(v, q0, cents, nprobe)
    val scored = corpusAssigned.join(broadcast(q),
        col("cid") === col("probe") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Coarse-quantizer assignment shared by IVF and IVF-PQ: returns
    * (corpus + `cid`, queries exploded to one row per `probe` cell).
    * Literal path up to [[LiteralCells]] (centroids compiled into the
    * plan — map-side codegen, zero extra shuffle), broadcast-relation
    * argmax beyond it (no codegen literal-budget ceiling).
    */
  private def coarseAssign(v: DataFrame, q0: DataFrame,
      cents: Array[Array[Double]], nprobe: Int): (DataFrame, DataFrame) =
    (assignCells(v, cents), queryProbes(q0, cents, nprobe))

  /** Corpus side of the coarse quantizer: adds `cid` = nearest-centroid
    * id.  Map-side native argmax ([[graft.functions.NearestCellId]],
    * r19) up to [[CellExprBudget]] C·dim doubles: zero additional
    * shuffle over the corpus, zero per-row allocation, no codegen-size
    * ceiling — the r18 plan used an unrolled struct literal capped at
    * [[LiteralCells]]=256 cells and fell over to the relation path
    * beyond it, which at sf10 (C=√n≈1400) made EVERY codes build and
    * Lloyd pass pay an n×C broadcast product plus a corpus-wide
    * argmax shuffle, most of the cold pass's gc.  Past the expression
    * budget (a centroid table too big to ride the task binary) the
    * broadcast-relation path remains: n×C product reduced by map-side
    * partial max, then ONE corpus-wide shuffle.  Tie-breaks
    * ((d desc, cid asc)) are identical on all three formulations
    * (expression parity spec-pinned in PqEncodeSpec).
    */
  private def assignCells(v: DataFrame, cents: Array[Array[Double]]): DataFrame =
    if (cents.length.toLong * cents(0).length <= CellExprBudget) {
      v.withColumn("cid", {
        import org.apache.spark.sql.graftshim.ColumnShim
        ColumnShim.column(graft.functions.NearestCellId(
          ColumnShim.expression(col("e")), new graft.functions.CellAssigner(cents)))
      })
    } else {
      val s = v.sparkSession
      import s.implicits._
      val cdf = broadcast(
        cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cvec"))
      v.crossJoin(cdf)
        .groupBy(col("vec_id"))
        .agg(
          max(struct(dot(col("e"), col("cvec")).as("d"), (-col("cid")).as("negcid"))).as("best"),
          // e/nrm are constant per vec_id, so first() is deterministic
          first(col("e")).as("e"), first(col("nrm")).as("nrm"))
        .select(col("vec_id"), col("e"), col("nrm"), (-col("best.negcid")).as("cid"))
    }

  /** Query side of the coarse quantizer: one output row per (query,
    * probed cell), carrying (q_id, qe, qnrm, probe).  Same
    * literal/broadcast-relation split and tie-breaks as
    * [[assignCells]]; |Q| is broadcast-bounded so the C-way product on
    * the relation path is |Q|·C rows, never corpus-sized.
    */
  private def queryProbes(q0: DataFrame, cents: Array[Array[Double]],
      nprobe: Int): DataFrame =
    if (cents.length <= LiteralCells) {
      val centroids: Seq[(Int, Seq[Double])] =
        cents.zipWithIndex.map { case (c, i) => i -> c.toSeq }.toSeq
      def probeCells(e: Column): Column =
        slice(transform(array_sort(array(centroids.map { case (cid, c) =>
          struct((-dot(e, typedLit(c))).as("negdot"), lit(cid).as("cid"))
        }: _*)), s => s.getField("cid")), 1, nprobe)
      q0.withColumn("probe", explode(probeCells(col("qe"))))
    } else {
      val s = q0.sparkSession
      import s.implicits._
      val cdf = broadcast(
        cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cvec"))
      val qw = Window.partitionBy(col("q_id")).orderBy(col("d").desc, col("cid"))
      q0.crossJoin(cdf)
        .select(col("q_id"), col("qe"), col("qnrm"), col("cid"),
          dot(col("qe"), col("cvec")).as("d"))
        .withColumn("rn", row_number().over(qw))
        .filter(col("rn") <= nprobe)
        .select(col("q_id"), col("qe"), col("qnrm"), col("cid").as("probe"))
    }

  /** PQ code book size: 8 subspaces × 16 centroids → one 4-bit code per
    * subspace, 8 small ints per vector.  The codebook itself is
    * 8·16·(dim/8) doubles — O(1) model state compiled into the plan.
    */
  private[graft] val PqSubspaces = 8
  private[graft] val PqCodes = 16
  private[graft] val PqRefine = 4

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) — the memory-bounded scale
    * path: the corpus is represented by 8 sub-codes (≈8 B/vector
    * instead of a 512 B embedding), queries score codes by
    * asymmetric-distance table lookup, and only the top refine·k
    * candidates per query touch the real embeddings again.
    *
    * Scale design: training is driver-local on the same bounded
    * hash-rate sample as IVF (per-subspace Lloyd k-means, deterministic
    * by construction); encoding is pure map-side codegen arithmetic
    * (codebook literals, zero shuffle over the corpus); the ADC scan
    * carries only (vec_id, 8 ints) per corpus row — at 100 TB the code
    * relation is ~64 GB where the raw embeddings are ~4 TB, so the
    * scoring scan reads 60× fewer bytes than brute force; the exact
    * re-rank joins the |Q|·refine·k winner set (broadcast) back to the
    * fat embeddings.  Approximate by construction → rows-only oracle;
    * the spec pins recall@10 vs brute force.
    */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    // rides the materialized PQ index: codebook training + the corpus
    // encode are paid once per snapshot; a query pays the 16 B/row ADC
    // FileScan + shortlist re-rank only.  Bit-identical to the per-run
    // [[pqSearch]] on a cold snapshot (parity spec).
    val (codes, books, _, _) = annIndexed(s, dir, "pq")
    if (codes == null || books.isEmpty) return emptyTopK(s)
    val v = vecs(s, dir)
    pqSearchOn(codes, books, v, queryVecs(v), 10, Some(corpusSize(s, dir)))
  }

  /** Public PQ entry for a user query set ([[MaxQueries]] contract,
    * asserted).  Same plan-build-time action contract as [[annLshFor]]
    * (`corpus` should be a materialized table); this entry also
    * RE-TRAINS and RE-ENCODES per call — for repeated searches over
    * one corpus use [[buildPqIndex]]/[[searchPqIndex]].
    */
  def annPqFor(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    pqSearch(prep(corpus), asQueries(queries), k, Scan.countFor(corpus))

  /** Bounded deterministic training sample shared by the quantizer
    * paths (IVF, PQ): keep vectors whose id-hash falls under the
    * sampling rate — a pure scan-filter (no sort, no shuffle), unbiased
    * under any physical data order, with a driver-side collect of
    * ≈[[TrainMaxSample]] rows regardless of cluster size.  (A
    * hash-ORDERED take would merge a per-partition head on the driver —
    * per-PARTITION state that grows with the cluster.)  Rows are
    * unit-normalized and sorted by vec_id so seeds and float
    * accumulation order are independent of partition layout.
    */
  private[graft] val TrainMaxSample = 64 * 1024

  private def trainingSample(v: DataFrame, n: Long): Array[Array[Double]] = {
    val rate = math.min(1.0, TrainMaxSample.toDouble / math.max(n, 1L))
    val keepBelow = math.max(1L, (rate * 1000000L).toLong)
    v.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) < lit(keepBelow))
      .select(col("vec_id"), col("e"), col("nrm"))
      .collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val e = r.getSeq[Double](1); val nm = r.getDouble(2)
        e.map(_ / nm).toArray
      }
  }

  /** Empty result with the shared ANN contract schema — the
    * empty-corpus early-out for the trained paths (never a crash
    * inside training).
    */
  private def emptyTopK(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("q_id", LongType), StructField("rk", IntegerType, nullable = false),
        StructField("vec_id", LongType), StructField("cos6", DoubleType))))
  }

  /** Driver-local SPHERICAL k-means (cosine objective — assignment by
    * max dot, centroids re-normalized): seeds = first k sample
    * vectors, then Lloyd iterations entirely on the driver
    * (sequential arithmetic → bit-deterministic across runs and
    * partitionings; empty clusters keep their previous centroid).
    * Shared by the IVF and IVF-PQ coarse quantizers.
    */
  private def sphericalKMeans(units: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = units.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val dim = cents(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      units.foreach { u =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { d += cents(c)(i) * u(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += u(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val sm = sums(c)
          val nrm = math.sqrt(sm.map(x => x * x).sum)
          if (nrm > 0) sm.map(_ / nrm) else old
        }
      }
    }
    cents
  }

  /** Per-subspace PQ codebooks over the (unit-normalized) sample:
    * m books of ksub L2-k-means centroids on the sub-vectors.  Shared
    * by the PQ and IVF-PQ paths.
    */
  private def pqBooks(units: Array[Array[Double]], m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val dim = units(0).length
    require(dim % m == 0, s"embedding dim $dim must divide into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { j =>
      kmeansL2(units.map(u => java.util.Arrays.copyOfRange(u, j * sub, (j + 1) * sub)), ksub, 5)
    }
  }

  /** Map-side PQ encode: codes[j] = nearest sub-centroid of book j by
    * L2 on the unit vector, i.e. argmax(dot(e_sub, c)/nrm − ½‖c‖²).
    * Since r19 a single allocation-free native expression
    * ([[graft.functions.PqEncodeCodes]]) instead of the unrolled
    * struct/array_min literal plan: identical IEEE op order and
    * tie-break (bit-identity spec-pinned in PqEncodeSpec), but without
    * the m·ksub per-row slice/struct garbage that made the sf10 cold
    * codes builds gc-bound (4.5 ks of gc in the r18 cold pass).
    * Shared by the PQ and IVF-PQ paths.
    */
  private def pqCodesCol(books: Array[Array[Array[Double]]], sub: Int,
      e: Column, nrm: Column): Column = {
    require(books(0)(0).length == sub, s"subspace width mismatch: ${books(0)(0).length} vs $sub")
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.PqEncodeCodes(
      ColumnShim.expression(e), ColumnShim.expression(nrm),
      new graft.functions.PqEncoder(books, divByNrm = true)))
  }

  /** Per-query ADC lookup tables: qtabs[j][c] = dot(q_sub_j, c)/‖q‖ —
    * an m×ksub-double table riding the query row.  Shared by the PQ
    * and IVF-PQ paths.
    */
  private def pqTabsCol(books: Array[Array[Array[Double]]], sub: Int,
      qe: Column, qnrm: Column): Column =
    array(books.indices.map { j =>
      array(books(j).map(c => dot(slice(qe, j * sub + 1, sub), typedLit(c.toSeq)) / qnrm): _*)
    }: _*)

  /** Shared ADC tail: map-side top-(refine·k) shortlist over the
    * approx scores, then exact re-rank of the broadcast shortlist
    * against the real embeddings.
    */
  private def adcShortlistRerank(v: DataFrame, q0: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val shortlist = cand.groupBy(col("q_id"))
      .agg(TopKScoredAgg.topKScored(col("cos"), col("vec_id"), PqRefine * k).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.id").as("vec_id"))
    val scored = v.join(broadcast(shortlist), "vec_id")
      .join(broadcast(q0), "q_id")
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Driver-local L2 Lloyd k-means over sub-vectors (deterministic:
    * seeds = first k points, sequential accumulation, empty clusters
    * keep their previous centroid).
    */
  private def kmeansL2(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dim = points(0).length
    var cents = points.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = cents(c)(i) - p(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  private[graft] def pqSearch(v: DataFrame, q0: DataFrame, k: Int, n: Long): DataFrame = {
    val s = v.sparkSession
    // unit-normalized sample (PQ on unit vectors ⇒ ADC dot ≈ cosine)
    val units = trainingSample(v, n)
    if (units.isEmpty) return emptyTopK(s)
    val books = pqBooks(units, PqSubspaces, math.min(PqCodes, units.length))

    // MATERIALIZE the code table for this run.  Two wins: the ADC join
    // reads ~16 B/vector rows instead of re-encoding per run, and the
    // m·k-literal encode tree stays out of the join stage — fused, its
    // size knocks the whole stage out of whole-stage codegen and the
    // per-pair path drops to interpreted eval (measured 20× slower end
    // to end).  The materialization dies with the session: for the
    // cross-run encode-once/search-many shape, [[buildPqIndex]] returns
    // this same relation for the user to persist and
    // [[searchPqIndex]] searches it without re-training or re-encoding.
    val enc = v.select(col("vec_id"),
      pqCodesCol(books, units(0).length / PqSubspaces, col("e"), col("nrm")).as("codes"))
      .localCheckpoint(eager = true)
    pqSearchOn(enc, books, v, q0, k, Some(n))
  }

  /** Search an already-encoded PQ code relation: qtabs ride a |Q|-row
    * broadcast, the ADC scan touches only (vec_id, codes) rows, and the
    * exact re-rank reads the fat embeddings for the shortlist alone.
    *
    * ADC scan: approx cosine = Σ_j qtabs[j][code_j] via the native
    * [[graft.functions.AdcScore]] — ONE eval per row.  This expression
    * is the child of the top-k aggregate, whose update path runs
    * interpreted (TypedImperativeAggregate has no codegen'd update):
    * an m-way element_at tree there cost ~15 µs/row; the native eval
    * is a tight primitive loop.  The corpus never shuffles and never
    * re-reads the fat embeddings.
    */
  private def pqSearchOn(codes: DataFrame, books: Array[Array[Array[Double]]],
      v: DataFrame, q0: DataFrame, k: Int, n: Option[Long] = None): DataFrame = {
    val sub = books(0)(0).length
    val qt = q0.select(col("q_id"),
      pqTabsCol(books, sub, col("qe"), col("qnrm")).as("qtabs"))
    def score(c: DataFrame) = c.join(broadcast(qt), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.AdcScore.adcScore(col("codes"), col("qtabs")).as("cos"))
    // τ at the SHORTLIST width (refine·k): the prune must keep every
    // row that can reach the shortlist, not just the final top-k
    adcShortlistRerank(v, q0, tauPrune(score, codes, PqRefine * k, n), k)
  }

  /** Model relation behind the persisted index paths: one row per PQ
    * codebook centroid ("book", subspace, code), coarse centroid
    * ("cent", 0, cell id; IVF-PQ only) and flag row ("meta", 0,
    * residual ? 1 : 0) — m·ksub + C + 1 rows total, O(1) in corpus
    * size, so the search side can collect it to the driver in one
    * bounded action.
    */
  private def modelToDf(s: SparkSession, books: Array[Array[Array[Double]]],
      cents: Option[Array[Array[Double]]], residual: Boolean,
      ivf: Boolean = false): DataFrame = {
    import s.implicits._
    val bookRows = for {
      j <- books.indices; c <- books(j).indices
    } yield ("book", j, c, books(j)(c).toSeq)
    val centRows = cents.toSeq.flatMap(cs => cs.indices.map(i => ("cent", 0, i, cs(i).toSeq)))
    // (meta, 0, flag) = residual; (meta, 1, flag) = ivf (codes carry a
    // cid column).  The ivf flag matters for EMPTY indexes, whose cent
    // row set is empty — without it a read-back empty IVF-PQ index
    // would reconstruct PQ-shaped (no cid) codes.
    val metaRows = Seq(
      ("meta", 0, if (residual) 1 else 0, Seq.empty[Double]),
      ("meta", 1, if (ivf || cents.nonEmpty) 1 else 0, Seq.empty[Double]))
    (bookRows ++ centRows ++ metaRows).toDF("kind", "grp", "idx", "vec")
  }

  /** Rebuild (books, coarse centroids, residual flag) from a model
    * relation — rows are keyed by (kind, grp, idx) so the reconstruction
    * is independent of file/row order after a parquet round-trip.
    */
  private def modelFromDf(model: DataFrame):
      (Array[Array[Array[Double]]], Option[Array[Array[Double]]], Boolean) = {
    val rows = model.select(col("kind"), col("grp"), col("idx"), col("vec")).collect()
    val bookRows = rows.filter(_.getString(0) == "book")
      .map(r => (r.getInt(1), r.getInt(2), r.getSeq[Double](3).toArray))
    val m = if (bookRows.isEmpty) 0 else bookRows.map(_._1).max + 1
    val books = Array.tabulate(m)(j => bookRows.filter(_._1 == j).sortBy(_._2).map(_._3))
    val centRows = rows.filter(_.getString(0) == "cent")
      .map(r => (r.getInt(2), r.getSeq[Double](3).toArray))
    val cents = if (centRows.isEmpty) None else Some(centRows.sortBy(_._1).map(_._2))
    val residual = rows.filter(r => r.getString(0) == "meta" && r.getInt(1) == 0)
      .exists(_.getInt(2) == 1)
    (books, cents, residual)
  }

  /** Build a persistable PQ index over `corpus` ((vec_id, embedding)):
    * trains codebooks on the bounded sample, returns the UNMATERIALIZED
    * (vec_id, codes) relation plus the O(1) model relation.  The user
    * writes both once ([[AnnIndex.write]] or
    * [[graft.sources.Layout.writeBucketed]] on vec_id) and every later
    * query batch pays only the 16 B/row ADC scan + shortlist re-rank —
    * never the count/train/encode this build runs (one `Scan.countFor(corpus)`
    * action here; build against a materialized table).
    */
  def buildPqIndex(corpus: DataFrame): AnnIndex = {
    val v = prep(corpus)
    val s = v.sparkSession
    val units = trainingSample(v, Scan.countFor(corpus))
    if (units.isEmpty)
      return AnnIndex(v.select(col("vec_id"), typedLit(Seq.empty[Int]).as("codes")),
        modelToDf(s, Array.empty, None, residual = false))
    val books = pqBooks(units, PqSubspaces, math.min(PqCodes, units.length))
    val codes = v.select(col("vec_id"),
      pqCodesCol(books, units(0).length / PqSubspaces, col("e"), col("nrm")).as("codes"))
    AnnIndex(codes, modelToDf(s, books, None, residual = false))
  }

  /** Search a prebuilt PQ index ([[buildPqIndex]], possibly re-read via
    * [[AnnIndex.read]]).  `corpus` must be the relation the index was
    * built from (vec_id-aligned) — only the |Q|·refine·k shortlist rows
    * of it are ever read, for the exact re-rank.  No training, no
    * encoding, no corpus count: the only driver action beyond the query
    * contract check is the O(1) model collect.
    */
  def searchPqIndex(index: AnnIndex, corpus: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val (books, centsOpt, _) = modelFromDf(index.model)
    require(centsOpt.isEmpty, "model carries coarse centroids — IVF-PQ index, use searchIvfPqIndex")
    if (books.isEmpty) return emptyTopK(corpus.sparkSession)
    pqSearchOn(index.codes, books, prep(corpus), asQueries(queries), k)
  }

  /** IVF-PQ composed ANN — the FAISS-default architecture, from the
    * two already-verified pieces: the IVF coarse quantizer PRUNES (a
    * query touches only its nprobe cells' code rows — 1/√C of the
    * corpus, vanishing as it grows) and PQ codes make each touched
    * row 16 B instead of 512 B.  Against plain PQ the ADC scan
    * shrinks ~√C-fold; against plain IVF the probed rows are codes,
    * not embeddings.  Exact re-rank keeps reported scores true.
    *
    * This entry quantizes the raw unit vectors; [[annIvfPqResidual]]
    * is the FAISS-style refinement that quantizes per-cell RESIDUALS
    * instead (finer codes for one subtraction per encode — see
    * [[ivfPqBuild]] for why the cosine objective makes that cheap).
    *
    * Cells derive exactly as in [[annIvf]] (√n clamped to [16, 4096]):
    * [[coarseAssign]] provides the literal assignment up to
    * [[LiteralCells]] and the broadcast-relation argmax beyond it.
    * Approximate by construction → rows-only oracle.
    */
  def annIvfPq(s: SparkSession, dir: String): DataFrame =
    annIvfPqIndexed(s, dir, "ivfpq")

  /** Public IVF-PQ entry for a user query set ([[MaxQueries]]
    * contract, asserted).  Same plan-build-time action contract as
    * [[annLshFor]] (`corpus` should be a materialized table); this
    * entry also RE-TRAINS and RE-ENCODES per call — for repeated
    * searches over one corpus use
    * [[buildIvfPqIndex]]/[[searchIvfPqIndex]].
    */
  def annIvfPqFor(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    ivfPqSearch(prep(corpus), asQueries(queries), k, Scan.countFor(corpus))

  /** Residual IVF-PQ — the FAISS precision step: codebooks quantize
    * r = ê − cent[cid] instead of ê itself.  Residual magnitudes are a
    * fraction of unit length, so the same 16-code books spend their
    * resolution on a much smaller ball — finer ADC scores, better
    * shortlist recall, identical index size.  Under the cosine/IP
    * objective the score decomposes LINEARLY: cos ≈ q̂·cent[cid] +
    * q̂·r, so the ADC tables stay per-QUERY (cell-independent — the
    * per-cell-table cost that makes L2 residual IVF-PQ expensive never
    * appears) and the cell term is ONE extra double riding each
    * (q_id, probe) broadcast row.  Approximate by construction →
    * rows-only oracle; the spec pins recall@10 at-or-above the
    * raw-vector path's floor.
    */
  def annIvfPqResidual(s: SparkSession, dir: String): DataFrame =
    annIvfPqIndexed(s, dir, "ivfpqr")

  /** Shared indexed IVF-PQ driver path (raw + residual variants):
    * train + encode ride the Materialize seam, a query pays the
    * probe-pruned 16 B/row ADC FileScan + shortlist re-rank.
    * Bit-identical to the per-run [[ivfPqSearch]] on a cold snapshot
    * (parity spec).
    */
  private def annIvfPqIndexed(s: SparkSession, dir: String, variant: String): DataFrame = {
    val (codes, books, centsOpt, residual) = annIndexed(s, dir, variant)
    if (codes == null || books.isEmpty) return emptyTopK(s)
    val cents = centsOpt.get
    val v = vecs(s, dir)
    val q0 = queryVecs(v).localCheckpoint(eager = true)
    val nprobe = math.max(4, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val pruned = probePrune(codes,
      queryProbes(q0, cents, nprobe).localCheckpoint(eager = true))
    ivfPqSearchOn(pruned, books, cents, nprobe, residual, v, q0, 10)
  }

  /** Per-cell residuals of the training sample (driver-local, same
    * argmax-by-dot assignment as the distributed [[assignCells]]):
    * r = u − cent[nearest].
    */
  private def residualUnits(units: Array[Array[Double]],
      cents: Array[Array[Double]]): Array[Array[Double]] =
    units.map { u =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        while (i < u.length) { d += cents(c)(i) * u(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      val r = new Array[Double](u.length)
      var i = 0
      while (i < u.length) { r(i) = u(i) - cents(best)(i); i += 1 }
      r
    }

  /** Residual vector column r = e/nrm − cent[cid], via ONE `typedLit`
    * of the full centroid table (a single Literal node holding C×dim
    * doubles + an element_at lookup — no per-centroid codegen
    * unrolling, so this lookup has no [[LiteralCells]] ceiling).
    */
  private def residualCol(cents: Array[Array[Double]],
      e: Column, nrm: Column, cid: Column): Column = {
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    zip_with(e, element_at(centLit, cid + 1), (x, c) => x / nrm - c)
  }

  /** Map-side residual PQ encode: codes[j] = argmin_c ‖r_sub − c‖,
    * i.e. argmax(dot(r_sub, c) − ½‖c‖²) on the materialized residual
    * column.  Same allocation-free expression as [[pqCodesCol]] with
    * the norm division disabled (the residual is already in unit
    * space); nrm is fed lit(1.0) purely to satisfy the binary shape —
    * divByNrm=false keeps even the exact d/1.0 identity out of the
    * loop.
    */
  private def pqResidualCodesCol(books: Array[Array[Array[Double]]], sub: Int,
      r: Column): Column = {
    require(books(0)(0).length == sub, s"subspace width mismatch: ${books(0)(0).length} vs $sub")
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.PqEncodeCodes(
      ColumnShim.expression(r), ColumnShim.expression(lit(1.0)),
      new graft.functions.PqEncoder(books, divByNrm = false)))
  }

  /** Shared IVF-PQ build over a prepped corpus: trains the coarse
    * quantizer and the (optionally residual) PQ books on the bounded
    * sample, and returns (books, cents, codes relation).  The codes
    * relation — (vec_id, cid, codes), ~16 B/row — is NOT materialized
    * here: the per-run entries localCheckpoint it, the persisted path
    * hands it to the user to write.
    */
  private def ivfPqBuild(v: DataFrame, units: Array[Array[Double]],
      forceCells: Option[Int], residual: Boolean, n: Long,
      trainedCents: Option[Array[Array[Double]]] = None):
      (Array[Array[Array[Double]]], Array[Array[Double]], DataFrame) = {
    val dim = units(0).length
    val sub = dim / PqSubspaces
    val ksub = math.min(PqCodes, units.length)
    // same cell derivation as ivfSearch — [[assignCells]] carries both
    // the literal path and the broadcast-relation path past
    // [[LiteralCells]], so C keeps growing as √n (no probed-fraction
    // floor at high n)
    val cells = math.min(forceCells.getOrElse(
      math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))), units.length)
    // caller-supplied coarse centroids (the full-corpus kmeansTrain
    // path) override the driver-local sample training; PQ books still
    // train on the bounded sample either way (they are per-subspace
    // O(ksub·dim) state — the sample bounds THEIR training cost, the
    // coarse quantizer is what benefits from seeing everything)
    val cents = trainedCents.getOrElse(sphericalKMeans(units, cells, 5))
    val books = pqBooks(if (residual) residualUnits(units, cents) else units,
      PqSubspaces, ksub)
    val assigned = assignCells(v, cents)
    val codes =
      if (residual)
        assigned
          .withColumn("rvec", residualCol(cents, col("e"), col("nrm"), col("cid")))
          .select(col("vec_id"), col("cid"),
            pqResidualCodesCol(books, sub, col("rvec")).as("codes"))
      else
        assigned.select(col("vec_id"), col("cid"),
          pqCodesCol(books, sub, col("e"), col("nrm")).as("codes"))
    (books, cents, codes)
  }

  /** Search an IVF-PQ code relation with a trained model in hand —
    * the probe-join stage shared by the per-run entries and the
    * persisted-index path.
    *
    * Broadcast shapes: the (q_id, probe[, bias]) pairs are |Q|·nprobe
    * NARROW rows; the fat m×ksub qtabs ride a SEPARATE |Q|-row
    * broadcast joined by q_id — duplicating qtabs onto every probe row
    * would multiply the broadcast by nprobe (~30× past the MaxQueries
    * contract's documented budget).  The ADC scan is an EQUI broadcast
    * join on cid: only the probed cells' code rows are ever scored.
    */
  private def ivfPqSearchOn(codes: DataFrame, books: Array[Array[Array[Double]]],
      cents: Array[Array[Double]], nprobe: Int, residual: Boolean,
      v: DataFrame, q0: DataFrame, k: Int): DataFrame = {
    val sub = books(0)(0).length
    val probes = queryProbes(q0, cents, nprobe)
    val probePairs =
      if (residual) {
        // the residual decomposition's cell term: bias = q̂·cent[probe]
        // — one double per probe pair, not a per-cell ADC table
        val centLit = typedLit(cents.map(_.toSeq).toSeq)
        probes.select(col("q_id"), col("probe"),
          (dot(col("qe"), element_at(centLit, col("probe") + 1)) / col("qnrm")).as("bias"))
      } else probes.select(col("q_id"), col("probe"))
    val qtabs = q0.select(col("q_id"),
      pqTabsCol(books, sub, col("qe"), col("qnrm")).as("qtabs"))
    val adc = graft.functions.AdcScore.adcScore(col("codes"), col("qtabs"))
    val cand = codes.join(broadcast(probePairs),
        col("cid") === col("probe") && col("vec_id") =!= col("q_id"))
      .join(broadcast(qtabs), "q_id")
      .select(col("q_id"), col("vec_id"),
        (if (residual) col("bias") + adc else adc).as("cos"))
    adcShortlistRerank(v, q0, cand, k)
  }

  /** `forceCells` overrides the √n cell derivation (spec hook for the
    * broadcast-relation assignment at small n, as in [[ivfSearch]]);
    * `residual` selects the per-cell-residual codebooks
    * ([[annIvfPqResidual]]).
    */
  private[graft] def ivfPqSearch(v: DataFrame, q0: DataFrame, k: Int, n: Long,
      forceCells: Option[Int] = None, residual: Boolean = false): DataFrame = {
    val s = v.sparkSession
    val units = trainingSample(v, n)
    if (units.isEmpty) return emptyTopK(s)
    val (books, cents, codes) = ivfPqBuild(v, units, forceCells, residual, n)
    val nprobe = math.max(4, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    // per-run materialized index relation (encode once within the run;
    // see pqSearch for the codegen rationale) — cross-run persistence
    // is buildIvfPqIndex/searchIvfPqIndex
    val index = codes.localCheckpoint(eager = true)
    ivfPqSearchOn(index, books, cents, nprobe, residual, v, q0, k)
  }

  /** Build a persistable IVF-PQ index: (vec_id, cid, codes) relation +
    * O(1) model relation (books, coarse centroids, residual flag).
    * Write once with [[AnnIndex.write]] — codes files are partitioned
    * by cell, so later searches physically read only probed cells —
    * then [[searchIvfPqIndex]] any number of query batches.  Runs one
    * `Scan.countFor(corpus)` action; build against a materialized table.
    */
  /** `fullTrain = true` trains the coarse quantizer on the FULL corpus
    * via [[kmeansTrain]] (order-insensitive decimal centroid updates —
    * the same index on any partitioning) instead of the ≤64k
    * driver-local sample: one extra distributed pass per Lloyd
    * iteration, the right trade when the index is built once and
    * searched for months.  PQ codebooks still train on the bounded
    * sample (per-subspace O(ksub·dim) state).
    */
  def buildIvfPqIndex(corpus: DataFrame, residual: Boolean = false,
      fullTrain: Boolean = false): AnnIndex = {
    val v = prep(corpus)
    val s = v.sparkSession
    val n = Scan.countFor(corpus)
    val units = trainingSample(v, n)
    if (units.isEmpty)
      return AnnIndex(
        v.select(col("vec_id"), lit(0).as("cid"), typedLit(Seq.empty[Int]).as("codes")),
        modelToDf(s, Array.empty, None, residual, ivf = true))
    val trained = if (fullTrain) {
      val cells = math.min(
        math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt)),
        units.length)
      Some(kmeansTrain(corpus, cells, 5)._1)
    } else None
    val (books, cents, codes) = ivfPqBuild(v, units, None, residual, n, trained)
    AnnIndex(codes, modelToDf(s, books, Some(cents), residual))
  }

  /** Search a prebuilt IVF-PQ index ([[buildIvfPqIndex]], possibly
    * re-read via [[AnnIndex.read]]).  `corpus` must be the relation the
    * index was built from (vec_id-aligned); only shortlist rows of it
    * are read.  No training, no encoding, no corpus count — the model
    * collect is the one bounded driver action, and nprobe re-derives
    * from the persisted cell count exactly as the build did.
    */
  def searchIvfPqIndex(index: AnnIndex, corpus: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val (books, centsOpt, residual) = modelFromDf(index.model)
    if (books.isEmpty) return emptyTopK(corpus.sparkSession)
    val cents = centsOpt.getOrElse(throw new IllegalArgumentException(
      "model has no coarse centroids — PQ index? use searchPqIndex"))
    val nprobe = math.max(4, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    ivfPqSearchOn(index.codes, books, cents, nprobe, residual,
      prep(corpus), asQueries(queries), k)
  }

  /** Encode-only append to a persisted index — the ANN twin of
    * [[Dedup.dedupIncremental]]'s batch ingest.  New vectors are
    * encoded with the index's PERSISTED model (codebooks, coarse
    * centroids, residual flag) and unioned onto the code relation: no
    * re-training and no re-encode of existing codes, so a daily-ingest
    * user pays |batch| encode work instead of |corpus| per day.  The
    * only driver action is the O(1) model collect — the spec pins both
    * that (job count during append ≤ 1) and encode parity: under one
    * model, append(build(A), B).codes ≡ the codes build(A∪B) would
    * emit, bit-for-bit.  The returned index shares the caller's model
    * relation verbatim, so searches mix old and new codes with
    * identical ADC semantics.  Appending to an index with no trained
    * books (built from an empty corpus) is refused — there is no model
    * to encode with; rebuild instead.
    */
  def appendToIndex(index: AnnIndex, newVectors: DataFrame): AnnIndex =
    AnnIndex(index.codes.unionByName(encodeForIndex(index, newVectors)), index.model)

  /** The DELETE twin of [[appendToIndex]] — takedowns and re-dedup
    * removals for a live index: drops `ids`' code rows (any frame with
    * a `vec_id` column), leaving the model untouched.  Search equality
    * is by construction, not approximation: encoding is per-row, so
    * `deleteFromIndex(build(A), ids).codes` ≡ the codes
    * `build(A ∖ ids)` would emit under the same model, bit-for-bit —
    * and every search over the two is identical (spec-pinned).  The
    * anti-join is broadcast for a small takedown list and an
    * AQE-splittable shuffle join for a bulk purge; either way nothing
    * corpus-sized lands on the driver.  For an index ON DISK, pair
    * with [[AnnIndex.deleteFromIndex]] (tombstones, no file rewrites)
    * and [[AnnIndex.compact]] (rewrites only affected cell dirs).
    */
  def deleteFromIndex(index: AnnIndex, ids: DataFrame): AnnIndex =
    AnnIndex(index.codes.join(
      ids.select(col("vec_id").cast("long")), Seq("vec_id"), "left_anti"),
      index.model)

  /** Just the NEW vectors' code rows under the index's persisted model
    * — the relation [[appendToIndex]] unions in.  Exposed so a daily
    * ingest can pair it with [[AnnIndex.appendCodes]] and write ONLY
    * the new files: no re-train ([[appendToIndex]]'s half) and no
    * rewrite of existing code files (the storage half).
    */
  def encodeForIndex(index: AnnIndex, newVectors: DataFrame): DataFrame = {
    val (books, centsOpt, residual) = modelFromDf(index.model)
    require(books.nonEmpty,
      "appendToIndex: index has no trained model (empty-corpus build) — " +
        "rebuild with buildPqIndex/buildIvfPqIndex instead")
    encodeWithModel(books, centsOpt, residual, newVectors)
  }

  /** The single encode implementation behind [[encodeForIndex]] and the
    * materialized codes artifacts — one body, so appendToIndex parity
    * (append(build(A), B).codes ≡ build(A∪B) codes under one model)
    * and the artifact-vs-per-run parity pin the same arithmetic.
    */
  private def encodeWithModel(books: Array[Array[Array[Double]]],
      centsOpt: Option[Array[Array[Double]]], residual: Boolean,
      newVectors: DataFrame, wide: Boolean = false): DataFrame = {
    val v = { val p = prep(newVectors); if (wide) widen(p) else p }
    val sub = books(0)(0).length
    centsOpt match {
      case Some(cents) =>
        val assigned = assignCells(v, cents)
        if (residual)
          assigned
            .withColumn("rvec", residualCol(cents, col("e"), col("nrm"), col("cid")))
            .select(col("vec_id"), col("cid"),
              pqResidualCodesCol(books, sub, col("rvec")).as("codes"))
        else
          assigned.select(col("vec_id"), col("cid"),
            pqCodesCol(books, sub, col("e"), col("nrm")).as("codes"))
      case None =>
        v.select(col("vec_id"), pqCodesCol(books, sub, col("e"), col("nrm")).as("codes"))
    }
  }

  // ──────────────────── materialized ANN index tier ────────────────────
  //
  // The round-16 sf10 bench priced per-run index construction at
  // 2,183 s of the 5,125 s suite (ann_ivf slower than brute force —
  // the index that exists to prune the scan cost more than the scan
  // because its build was paid per query).  This tier applies the
  // repo's own Materialize discipline — build once per corpus
  // snapshot, maintain by delta, consume as a plain FileScan — to the
  // trained quantizer paths, as TWO artifacts per variant:
  //
  //   annix_model_<v>  the O(1) model relation (PQ books, coarse
  //                    centroids, flags + a training-base-bytes
  //                    rider).  Append/delete CARRY it verbatim (the
  //                    FAISS discipline: the quantizer is model state,
  //                    retrained only at compaction) until cumulative
  //                    growth/shrink beyond the TRAINED base crosses
  //                    MaxAppendFraction, when the callback declines
  //                    and the full rebuild retrains.
  //   annix_codes_<v>  the corpus-sized code relation, always encoded
  //                    under the artifact model: append = encode ONLY
  //                    the batch ([[appendToIndex]]'s algebra) + the
  //                    linear rewrite floor; takedown = survivor
  //                    semi-join ([[deleteFromIndex]]'s); mixed rides
  //                    the seam's remove∘delta composition.  The model
  //                    FINGERPRINT rides in the codes params, so codes
  //                    can never pair with a model they were not
  //                    encoded under — a retrain structurally
  //                    invalidates every prior codes artifact (the
  //                    round-15 derived-params discipline).
  //
  // Unlike the pair/edge substrates there is NO delta≡full value
  // identity here — an appended index deliberately keeps the base
  // quantizer, which a full rebuild would retrain (exactly FAISS's
  // add-after-train semantics).  The artifact contract is instead:
  // codes ≡ what [[appendToIndex]]/[[deleteFromIndex]] would produce
  // (spec-pinned bit-identically), and search recall stays pinned by
  // the recall specs.  Cold builds on one snapshot ARE bit-identical
  // to the per-run entries (same deterministic training sample), so
  // re-pointing the driver queries changed no gate output.

  private[graft] val AnnIndexVer = "1"

  /** Train the variant's model for the CURRENT snapshot — the same
    * deterministic sample + training the per-run entries use, so a
    * cold artifact reproduces their results bit-for-bit.  The extra
    * ("meta", 2) row records the training base's total bytes: the
    * carry callbacks measure cumulative growth/shrink against the
    * TRAINED base, not the previous snapshot (the carried model
    * re-publishes under every snapshot's signature).
    */
  private def annTrainModel(s: SparkSession, dir: String, variant: String): DataFrame = {
    val v = vecs(s, dir)
    val n = corpusSize(s, dir)
    val units = trainingSample(v, n)
    val base = variant match {
      case "ivf" =>
        if (units.isEmpty) modelToDf(s, Array.empty, None, residual = false, ivf = true)
        else {
          val cells = math.min(math.max(16,
            math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt)), units.length)
          modelToDf(s, Array.empty, Some(sphericalKMeans(units, cells, 5)), residual = false)
        }
      case "pq" =>
        if (units.isEmpty) modelToDf(s, Array.empty, None, residual = false)
        else modelToDf(s,
          pqBooks(units, PqSubspaces, math.min(PqCodes, units.length)), None, residual = false)
      case other =>
        val residual = other == "ivfpqr"
        if (units.isEmpty) modelToDf(s, Array.empty, None, residual, ivf = true)
        else {
          // ivfPqBuild's codes relation is lazy — only the training
          // half runs here, and it is the SAME training the per-run
          // entry would do (zero drift by construction)
          val (books, cents, _) = ivfPqBuild(v, units, None, residual, n)
          modelToDf(s, books, Some(cents), residual)
        }
    }
    import s.implicits._
    base.unionByName(Seq(("meta", 2, 0,
      Seq(graft.sources.Materialize.totalBytes(s,
        graft.sources.Materialize.listFiles(s, s"$dir/embeddings.parquet")).toDouble)))
      .toDF("kind", "grp", "idx", "vec"))
  }

  /** The variant's model artifact for `dir`'s snapshot: trained once,
    * carried verbatim across appends and takedowns, retrained
    * (decline → full) when the snapshot drifts past MaxAppendFraction
    * of the trained base in either direction.
    */
  private def annModelDf(s: SparkSession, dir: String, variant: String): DataFrame = {
    val M = graft.sources.Materialize
    def trainedBytes(prev: DataFrame): Option[Double] =
      prev.filter(col("kind") === "meta" && col("grp") === 2)
        .select(col("vec")).collect().headOption.map(_.getSeq[Double](0).head)
    M.readOrBuildMaintained(s, s"annix_model_$variant",
      Seq(s"$dir/embeddings.parquet"),
      Seq("variant" -> variant, "ver" -> AnnIndexVer))(
      annTrainModel(s, dir, variant)) { (prev, prevFiles, deltaFiles) =>
      val cur = M.totalBytes(s, prevFiles ++ deltaFiles).toDouble
      if (trainedBytes(prev).exists(b =>
          cur > (1.0 + graft.operators.Dedup.maxAppendFraction(s)) * b)) null
      else prev
    } { (prev, prevStats, removedFiles) =>
      val survivorBytes =
        (prevStats -- removedFiles).values.map(M.statLen).sum.toDouble
      if (trainedBytes(prev).exists(b =>
          survivorBytes < (1.0 - graft.operators.Dedup.maxAppendFraction(s)) * b)) null
      else prev
    }
  }

  /** Canonical model fingerprint (books ++ cents ++ residual over the
    * doubles' exact bit patterns).  Rides the codes artifact's PARAMS:
    * prior-artifact detection requires param equality, so any model
    * change — retrain after drift, version bump — structurally
    * invalidates every prior codes artifact and forces a re-encode;
    * mixed-model code relations are impossible by construction.
    */
  private def modelFingerprint(books: Array[Array[Array[Double]]],
      cents: Option[Array[Array[Double]]], residual: Boolean): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(8)
    def put(d: Double): Unit = {
      bb.clear(); bb.putDouble(d); md.update(bb.array())
    }
    books.foreach(_.foreach(_.foreach(put)))
    cents.foreach(_.foreach(_.foreach(put)))
    md.update(if (residual) 1.toByte else 0.toByte)
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** The variant's codes artifact, always encoded under the
    * fingerprinted model.  IVF variants get the cid-range file layout
    * at full build and takedown (each output file covers a narrow
    * contiguous cell range, so the search-side probe prune skips
    * whole files); an append leaves the base files' layout intact and
    * adds the batch as an unsorted LSM tail — no corpus shuffle per
    * append, and the next compacting full build re-sorts everything
    * (the cop_lines discipline).  Takedown semi-joins survivors
    * derived from prevStats − removed (NEVER the live listing — under
    * mixed composition the appended files are already on disk); the
    * join already shuffles, so re-applying the layout there is one
    * exchange, not an extra pass.
    */
  private def annCodesDf(s: SparkSession, dir: String, variant: String,
      books: Array[Array[Array[Double]]], centsOpt: Option[Array[Array[Double]]],
      residual: Boolean, fp: String): DataFrame = {
    val M = graft.sources.Materialize
    // the encode (cell argmax / PQ code argmin per row) is the same
    // compute-bound-scan shape as the τ-pruned scoring family — widen
    // a narrow input before it (r18; the r17 cold sf10 builds paid
    // 600–800 s/variant single-task on the one-row-group corpus).
    // Values are per-row deterministic, so partitioning never changes
    // the artifact's rows (the cold-bit-identity spec stays exact).
    def encode(raw: DataFrame): DataFrame = variant match {
      // IVF-Flat stores the vectors themselves cell-assigned (the
      // FAISS IVFFlat layout): search then needs NO corpus join at all
      case "ivf" =>
        assignCells(widen(prep(raw)), centsOpt.get)
          .select(col("vec_id"), col("cid"), col("e"), col("nrm"))
      case _ => encodeWithModel(books, centsOpt, residual, raw, wide = true)
    }
    // MATERIALIZE the encode result before the range layout:
    // repartitionByRange SAMPLES its child to pick boundaries, which
    // would execute the expensive encode plan TWICE (measured on the
    // r17 cold sf10 pass: ann_ivf build 800 s vs the 640 s per-run
    // encode — the sampling pass re-ran the broadcast-argmax assign).
    // The eager checkpoint pays one bounded write (≤ code-relation
    // size); both the sampling and the shuffle then read it back.
    def layout(codes: DataFrame): DataFrame =
      if (centsOpt.isDefined)
        codes.localCheckpoint(eager = true)
          .repartitionByRange(col("cid"), col("vec_id"))
          .sortWithinPartitions(col("cid"), col("vec_id"))
      else codes
    M.readOrBuildMaintained(s, s"annix_codes_$variant",
      Seq(s"$dir/embeddings.parquet"),
      Seq("variant" -> variant, "model" -> fp, "ver" -> AnnIndexVer))(
      layout(encode(Tables.embeddings(s, dir)))) { (prevCodes, _, deltaFiles) =>
      prevCodes.unionByName(encode(
        graft.sources.Scan.parquet(s, deltaFiles: _*).select(col("vec_id"), col("embedding"))))
    } { (prevCodes, prevStats, removedFiles) =>
      val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
      layout(prevCodes.join(
        graft.sources.Scan.parquet(s, survivors: _*).select(col("vec_id")),
        Seq("vec_id"), "left_semi"))
    }
  }

  /** The materialized index for `dir`'s embeddings snapshot:
    * (codes FileScan, books, cents, residual).  `codes` is null only
    * for an empty corpus (no trained model → nothing to encode) —
    * callers early-out to [[emptyTopK]].  Per invocation this costs
    * the model artifact's stat check + one O(1) model collect; the
    * corpus-sized work (train + encode) is paid once per snapshot.
    */
  private[graft] def annIndexed(s: SparkSession, dir: String, variant: String):
      (DataFrame, Array[Array[Array[Double]]], Option[Array[Array[Double]]], Boolean) = {
    val model = annModelDf(s, dir, variant)
    val (books, centsOpt, residual) = modelFromDf(model)
    if (books.isEmpty && centsOpt.isEmpty) return (null, books, centsOpt, residual)
    val fp = modelFingerprint(books, centsOpt, residual)
    (annCodesDf(s, dir, variant, books, centsOpt, residual, fp),
      books, centsOpt, residual)
  }

  private[graft] val AnnExactVer = "1"

  /** Materialized EXACT top-10 baseline (`annix_exact`) — the fifth
    * index artifact, closing the r17 `weak`: the exact brute-force
    * leg was the one ANN result still recomputed per invocation
    * (|Q|·n scoring inside [[annBruteforce]], re-paid inline by
    * ann_recall_report and knn_label_vote — 189 s + 484 s + 183 s of
    * the r17 warm sf10 suite for three restatements of the same
    * |Q|·k rows).  Schema (q_id, vec_id, cos) at FULL double
    * precision: exactly the top-k winner set, no rank (the consumers
    * re-derive rk + the rounded presentation through the same
    * [[topKRows]] aggregate, whose (score desc, id asc) total order
    * makes re-aggregation of the stored winners reproduce the inline
    * result bit-for-bit).
    *
    * Unlike the trained tier there is NO carried model, so the
    * maintenance contract is the STRONG one (delta/delete ≡ full
    * rebuild by VALUE, the neardup_pairs discipline, spec-pinned):
    *
    *  - append: new vectors can only displace incumbents, never
    *    resurrect non-winners, so new top-k ⊆ prev winners ∪ batch;
    *    the batch is scored against the (unchanged) query fixture —
    *    |batch|·|Q| work, the append fraction of a full build — and
    *    each prev row's k-th score is a PERFECT admission τ for its
    *    query (any batch row that places must beat it; `>=` keeps
    *    boundary ties).  Fixture stability is checked first: a batch
    *    candidate (vec_id ≡ 0 mod 100) that would enter the
    *    first-[[QueryCap]] window changes the query set itself →
    *    decline to full.  Fixture vectors are point-looked-up from
    *    the PRIOR files under `vec_id <= qmax` (row-group pruning on
    *    the id-sorted layout), never a corpus scan.
    *  - takedown: the artifact is invariant under removal of any
    *    vector it does not reference (not a query, not a winner —
    *    all candidates ≤ qmax ARE fixture members, so a removal can
    *    only promote a new fixture member by removing a referenced
    *    one).  The check is one broadcast-semi-join of the ≤|Q|·(k+1)
    *    referenced ids against the survivors' id column — map-side,
    *    no corpus shuffle; any dangling reference → decline to full
    *    (the k-th slot's replacement is unknowable from the artifact).
    *  - mixed rides the seam's remove∘delta composition of the two.
    */
  private[graft] def annExactDf(s: SparkSession, dir: String): DataFrame = {
    val M = graft.sources.Materialize
    val k = 10
    M.readOrBuildMaintained(s, "annix_exact",
      Seq(s"$dir/embeddings.parquet"),
      Seq("k" -> k.toString, "qcap" -> QueryCap.toString, "ver" -> AnnExactVer))({
      val v = vecs(s, dir)
      bruteforceRows(v, queryVecs(v), k, Some(corpusSize(s, dir)))
        .select(col("q_id"), col("vec_id"), col("cos"))
    }) { (prev, prevFiles, deltaFiles) =>
      val batch = prep(graft.sources.Scan.parquet(s, deltaFiles: _*)
        .select(col("vec_id"), col("embedding")))
      // bounded actions (≤ QueryCap + 1 rows): the fixture-stability
      // gate.  A fixture below capacity absorbs ANY new candidate; a
      // full fixture absorbs a candidate below its max — either way
      // the query set itself changes and the artifact's rows answer
      // the wrong questions → decline.
      val qIds = prev.select(col("q_id")).distinct().collect().map(_.getLong(0))
      val qmax = if (qIds.isEmpty) Long.MinValue else qIds.max
      val candMin = batch.filter(col("vec_id") % 100 === 0)
        .agg(min(col("vec_id"))).head
      val fixtureChanges = !candMin.isNullAt(0) &&
        (qIds.length < QueryCap || candMin.getLong(0) < qmax)
      if (fixtureChanges) null
      else if (qIds.isEmpty) prev // no queries: artifact stays empty
      else {
        // fixture = ALL candidates ≤ qmax (it holds the smallest
        // QueryCap candidates, so nothing below its max is outside
        // it); the <= qmax predicate row-group-prunes the id-sorted
        // snapshot down to a point lookup
        val qsrc = prep(graft.sources.Scan.parquet(s, prevFiles: _*)
            .select(col("vec_id"), col("embedding")))
          .filter(col("vec_id") <= qmax && col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        // per-query admission τ from the incumbents: the stored k-th
        // (= min over exactly-k stored rows) bounds every possible
        // entrant; a query holding < k rows admits everything
        val ptau = prev.groupBy(col("q_id"))
          .agg(min(col("cos")).as("kmin"), count(lit(1)).as("cnt"))
          .select(col("q_id"),
            when(col("cnt") >= k, col("kmin")).otherwise(lit(-1e300)).as("ptau"))
        val scored = batch.join(broadcast(qsrc), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
          .join(broadcast(ptau), Seq("q_id"), "left_outer")
          .filter(col("cos") >= coalesce(col("ptau"), lit(-1e300)))
          .select(col("q_id"), col("vec_id"), col("cos"))
        topKRows(prev.unionByName(scored), k)
          .select(col("q_id"), col("vec_id"), col("cos"))
      }
    } { (prev, prevStats, removedFiles) =>
      val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
      if (survivors.isEmpty) null
      else {
        // every id the artifact references (its queries + winners,
        // ≤ |Q|·(k+1) values) must still exist; the check broadcasts
        // the small reference set against the survivors' id column —
        // map-side semi-join, no corpus shuffle, two bounded actions
        val ref = prev.select(col("q_id").as("id"))
          .unionByName(prev.select(col("vec_id").as("id"))).distinct()
          .localCheckpoint(eager = true)
        val refN = ref.count()
        val present = graft.sources.Scan.parquet(s, survivors: _*)
          .select(col("vec_id").as("id"))
          .join(broadcast(ref), Seq("id"), "left_semi").distinct().count()
        if (present < refN) null else prev
      }
    }
  }

  /** Probed-cells prefilter: ONE bounded collect (≤ |Q|·nprobe ints —
    * both contract-bounded) turns the probe set into an In(cid)
    * literal the FileScan can push down; with the cid-range layout,
    * unprobed cells' files never leave disk.  Semantically a no-op
    * (the probe join's equality subsumes it) — pure scan pruning.
    */
  private def probePrune(codes: DataFrame, probes: DataFrame): DataFrame = {
    val cids = probes.select(col("probe")).distinct().collect().map(_.getInt(0))
    codes.filter(col("cid").isin(cids.toSeq: _*))
  }

  /** Search the IVF-Flat codes artifact: probe prune, broadcast probe
    * join, exact in-cell cosine, map-side top-k.  Bit-identical to
    * [[ivfSearch]] on the same snapshot (same deterministic training,
    * same probes, same dot arithmetic — parquet round-trips doubles
    * exactly).
    */
  private def ivfFlatSearchOn(codes: DataFrame, cents: Array[Array[Double]],
      q0: DataFrame, k: Int): DataFrame = {
    val nprobe = math.max(4, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val probes = queryProbes(q0, cents, nprobe).localCheckpoint(eager = true)
    val scored = probePrune(codes, probes).join(broadcast(probes),
        col("cid") === col("probe") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** kNN label vote — similarity search applied: each fixture query
    * takes the majority label of its exact top-10 neighbors (ties →
    * smaller label), alongside its own label for accuracy auditing.
    * The vote consumes the [[annExactDf]] artifact (the |Q|·k winner
    * set as a FileScan — r18; the r17 form re-ran the exact corpus
    * scan inline, 183 s of the warm sf10 suite): label lookups
    * broadcast the winner set into two narrow scans of the corpus
    * labels, and the vote window runs over |Q|·#labels rows —
    * nothing corpus-sized ever shuffles.
    */
  def knnLabelVote(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val top = annExactDf(s, dir).select(col("q_id"), col("vec_id"))
    val votes = labels.join(broadcast(top), "vec_id")
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label"))
    val pred = votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
    labels.select(col("vec_id").as("qv"), col("label").as("own_label"))
      .join(broadcast(pred), col("qv") === col("q_id"))
      .select(col("q_id"), col("pred_label"), col("votes"), col("own_label"))
      .orderBy(col("q_id"))
  }

  /** Label-noise audit over the WHOLE corpus — the O(n·|labels|)
    * companion to [[knnLabelVote]]'s fixture-bounded O(|Q|·n) vote:
    * each label gets a centroid of its members' unit vectors, every
    * vector is re-assigned to its nearest centroid by cosine, and the
    * output is the (own_label, pred_label) confusion matrix with
    * per-cell counts — off-diagonal mass IS the suspected-noise set,
    * the centroid-distance screen used in practice before paying for
    * a kNN pass on the flagged slice.
    *
    * Determinism contract (the [[kmeansTrain]] rule): centroid
    * components accumulate as DECIMAL(38,18) sums of `e[i]/nrm` —
    * decimal addition is exact and order-insensitive, so the
    * centroids (and therefore every downstream cosine) are
    * bit-identical on any partitioning, and the DuckDB oracle replays
    * them exactly.  Each component casts to double ONCE (correctly
    * rounded, engine-identical) before the cosine; the per-cell
    * `sum_cos6` confidence mass rounds each cosine to 6 places and
    * sums in DECIMAL so the report aggregate is order-insensitive too.
    *
    * Scale shape: the per-label sums collapse map-side to ≤
    * |labels|·dim rows; the ≤ |labels|-row centroid relation
    * BROADCASTS into one corpus scan (the [[assignCells]] shape —
    * n·|labels| skinny rows, never a corpus-sized shuffle); the
    * argmax window partitions by vec_id over |labels| rows per key;
    * the output is ≤ |labels|² rows.  Nothing corpus-sized lands on
    * the driver and no pairwise n² term exists anywhere.
    */
  def labelNoiseCentroid(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      .filter(col("nrm") > 0)
      .localCheckpoint(eager = false) // centroid sums + scoring share
    val sums = v
      .select(col("label"), col("nrm"), posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum((col("x") / col("nrm")).cast("decimal(38,18)")).as("sx"))
    val cents = sums
      .groupBy(col("label").as("clabel"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sx")))).as("ps"))
      .select(col("clabel"),
        transform(col("ps"), p => p.getField("sx").cast("double")).as("ce"))
      .withColumn("cnrm", l2Norm(col("ce")))
    val scored = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label").as("own_label"), col("clabel"),
        (dot(col("e"), col("ce")) / (col("nrm") * col("cnrm"))).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("own_label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("cos"), 6).cast("decimal(18,6)")).cast("double").as("sum_cos6"))
      .orderBy(col("own_label"), col("pred_label"))
  }

  /** The kNN-confirmation tier above [[labelNoiseCentroid]]'s screen:
    * every vector's k=5 nearest neighbors vote on its label (majority,
    * ties → smaller label), and the output is ONLY the flagged slice —
    * vectors whose neighborhood disagrees with their own label, with
    * the vote count as confidence.  Where the centroid screen models
    * each class as one ball, the kNN vote is local: it catches noise
    * inside multi-modal classes the centroid can't see.
    *
    * Scale shape: consumes the MATERIALIZED (delta-maintained)
    * knn_edges substrate — no similarity search here, just one keyed
    * join of the edge list onto the (vec_id, label) projection, a
    * (q_id, label)-keyed count, and a per-q_id window over ≤ k rows.
    * Rows-only by design (the substrate's LSH bucketing is
    * approximate); the spec pins the vote against a sequential replay
    * over the same edges.
    */
  /** Label-balance audit across corpus slices — the FIRST report a
    * labeled-dataset owner reads (is any source's class distribution
    * skewed vs the corpus?): per (source, label), the count, the
    * within-source share and its deviation from the global label
    * share, both as exact integer ppm quotients (n·10⁶ div n_source —
    * the active_users stickiness discipline: no float division in the
    * oracle lane).  Joins the label relation to the document slice
    * relation on the shared id — an equi-join both engines shuffle on
    * the key (co-partition/bucket at warehouse scale), then ONE
    * |sources|·|labels| keyed aggregate; the per-source and global
    * totals re-aggregate those bounded cells and broadcast back.
    */
  def labelBalance(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
      .join(Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("source")),
        Seq("vec_id"))
      .groupBy(col("source"), col("label")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // totals + output share the cells
    val bySrc = cells.groupBy(col("source")).agg(sum(col("n")).as("ns"))
    val byLbl = cells.groupBy(col("label")).agg(sum(col("n")).as("nl"))
    val tot = cells.agg(sum(col("n")).as("nt"))
    cells
      .join(broadcast(bySrc), Seq("source"))
      .join(broadcast(byLbl), Seq("label"))
      .join(broadcast(tot))
      .select(col("source"), col("label"), col("n"),
        expr("n * 1000000 div ns").as("share_ppm"),
        expr("n * 1000000 div ns - nl * 1000000 div nt").as("skew_ppm"))
      .orderBy(col("source"), col("label"))
  }

  def labelNoiseKnn(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val edges = knnJoinEmbeddings(s, dir).select(col("q_id"), col("vec_id"))
    val votes = edges.join(labels, "vec_id")
      .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label"))
    val pred = votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("label").as("pred_label"), col("votes"))
    labels.select(col("vec_id"), col("label").as("own_label"))
      .join(pred, "vec_id")
      .filter(col("pred_label") =!= col("own_label"))
      .select(col("vec_id"), col("own_label"), col("pred_label"), col("votes"))
      .orderBy(col("vec_id"))
  }

  /** Distributed spherical k-means (Lloyd's) over the FULL corpus — the
    * scale path for quantizer training when a bounded driver-local
    * sample isn't enough (the per-run IVF/PQ entries train on
    * [[trainingSample]]'s ≤64k rows; at 100 TB the production coarse
    * quantizer trains on everything, with driver state still bounded).
    *
    * Each iteration is ONE distributed pass: literal-centroid argmax
    * assignment (map-side codegen, the [[assignCells]] IVF path) then
    * the centroid update as posexplode → (cid, dim)-keyed sums —
    * map-side partials collapse every partition to ≤ k·dim rows, so
    * the shuffle and the driver collect are O(k·dim), never
    * corpus-sized.  The sums accumulate in DECIMAL(38,18): decimal
    * addition is exact and therefore ORDER-INSENSITIVE, so training is
    * bit-identical on any partitioning/cluster layout — double sums
    * would make the trained model depend on shuffle arrival order.
    * Empty cells keep their previous centroid.  Seeds are the k corpus
    * vectors with the smallest (xxhash64(vec_id), vec_id) —
    * deterministic, and TakeOrderedAndProject keeps the seed scan
    * O(k) per partition.
    *
    * Runs `iters + 1` jobs at call time (one per Lloyd pass + seeding);
    * `corpus` should be a materialized table.  Returns the trained
    * unit centroids and the assigned (vec_id, e, nrm, cid) frame.
    */
  def kmeansTrain(corpus: DataFrame, k: Int, iters: Int): (Array[Array[Double]], DataFrame) = {
    // contract-bound the per-iteration driver collect like every other
    // driver action in this file: each Lloyd pass brings back ≤ k·dim
    // (cid, pos, sum) rows, so k and k·dim are asserted against
    // [[KmeansCollectBudget]] up front rather than discovered as an OOM
    // mid-train.  k is checked before any job; k·dim right after the
    // seed collect reveals dim.
    require(k > 0 && k <= 65536,
      s"kmeansTrain: k=$k outside (0, 65536] — the per-iteration driver collect is k·dim rows")
    // widen (r18): every Lloyd pass is a compute-bound assignment scan,
    // single-task on a one-row-group corpus (sf10 warm: kmeans_embed
    // 84.5 s at task ≈ wall).  Training is DESIGNED partitioning-
    // independent (decimal sums, deterministic hash-ordered seeds), so
    // the widen is value-neutral by the operator's own contract.
    val v = widen(prep(corpus))
    // Lloyd passes are bounded (cid, pos)-keyed aggregates — ≤ k·dim
    // keys (budget-asserted below), only map-side partials cross the
    // exchange — collected per round: AQE-off + 1-partition reduce for
    // the training loop cuts the per-pass job/task overhead
    // (GraftSession.boundedAgg scaladoc); the RETURNED assignment
    // frame executes outside this scope, under AQE as before.
    graft.GraftSession.boundedAgg(corpus.sparkSession) {
    val seeds = v
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select(col("e"), col("nrm")).collect()
      .map { r =>
        val n = r.getAs[Double]("nrm")
        r.getAs[scala.collection.Seq[Double]]("e").map(_ / n).toArray
      }
    require(seeds.nonEmpty, "kmeansTrain: empty corpus")
    require(k.toLong * seeds(0).length <= KmeansCollectBudget,
      s"kmeansTrain: k·dim = ${k.toLong * seeds(0).length} exceeds the " +
        s"driver-collect budget $KmeansCollectBudget (k=$k, dim=${seeds(0).length})")
    var cents = seeds
    for (_ <- 1 to iters) {
      val sums = assignCells(v, cents)
        .select(col("cid"), col("nrm"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum((col("x") / col("nrm")).cast("decimal(38,18)")).as("sx"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cid"))
      cents = cents.zipWithIndex.map { case (old, cid) =>
        byCell.get(cid).map { rows =>
          val acc = new Array[Double](old.length)
          rows.foreach(r =>
            acc(r.getAs[Int]("pos")) = r.getAs[java.math.BigDecimal]("sx").doubleValue())
          val n = math.sqrt(acc.map(x => x * x).sum)
          if (n > 0) acc.map(_ / n) else old
        }.getOrElse(old)
      }
    }
    (cents, assignCells(v, cents))
    }
  }

  /** Driver entry: k = 8, 4 Lloyd passes over the embedding corpus;
    * per-cluster size and mean within-cluster cosine (decimal-summed →
    * one double division, so the report is as order-insensitive as the
    * training).  Rows-only oracle (k-means isn't SQL-expressible); the
    * spec pins determinism, partition totals, and objective ascent.
    */
  def kmeansEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cents, assigned) = kmeansTrain(Tables.embeddings(s, dir), 8, 4)
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toSeq.toDF("cid", "c"))
    assigned.join(centDf, "cid")
      .select(col("cid"),
        ((dot(col("e"), col("c")) / col("nrm")).cast("decimal(38,18)")).as("cos_d"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("cos_d")).cast("double") / count(lit(1)), 6).as("mean_cos6"))
      .orderBy(col("cid"))
  }

  /** Cluster-stratified coreset selection — the diversity-sampling
    * pass between dedup and mixing: cap every semantic region at
    * `quota` docs, keeping each region's most PROTOTYPICAL members
    * (highest cosine to the cluster centroid), so dense regions stop
    * drowning sparse ones in the training mix (the SemDeDup /
    * prototypes curation move, and what [[GraphOps.pageRank]] ranks
    * globally this op enforces per-region).
    *
    * Scale shape: training is [[kmeansTrain]] (bounded k·dim driver
    * state, decimal-exact ⇒ deterministic); assignment + scoring are
    * map-side (literal-codegen argmax at this k); the SELECTION is one
    * cid-keyed [[TopKScoredAgg]] — ≤2·quota rows per cluster survive
    * each map partition, so the only shuffle after assignment carries
    * ≤ partitions·k·2·quota winner rows, never the corpus.  k keys in
    * the final aggregate is not a skew funnel for the same reason: the
    * partials arrive pre-capped.  Output order (sim desc, vec_id asc)
    * is total ⇒ the sample is bit-deterministic on any layout.
    */
  def diversitySample(corpus: DataFrame, k: Int, iters: Int,
      quota: Int, sampleTrain: Boolean = false): DataFrame = {
    require(quota > 0, s"diversitySample: quota must be positive, got $quota")
    // sampleTrain is the 100 TB knob: centroids from the shared ≤64k
    // deterministic hash sample, Lloyd entirely driver-local, then ONE
    // distributed assignment+selection pass — versus kmeansTrain's
    // iters+1 full-corpus passes.  Region caps only need centroids
    // good enough to separate semantic regions; prototypical-member
    // selection within a region is robust to the centroid jitter a
    // 64k sample carries (spec-pinned: identical selections on
    // well-separated planted clusters).  The default stays full-train
    // — exact Lloyd's, and the committed oracle replay depends on it.
    val (cents, assigned) =
      if (sampleTrain) {
        val v = prep(corpus)
        val units = trainingSample(v, Scan.countFor(corpus))
        require(units.nonEmpty, "diversitySample: empty corpus")
        val cs = sphericalKMeans(units, k, iters)
        (cs, assignCells(v, cs))
      } else kmeansTrain(corpus, k, iters)
    val s = corpus.sparkSession
    import s.implicits._
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toSeq.toDF("cid", "c"))
    assigned.join(centDf, "cid")
      .select(col("cid"), col("vec_id"),
        (dot(col("e"), col("c")) / col("nrm")).as("sim"))
      .groupBy(col("cid"))
      .agg(TopKScoredAgg.topKScored(col("sim"), col("vec_id"), quota).as("top"))
      .select(col("cid"), posexplode(col("top")).as(Seq("rank", "t")))
      .select(col("cid"), col("rank").cast("long").as("rank"),
        col("t.id").as("vec_id"), col("t.score").as("sim"))
      .orderBy(col("cid"), col("rank"))
  }

  /** Driver entry: 8 clusters × 4 Lloyd passes, quota 32 — ≤256
    * sampled prototypes over the embedding corpus.  Rows-only oracle
    * (k-means isn't SQL); the spec replays the selection locally from
    * the same deterministic model and checks exact equality.
    */
  def diversitySampleEmbeddings(s: SparkSession, dir: String): DataFrame =
    diversitySample(Tables.embeddings(s, dir), 8, 4, 32)

  /** FILTERED vector search: exact top-k restricted to corpus rows
    * satisfying a metadata predicate — here label equality with the
    * query's own label, the canonical "same-class nearest neighbors"
    * pull (same-language/same-source retrieval, class-conditional
    * hard-negative mining).  Filtered search is where post-filtering
    * an unfiltered top-k silently breaks (a query whose class is rare
    * keeps < k survivors); pushing the predicate INTO the scoring
    * join keeps k exact per query at zero extra passes.  Same
    * broadcast-query corpus-scan shape as [[annBruteforce]] — the
    * predicate rides the broadcast join condition map-side, so
    * selectivity only REDUCES scored pairs; oracle-EXACT (the
    * predicate is SQL).
    */
  def annFiltered(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      .filter(col("nrm") > 0)
    val q = v.filter(col("vec_id") % 100 === 0)
      .orderBy(col("vec_id")).limit(QueryCap)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("e").as("qe"), col("nrm").as("qnrm"))
    def score(c: DataFrame) = c.join(broadcast(q),
        col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    // τ-pruned like the unfiltered scan; a label absent from the first
    // [[TauSampleRows]] rows simply yields τ = −∞ for its queries
    topKPerQuery(tauPrune(score, v, 10, Some(corpusSize(s, dir))), 10)
  }

  /** ANN in PCA-reduced space: the composition [[pcaTrain]] exists
    * for — project corpus + queries to the top-p subspace, score
    * there (p ≪ dim: each comparison costs p/dim of full-dim work;
    * at scale the projected corpus also feeds LSH/IVF indexes that
    * shrink dim/p-fold).  Cosine in the PROJECTED space: the
    * variance-optimal p-dim approximation of the full-dim angle —
    * recall vs full-dim exact search is the quality metric, pinned
    * by the spec.  The synthetic corpus's spectrum is NEAR-FLAT
    * (measured at sf0.001: top-8 of 64 dims hold 20% of the
    * variance, top-16 hold 38%, half needs 24 dims), so p is a
    * recall dial, not a free lunch: measured mean recall@10 vs
    * full-dim exact is 0.14 at p=8, 0.34 at p=16, 0.50 at p=32
    * (chance ≈ 0.02).  The driver entry runs p=16 — 4× cheaper
    * scoring at 17× over chance.  Rows-only (eigensolve upstream).
    */
  def annPca(s: SparkSession, dir: String): DataFrame = annPcaP(s, dir, 16)

  /** Scalar (int8) quantization search — the simplest of the
    * memory-compression ANN paths: each dimension's corpus range
    * [lo_i, hi_i] splits into 256 uniform cells, a vector stores one
    * byte per dimension (8× under float64, dim bytes/row total), and
    * scoring reconstructs the CELL MIDPOINT lo_i + (c_i + 0.5)·s_i
    * against exact query vectors (asymmetric distance, the PQ/ADC
    * convention: queries stay exact, only the corpus is coded).
    * Per-dim quantization error is bounded by s_i/2 = range/512 —
    * on this corpus recall@10 vs exact search is ~0.9+, far above
    * the sketch paths, at dim-byte memory.  SQ8 is what a 100 TB
    * store uses when PQ's codebook training is unwarranted: stats
    * are ONE posexplode aggregate (≤ dim driver rows, min/max exact
    * and order-insensitive), encode/decode are stateless map-side
    * expressions — no trained model to version at all.
    *
    * Every arithmetic step (min/max, floor, clamp, midpoint, fold
    * dot) is the same IEEE double expression in DuckDB ⇒ unlike the
    * trained quantizers this one is oracle-EXACT.
    */
  def annSq8(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val stats = v.select(posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect().sortBy(_.getInt(0))
    require(stats.nonEmpty, "annSq8: empty corpus")
    val lo = stats.map(_.getDouble(1))
    val scale = stats.map { r =>
      val d = r.getDouble(2) - r.getDouble(1); if (d > 0) d / 255.0 else 1.0
    }
    val loLit = typedLit(lo.toSeq)
    val scLit = typedLit(scale.toSeq)
    // encode + midpoint-decode fused in one indexed transform: the
    // stored form is the int code; reconstruction is what scoring sees
    val recon = transform(col("e"), (x, i) => {
      val l = element_at(loLit, i + 1)
      val sc = element_at(scLit, i + 1)
      l + (least(lit(255), greatest(lit(0), floor((x - l) / sc).cast("int"))) + lit(0.5)) * sc
    })
    val pv = v.select(col("vec_id"), recon.as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      .filter(col("nrm") > 0)
    bruteforce(pv, queryVecs(v), 10, Some(corpusSize(s, dir)))
  }

  private[graft] def annPcaP(s: SparkSession, dir: String, p: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (mean, basis, _) = pcaTrain(emb, p)
    val pv = pcaProject(emb, mean, basis)
      .select(col("vec_id"), col("proj").as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      .filter(col("nrm") > 0)
    bruteforce(pv, queryVecs(pv), 10, Some(corpusSize(s, dir)))
  }

  /** PCA basis over the embedding corpus, trained on the deterministic
    * ≤[[TrainMaxSample]] hash sample (the IVF/PQ training idiom —
    * bounded driver state at ANY corpus size; the basis is a dim×dim
    * model, so like a quantizer codebook it trains on a sample and
    * applies everywhere).  RAW vectors, not unit-normalized: PCA is a
    * variance decomposition of the embedding space itself.
    *
    * Driver-local and bit-deterministic: sample sorted by vec_id →
    * mean → covariance (1/n convention) → cyclic Jacobi rotations
    * (fixed sweep cap, tolerance-converged — the textbook symmetric
    * eigensolver, sequential arithmetic) → eigenpairs ordered by
    * (eigenvalue desc, index) with each vector's sign canonicalized
    * (largest-|component| entry positive), so the trained basis is
    * identical on any partitioning/cluster layout.
    *
    * Returns (mean, top-p basis rows, their eigenvalues).
    */
  private[graft] def pcaTrain(corpus: DataFrame, p: Int): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val v = prep(corpus)
    val n = v.count()
    val rate = math.min(1.0, TrainMaxSample.toDouble / math.max(n, 1L))
    val keepBelow = math.max(1L, (rate * 1000000L).toLong)
    // the hash filter yields an EXPECTED ≈TrainMaxSample rows (binomial
    // around rate·n) — cap the distributed side at 2× expectation so
    // the driver collect is hard-bounded even on a pathological tail,
    // then truncate deterministically (vec_id order) to the budget
    val sample = v.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) < lit(keepBelow))
      .select(col("vec_id"), col("e"))
      .orderBy(col("vec_id")).limit(2 * TrainMaxSample)
      .collect()
      .map(_.getSeq[Double](1).toArray)
      .take(TrainMaxSample)
    require(sample.nonEmpty, "pcaTrain: empty corpus")
    val dim = sample(0).length
    require(p >= 1 && p <= dim, s"pcaTrain: p=$p outside [1, $dim]")
    val m = new Array[Double](dim)
    sample.foreach(x => { var i = 0; while (i < dim) { m(i) += x(i); i += 1 } })
    locally { var i = 0; while (i < dim) { m(i) /= sample.length; i += 1 } }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { x =>
      var i = 0
      while (i < dim) {
        val xi = x(i) - m(i)
        var j = i
        while (j < dim) { cov(i)(j) += xi * (x(j) - m(j)); j += 1 }
        i += 1
      }
    }
    locally { var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { cov(i)(j) /= sample.length; cov(j)(i) = cov(i)(j); j += 1 }
        i += 1
      } }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(p)
    val basis = order.map { k =>
      val vec = Array.tabulate(dim)(i => evecs(i)(k))
      // canonical sign: the largest-|entry| component is positive
      var bi = 0
      locally { var i = 1; while (i < dim) { if (math.abs(vec(i)) > math.abs(vec(bi))) bi = i; i += 1 } }
      if (vec(bi) < 0) vec.map(-_) else vec
    }.toArray
    (m, basis, order.map(evals(_)).toArray)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: sweep all
    * (p, q) pairs, rotating each off-diagonal toward zero, until the
    * off-diagonal Frobenius mass falls under tolerance (quadratic
    * convergence; the sweep cap is a runaway guard).  Returns
    * (eigenvalues, eigenvector MATRIX with eigenvectors as columns).
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val scale = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = 0; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.max(s, java.lang.Double.MIN_NORMAL)
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > 1e-24 * scale) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Distributed projection onto a trained PCA basis: per row,
    * y_j = (e − mean) · basis_j — p·dim map-side flops through the
    * sequential-fold [[graft.functions.DotProduct]], zero shuffle.
    * The 100 TB dimensionality-reduction pass before ANN indexing /
    * clustering: at p ≪ dim the downstream index shrinks dim/p-fold
    * while the top-p basis keeps the variance that separates regions.
    */
  def pcaProject(corpus: DataFrame, mean: Array[Double], basis: Array[Array[Double]]): DataFrame = {
    val centered = zip_with(col("e"), typedLit(mean.toSeq), (x, mm) => x - mm)
    prep(corpus)
      .select(col("vec_id"), centered.as("ce"))
      .select(col("vec_id"),
        array(basis.map(b => dot(col("ce"), typedLit(b.toSeq))).toIndexedSeq: _*).as("proj"))
  }

  /** Driver entry: top-8 components, exploded to SCALAR rows
    * (vec_id, pos, value) — every driver entry emits scalar columns
    * so the external verification harness can sort/hash the frame
    * (an array&lt;double&gt; column is unhashable there; library
    * consumers wanting the array form use [[pcaProject]] directly).
    * Eigensolve upstream ⇒ rows-only oracle; the spec pins
    * orthonormality, the eigen equation, variance ordering and
    * layout determinism.
    */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (mean, basis, _) = pcaTrain(emb, 8)
    pcaProject(emb, mean, basis)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "value")))
      .orderBy(col("vec_id"), col("pos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication — k-means cells bound the candidate space, exact
    * pairwise cosine WITHIN each cell finds semantic duplicates
    * (paraphrases/re-renders that exact and n-gram dedup both miss),
    * and one representative per near-dup neighborhood survives.
    *
    * Deterministic representative policy: a vector is DROPPED iff a
    * SMALLER-id same-cell vector sits within cosine ≥ `tau` — so a
    * near-dup group's minimum id always survives (the [[Dedup
    * .dedupExact]] keep_id convention), a hub similar only to larger
    * ids also survives, and the verdict is a pure function of the
    * (deterministic, decimal-exact) trained cells — reproducible on
    * any layout.  The paper keeps a random/centroid-farthest member;
    * min-id is the reproducible choice and changes nothing about
    * which NEIGHBORHOODS collapse.
    *
    * Scale shape: training is [[kmeansTrain]] (bounded k·dim driver
    * state); assignment is map-side; the only corpus-sized shuffle
    * keys on cid, and pair volume is Σ_cell n_c² — sized by k (pick
    * k ∝ n/target_cell so cells stay ~constant as the corpus grows;
    * AQE skew-splits a hot cell's sort-merge join).  The all-pairs
    * step never crosses cells by construction.
    */
  def semDedup(corpus: DataFrame, k: Int, iters: Int, tau: Double): DataFrame = {
    val (_, assigned) = kmeansTrain(corpus, k, iters)
    val banded = assigned.select(col("cid"), col("vec_id"), col("e"), col("nrm"))
      .repartition(col("cid"))
    // merge hints keep both sides reading the ONE cid exchange (the
    // [[Dedup.ngramJaccardPairs]] self-join discipline)
    val dropped = banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")) >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned.select(col("vec_id"), col("cid"))
      .join(dropped.withColumn("drop", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), coalesce(!col("drop"), lit(true)).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Driver entry: 8 cells, 4 Lloyd passes, tau = 0.4 (the
    * [[Dedup.dedupEmbedding]] near-dup threshold on this corpus) —
    * per-vector verdicts.  k-means upstream ⇒ rows-only oracle; the
    * spec replays the drop rule exactly against within-cell exact
    * cosines.
    */
  def semDedupEmbeddings(s: SparkSession, dir: String): DataFrame =
    semDedup(Tables.embeddings(s, dir), 8, 4, 0.4)

  /** Recall audit of the compressed/sketched ANN paths against exact
    * search — the number an index owner actually watches: for each
    * path, hits@10 against the brute-force top-10 over the SAME query
    * fixture, as an integer ppm (hits·10⁶ div 10·|Q| — exact, no
    * float mean).  Emitting the audit AS a query makes the
    * recall/cost trade a monitored artifact instead of scaladoc
    * folklore: a testdata regeneration or parameter drift that moves
    * recall shows up in the driver's rows, and the spec pins each
    * path's floor (the same floors the per-path specs pin).
    *
    * Pure plan builder: per path ONE left-semi join of its (q_id,
    * vec_id) pairs against the brute-force pairs + 1-row aggregates,
    * unioned.  The brute-force reference is the [[annExactDf]]
    * artifact — a |Q|·k-row FileScan, so the audit's marginal cost is
    * the seven approximate legs alone (r17's `weak`: the report
    * re-paid the exact |Q|·n scan inline per invocation, 484 s of
    * the warm sf10 suite).  Upstream paths are trained/hashed (no
    * SQL image) ⇒ rows-only.
    */
  def annRecallReport(s: SparkSession, dir: String): DataFrame = {
    val bf = annExactDf(s, dir).select(col("q_id"), col("vec_id"))
    // denominator = the FIXTURE's query count, from the brute-force
    // frame — a path that returns nothing for a query scores 0 hits
    // over the same denominator, not a silently shrunken one (a
    // path-side countDistinct would inflate recall exactly when a
    // path drops queries, the failure the audit exists to expose)
    val nq = bf.agg(countDistinct(col("q_id")).as("n_queries"))
    // the compressed legs ride the materialized index tier — each is a
    // search-only FileScan once the snapshot's artifacts exist, so the
    // audit's marginal cost is |Q|-bounded per leg, not a re-train
    val paths: Seq[(String, DataFrame)] = Seq(
      "lsh" -> annLsh(s, dir),
      "pca16" -> annPca(s, dir),
      "sq8" -> annSq8(s, dir),
      "ivf" -> annIvf(s, dir),
      "pq" -> annPq(s, dir),
      "ivfpq" -> annIvfPq(s, dir),
      "ivfpqr" -> annIvfPqResidual(s, dir))
    paths.map { case (nm, df) =>
      df.select(col("q_id"), col("vec_id"))
        .join(bf, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(nq))
        .select(lit(nm).as("path"), col("n_queries"), col("hits"),
          expr("hits * 1000000 div (10 * n_queries)").as("recall_ppm"))
    }.reduce(_.unionAll(_)).orderBy(col("path"))
  }

  /** Embedding-table audit — [[Pipeline.colProfileDocs]]'s sibling for
    * the vector table, the checks run BEFORE building any index:
    * dimension uniformity (a ragged dim breaks every path), zero-
    * vector count (dropped by the cosine ops — how many?), and the
    * norm² distribution (exact counting median/p99 over the 1e-4
    * integer grid) — a collapsed or exploding norm profile is the
    * classic sign of a broken embedding export.
    *
    * Exactness: norm² is the deterministic sequential fold
    * ([[graft.functions.DotProduct]] ≡ DuckDB's list_sum fold — the
    * ann-oracle parity contract), gridded by ONE floor into the
    * integer lane; percentiles then COUNT over the histogram (the
    * skew_report convention).  One output row; the only non-keyed
    * step is the cumulative window over the |distinct grid values|
    * histogram.
    */
  def embedAudit(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(s, dir)
      .select(toDouble(col("embedding")).as("e"))
      .select(size(col("e")).as("dim"), dot(col("e"), col("e")).as("n2"))
      .select(col("dim"), col("n2"),
        floor(col("n2") * lit(10000)).cast("long").as("n2e4"))
      .localCheckpoint(eager = false) // histogram + corpus stats share
    val hist = v.groupBy(col("n2e4")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("n2e4")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("hi", sum(col("cnt")).over(w))
    val stats = v.agg(count(lit(1)).as("n_vecs"),
      min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
      sum(when(col("n2") === 0.0, 1L).otherwise(0L)).as("n_zero"))
    cum.crossJoin(broadcast(stats))
      .groupBy(col("n_vecs"), col("dim_min"), col("dim_max"), col("n_zero"))
      .agg(
        min(when(col("hi") * 2 >= col("n_vecs"), col("n2e4"))).as("med_n2e4"),
        min(when(col("hi") * 100 >= col("n_vecs") * 99, col("n2e4"))).as("p99_n2e4"))
      .select(col("n_vecs"), col("dim_min"), col("dim_max"), col("n_zero"),
        col("med_n2e4"), col("p99_n2e4"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_audit" -> (embedAudit _),
    "ann_recall_report" -> (annRecallReport _),
    "ann_filtered" -> (annFiltered _),
    "ann_pca" -> (annPca _),
    "embed_pca" -> (embedPca _),
    "semdedup" -> (semDedupEmbeddings _),
    "diversity_sample" -> (diversitySampleEmbeddings _),
    "knn_join" -> (knnJoinEmbeddings _),
    "ann_range" -> (annRange _),
    "kmeans_embed" -> (kmeansEmbed _),
    "ann_bruteforce" -> (annBruteforce _),
    "ann_sq8" -> (annSq8 _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_ivfpq_residual" -> (annIvfPqResidual _),
    "knn_label_vote" -> (knnLabelVote _),
    "label_noise_centroid" -> (labelNoiseCentroid _),
    "label_noise_knn" -> (labelNoiseKnn _),
    "label_balance" -> (labelBalance _))

  def oracleSql: Map[String, String] = Map(
    // exact-integer ppm quotients: both engines integer-divide, so
    // every column is hash-exact
    "label_balance" ->
      """WITH j AS (SELECT d.source, e.label FROM embeddings e
        |           JOIN documents d ON e.vec_id = d.doc_id),
        |c AS (SELECT source, label, COUNT(*) AS n FROM j GROUP BY 1, 2),
        |st AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
        |g AS (SELECT label, SUM(n) AS nl FROM c GROUP BY 1),
        |t AS (SELECT SUM(n) AS nt FROM c)
        |SELECT c.source, c.label, CAST(c.n AS BIGINT) AS n,
        |  CAST(c.n * 1000000 // st.ns AS BIGINT) AS share_ppm,
        |  CAST(c.n * 1000000 // st.ns - g.nl * 1000000 // t.nt AS BIGINT) AS skew_ppm
        |FROM c JOIN st USING (source) JOIN g USING (label) CROSS JOIN t
        |ORDER BY c.source, c.label""".stripMargin,
    // norm² replayed as the SAME left-to-right fold; counting
    // percentiles over the 1e-4 integer grid (skew_report convention)
    "embed_audit" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT CAST(len(e) AS INT) AS dim,
        |  list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i])) AS n2
        |  FROM v),
        |h0 AS (SELECT dim, n2, CAST(floor(n2 * 10000) AS BIGINT) AS n2e4 FROM n),
        |hist AS (SELECT n2e4, COUNT(*) AS cnt FROM h0 GROUP BY 1),
        |cum AS (SELECT n2e4, SUM(cnt) OVER (ORDER BY n2e4
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi FROM hist),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  MIN(dim) AS dim_min, MAX(dim) AS dim_max,
        |  CAST(SUM(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |  FROM h0)
        |SELECT n_vecs, dim_min, dim_max, n_zero,
        |  MIN(CASE WHEN hi * 2 >= n_vecs THEN n2e4 END) AS med_n2e4,
        |  MIN(CASE WHEN hi * 100 >= n_vecs * 99 THEN n2e4 END) AS p99_n2e4
        |FROM cum, st GROUP BY n_vecs, dim_min, dim_max, n_zero""".stripMargin,
    "ann_filtered" ->
      """WITH v0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, label, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, label AS q_label, e AS qe, nrm AS qnrm FROM v
        |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024),
        |scored AS (SELECT q_id, vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |  / (qnrm * nrm) AS cos
        |  FROM v, q WHERE vec_id <> q_id AND label = q_label),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM scored)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos6 FROM rk WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin,
    // the int8 cells replayed step-for-step (min/max, floor, clamp,
    // midpoint) as the SAME IEEE double tree — literals cast to
    // DOUBLE to keep DuckDB's decimal literals out of the arithmetic
    "ann_sq8" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |d AS (SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM
        |       (SELECT unnest(generate_series(1, len(e))) AS pos, unnest(e) AS x FROM v)
        |      GROUP BY pos),
        |st AS (SELECT list(lo ORDER BY pos) AS los,
        |         list(CASE WHEN hi > lo THEN (hi - lo) / CAST(255.0 AS DOUBLE)
        |              ELSE CAST(1.0 AS DOUBLE) END ORDER BY pos) AS scs FROM d),
        |r0 AS (SELECT vec_id, list_transform(generate_series(1, len(e)),
        |         i -> los[i] + (LEAST(255, GREATEST(0,
        |                CAST(floor((e[i] - los[i]) / scs[i]) AS INT))) + CAST(0.5 AS DOUBLE))
        |              * scs[i]) AS e
        |       FROM v, st),
        |r AS (SELECT * FROM (SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM r0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM v
        |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024),
        |scored AS (SELECT q_id, r.vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * r.e[i]))
        |  / (qnrm * r.nrm) AS cos
        |  FROM r, q WHERE r.vec_id <> q_id),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM scored)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos6 FROM rk WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin,
    "ann_range" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM v
        |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024),
        |scored AS (SELECT q_id, vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |  / (qnrm * nrm) AS cos
        |  FROM v, q WHERE vec_id <> q_id)
        |SELECT q_id, vec_id, round(cos, 6) AS cos6 FROM scored
        |WHERE cos >= 0.2 ORDER BY q_id, vec_id""".stripMargin,
    "ann_bruteforce" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM v
        |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024),
        |scored AS (SELECT q_id, vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |  / (qnrm * nrm) AS cos
        |  FROM v, q WHERE vec_id <> q_id),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM scored)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos6 FROM rk WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin,
    "knn_label_vote" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, e, label,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM v
        |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 1024),
        |scored AS (SELECT q_id, vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |  / (qnrm * nrm) AS cos
        |  FROM v, q WHERE vec_id <> q_id),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM scored),
        |top AS (SELECT q_id, vec_id FROM rk WHERE rk <= 10),
        |votes AS (SELECT q_id, label, COUNT(*) AS votes
        |          FROM top JOIN v USING (vec_id) GROUP BY q_id, label),
        |win AS (SELECT q_id, label AS pred_label, votes FROM votes
        |        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, label) = 1)
        |SELECT w.q_id, pred_label, votes, e.label AS own_label
        |FROM win w JOIN embeddings e ON w.q_id = e.vec_id
        |ORDER BY w.q_id""".stripMargin,
    // centroid components replayed as the SAME exact decimal sums the
    // engine computes (order-insensitive), one double cast per
    // component, then the identical cosine expression tree
    "label_noise_centroid" ->
      """WITH v0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, label, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |dims AS (SELECT unnest(generate_series(1, (SELECT MAX(len(e)) FROM v))) AS i),
        |ex AS (SELECT label, i, e[CAST(i AS INT)] / nrm AS x
        |       FROM v JOIN dims ON i <= len(e)),
        |cs AS (SELECT label, i, SUM(CAST(x AS DECIMAL(38,18))) AS sx
        |       FROM ex GROUP BY label, i),
        |c AS (SELECT label AS clabel, list(CAST(sx AS DOUBLE) ORDER BY i) AS ce
        |      FROM cs GROUP BY label),
        |c2 AS (SELECT clabel, ce,
        |  sqrt(list_sum(list_transform(generate_series(1, len(ce)), i -> ce[i] * ce[i]))) AS cnrm
        |  FROM c),
        |sc AS (SELECT vec_id, label AS own_label, clabel,
        |  list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * ce[i]))
        |  / (nrm * cnrm) AS cos
        |  FROM v CROSS JOIN c2),
        |pr AS (SELECT own_label, clabel AS pred_label, cos FROM sc
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                  ORDER BY cos DESC, clabel) = 1)
        |SELECT own_label, pred_label, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(cos, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_cos6
        |FROM pr GROUP BY own_label, pred_label
        |ORDER BY own_label, pred_label""".stripMargin)
}

/** A persistable ANN index: `codes` is the corpus-sized quantized code
  * relation ((vec_id, codes) for PQ; (vec_id, cid, codes) for IVF-PQ —
  * ~16 B/row either way) and `model` the O(1) codebook/centroid/flag
  * relation.  Built by [[Similarity.buildPqIndex]] /
  * [[Similarity.buildIvfPqIndex]]; searched by
  * [[Similarity.searchPqIndex]] / [[Similarity.searchIvfPqIndex]] —
  * the build/search split the per-run `ann_pq`/`ann_ivfpq` entries
  * deliberately fuse: encode ONCE at build time, persist, and every
  * later query batch pays only the probe scan + shortlist re-rank.
  */
final case class AnnIndex(codes: DataFrame, model: DataFrame) {

  /** Persist both relations under `path`.  IVF-PQ code files are
    * partitioned by cell id, so a search against the re-read index
    * prunes unprobed cells at the parquet-directory level — at 100 TB
    * a query batch physically reads ~nprobe/C of the code files, not
    * all of them.
    */
  def write(path: String): Unit = {
    AnnIndex.writeCodes(codes, path, org.apache.spark.sql.SaveMode.Overwrite)
    model.write.mode("overwrite").parquet(s"$path/model")
  }
}

object AnnIndex {

  private def writeCodes(codes: org.apache.spark.sql.DataFrame, path: String,
      mode: org.apache.spark.sql.SaveMode): Unit = {
    val w = codes.write.mode(mode)
    (if (codes.columns.contains("cid")) w.partitionBy("cid") else w)
      .parquet(s"$path/codes")
  }

  /** Append NEW code rows to an index already on disk — the storage
    * half of the daily-ingest story: existing code files are untouched
    * (parquet append adds files inside the same cell directories, so
    * probed-cell pruning keeps working) and the model is NOT rewritten
    * because an encode-only append never changes it by contract.
    * `newCodes` must come from [[Similarity.encodeForIndex]] against
    * THIS path's index — appending codes encoded under a different
    * model silently corrupts every search, which is why this takes the
    * relation rather than re-deriving it.
    */
  def appendCodes(newCodes: org.apache.spark.sql.DataFrame, path: String): Unit =
    writeCodes(newCodes, path, org.apache.spark.sql.SaveMode.Append)

  /** Tombstone-delete for an index ON DISK — the storage half of
    * takedowns, symmetric with [[appendCodes]]: ids land as an
    * append-only parquet relation under `path/tombstones` and NO code
    * file is touched; [[read]] anti-joins them out, so every search
    * over a re-read index excludes deleted vectors immediately.
    * Batches accumulate (append mode) until [[compact]] folds them
    * into the code files.  A vec_id is a permanent identity: appending
    * a NEW row under a tombstoned id stays invisible until a compact
    * clears the tombstone — re-ingest under a deleted id is a rebuild
    * decision, not an append.
    */
  def deleteFromIndex(path: String, ids: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/tombstones")
  }

  /** Fold accumulated tombstones into the code files, rewriting ONLY
    * the cell directories that contain a deleted vector: survivors of
    * affected cells are materialized to executor-local disk BEFORE the
    * dynamic partition overwrite (the overwrite rewrites the very
    * files the survivor plan reads — persisting first removes any
    * dependence on read-tasks-before-commit ordering inside one job,
    * which committers are free to change across Spark versions), then
    * written; untouched cells keep their files byte-identical —
    * file-set pruning evidence stays valid.  A cell whose every row
    * was deleted has its directory removed explicitly (dynamic
    * overwrite never touches a partition absent from the written
    * frame).  The tombstone relation is deleted last — crash-safe
    * ordering: a crash mid-compact leaves tombstones in place and
    * [[read]] still correct, the rewrite merely redone.  The
    * affected-cell list is bounded driver state (≤ C ≤ 4096 cells by
    * construction); the persisted survivor set is ≤ C cells of codes
    * (16 B/row), equally bounded.  A flat PQ index (no cell dirs)
    * rewrites its one codes relation whole — the honest cost of a
    * partition-less layout — swapped via rename with the old relation
    * kept aside until the new one is in place, so EVERY crash point
    * leaves either `codes` or the `codes_old` fallback that [[read]]
    * picks up, never a window with no readable relation.
    */
  def compact(s: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val t = tombstonesOf(s, path).getOrElse(return)
    val codes =
      try graft.sources.Scan.parquet(s, s"$path/codes")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        // codes absent: EITHER an empty-corpus index OR a flat-PQ
        // compact that crashed between its two renames and left the
        // pre-compact relation as codes_old.  The order matters — the
        // empty-corpus branch deletes the tombstones, which in the
        // crash state would RESURRECT the deleted rows through
        // [[read]]'s codes_old fallback.  Recover the fallback into
        // place first, then compact it normally.
        val recovered =
          try { val c = graft.sources.Scan.parquet(s, s"$path/codes_old"); c.schema; Some(c) }
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        recovered match {
          case Some(_) =>
            renamePath(s, s"$path/codes_old", s"$path/codes")
            graft.sources.Scan.parquet(s, s"$path/codes")
          case None =>
            deletePath(s, s"$path/tombstones"); return // empty-corpus index
        }
      }
    val fresh = s"$path/codes_compact_tmp"
    if (codes.columns.contains("cid")) {
      val affected = codes.join(t, Seq("vec_id"), "left_semi")
        .select(col("cid")).distinct().collect().map(_.getInt(0))
      if (affected.nonEmpty) {
        val survivors = codes
          .filter(col("cid").isin(affected.map(Integer.valueOf): _*))
          .join(t, Seq("vec_id"), "left_anti")
          // one file per rewritten cell dir, like the original
          // cell-partitioned write
          .repartition(col("cid"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        // the surviving-cell collect materializes the persist (it
        // scans every survivor partition), so the overwrite below
        // reads cached blocks, NOT the files it is replacing — and
        // the formerly-separate affected-cell re-scan is gone
        val surviving = survivors.select(col("cid")).distinct()
          .collect().map(_.getInt(0)).toSet
        survivors.write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cid")
          .parquet(s"$path/codes")
        survivors.unpersist()
        // fully-emptied cells: dynamic overwrite wrote no partition for
        // them, so their old files would survive — remove the dirs
        affected.filterNot(surviving).foreach { c =>
          deletePath(s, s"$path/codes/cid=$c")
        }
      }
    } else {
      // flat PQ: no partition boundary to scope the rewrite — write
      // survivors aside, keep the old relation as codes_old until the
      // fresh one is renamed in, then drop it.  Crash between the two
      // renames leaves codes absent but codes_old present → [[read]]
      // falls back (tombstones still on disk keep it correct).
      codes.join(t, Seq("vec_id"), "left_anti")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(fresh)
      deletePath(s, s"$path/codes_old") // stale fallback from a prior crash
      renamePath(s, s"$path/codes", s"$path/codes_old")
      renamePath(s, fresh, s"$path/codes")
      deletePath(s, s"$path/codes_old")
    }
    deletePath(s, s"$path/tombstones")
  }

  private def tombstonesOf(s: SparkSession,
      path: String): Option[org.apache.spark.sql.DataFrame] =
    try Some(graft.sources.Scan.parquet(s, s"$path/tombstones"))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  private def hadoopFs(s: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(s.sparkContext.hadoopConfiguration), hp)
  }

  private def deletePath(s: SparkSession, p: String): Unit = {
    val (fs, hp) = hadoopFs(s, p)
    fs.delete(hp, true); ()
  }

  private def renamePath(s: SparkSession, from: String, to: String): Unit = {
    val (fs, hp) = hadoopFs(s, from)
    fs.rename(hp, new org.apache.hadoop.fs.Path(to)); ()
  }

  def read(s: SparkSession, path: String): AnnIndex = {
    import org.apache.spark.sql.functions.col
    val model = graft.sources.Scan.parquet(s, s"$path/model")
    val codes =
      try graft.sources.Scan.parquet(s, s"$path/codes")
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          // a flat-PQ [[compact]] that crashed between its two renames
          // leaves the pre-compact relation as codes_old (and the
          // tombstones still on disk, so the anti-join below keeps the
          // view correct) — pick it up before concluding empty/corrupt
          try graft.sources.Scan.parquet(s, s"$path/codes_old")
          catch { case _: org.apache.spark.sql.AnalysisException =>
          // an EMPTY-corpus index wrote zero code rows → zero parquet
          // data files → nothing to infer a schema from; reconstruct
          // the empty relation (searchers short-circuit on the empty
          // model before touching codes).  A model WITH trained books
          // means codes were written — a missing/unreadable codes dir
          // there is corruption, and fabricating an empty frame would
          // turn it into silent zero-result searches: rethrow.
          val hasBooks = model.filter(col("kind") === "book").limit(1).count() > 0
          if (hasBooks) throw e
          val isIvf = model
            .filter(col("kind") === "meta" && col("grp") === 1 && col("idx") === 1)
            .limit(1).count() > 0
          val ddl = "vec_id BIGINT" + (if (isIvf) ", cid INT" else "") +
            ", codes ARRAY<INT>"
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(ddl))
          }
      }
    // tombstones ([[deleteFromIndex]]) anti-join out here, so EVERY
    // search over a re-read index excludes deleted vectors — searchers
    // never know tombstones exist.  Broadcast for a small takedown
    // list; the probe-time cid filter still pushes below the join to
    // the scan, so cell-dir pruning survives.
    val live = tombstonesOf(s, path) match {
      case Some(t) => codes.join(t, Seq("vec_id"), "left_anti")
      case None    => codes
    }
    AnnIndex(live, model)
  }
}
