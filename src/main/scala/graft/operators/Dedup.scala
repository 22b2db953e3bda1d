package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SimHash64.simhash64
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Document deduplication at every fidelity level a training-data
  * pipeline uses: exact hash, exact n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding cosine.
  *
  * Scale contract: no operator materializes O(n²) candidates.  Exact
  * dedup is a hash groupBy; Jaccard/MinHash/SimHash pair generation is
  * keyed by shingle / LSH band / simhash band so the shuffle carries
  * only same-bucket candidates; embedding near-dup at 100 TB routes
  * through [[Similarity]]'s LSH buckets (the all-pairs form here is the
  * small-side reference implementation the oracle can check).
  */
object Dedup {

  /** Exact duplicate groups under two keys: full normalized-text md5
    * ("full") and the first-50-chars prefix md5 ("prefix50" — catches
    * tail-edited near-exact copies).  One groupBy per strategy.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    // unpivot the two keys to (strategy, k) rows map-side: ONE keyed
    // aggregation over one exchange replaces two groupBys + a union
    // (same shuffled bytes — 2 skinny rows/doc vs 1 row read twice —
    // but half the stages)
    Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("nt"))
      .select(col("doc_id"), explode(map(
        lit("full"), md5(encode(col("nt"), "UTF-8")),
        lit("prefix50"), md5(encode(substring(col("nt"), 1, 50), "UTF-8")))).as(Seq("strategy", "k")))
      .groupBy(col("strategy"), col("k"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_dups") > 1)
      .select(col("strategy"), col("k"), col("n_dups"), col("keep_id"))
      .orderBy(col("strategy"), col("k"))

  /** Per-source duplication report: for every `source` value, how many
    * documents it contributes, how many DISTINCT normalized texts
    * those collapse to, and the resulting duplicate fraction — the
    * first dashboard a corpus curator reads (which feeds are
    * boilerplate mills, what exact-dedup will delete per source,
    * how to debias the post-dedup mixture).
    *
    * Scale shape: one pruned (source, text) scan → map-side md5 →
    * one (source)-keyed aggregate with map-side partial
    * count_distinct collapse; output is |sources| rows.  Exact
    * count_distinct keys on the 128-bit fingerprint, never the text.
    */
  def dedupReport(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs").cast("double"))
          .as("dup_frac"))
      .orderBy(col("source"))

  /** Cross-source contamination matrix: for every unordered pair of
    * `source` values, how many DISTINCT 5-gram shingles they share,
    * and the shingle-set Jaccard — the corpus-level view of
    * [[decontaminate]]'s per-document question (which feeds copy
    * from each other / from the benchmark feed; what a
    * train-on-A-test-on-B split actually leaks).
    *
    * Scale shape: one (source, shingle) DISTINCT exchange is the
    * inverted index; the self-join keys on the shingle, and per
    * shingle the pair fan-out is bounded by |sources|² — never
    * corpus-sized (sources are a catalog, not a table).  Both join
    * sides read the ONE distinct exchange (merge-hinted, the
    * dedup_ngram_jaccard discipline).  Output ≤ |sources|² rows.
    */
  def contaminationMatrix(s: SparkSession, dir: String, w: Int = 5): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("source"), explode(shingles(col("text"), w)).as("sh"))
      .distinct()
    val sz = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").hint("merge")
      .join(sh.as("b").hint("merge"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sz.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sz.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double")).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The LSH banding operating curve for [[dedupMinhash]]'s
    * 32 bands × 4 rows configuration: candidate probability
    * p(s) = 1 − (1 − s⁴)³² at Jaccard similarity s ∈ {0.05 … 0.95}
    * — the S-curve that justifies the (b, r) choice (p crosses ½ at
    * s ≈ 0.383; the classic threshold (1/b)^(1/r) ≈ 0.42 marks the
    * steep midpoint where p ≈ 1−1/e: pairs near the 0.8 dedup bar
    * are caught with p ≈ 1, while 0.2-similar noise pairs almost
    * never collide).  Published as a driver query so
    * the operating point is part of the verified surface, not a
    * comment.  All powers are EXPLICIT repeated multiplication
    * (s² ·s², then q→q²→q⁴→q⁸→q¹⁶→q³²) — the same IEEE double
    * steps in any engine, so unlike pow() this is oracle-EXACT.
    */
  def lshTuning(s: SparkSession, dir: String): DataFrame = {
    val df = s.range(1, 20).select((col("id") * 5).as("s_pct"))
    val sim = col("s_pct").cast("double") / lit(100.0)
    val s2 = sim * sim
    val s4 = s2 * s2
    val q = lit(1.0) - s4
    val q2 = q * q
    val q4 = q2 * q2
    val q8 = q4 * q4
    val q16 = q8 * q8
    val q32 = q16 * q16
    df.select(col("s_pct"), sim.as("jaccard"), (lit(1.0) - q32).as("p_candidate"))
      .orderBy(col("s_pct"))
  }

  /** Document-frequency cap for the shingle inverted index: a shingle
    * present in more than this many documents ("in the the of…"
    * boilerplate) is dropped from every document's shingle set before
    * the self-join.  Candidate volume per shingle is then ≤ cap², so the
    * total stays Σ_s min(n_s, cap)² ≈ O(n) regardless of corpus-wide
    * boilerplate — without the cap one high-DF shingle alone contributes
    * Θ(n_s²) pairs, the classic 100 TB self-join killer.  Inert at the
    * test SFs (max observed DF is 25 at sf0.1), so small-scale results
    * are unchanged; the cap is an absolute per-key bound by design —
    * pair work per shingle must not grow with corpus size.
    */
  private[operators] val ShingleDfCap = 128

  /** Shingle width (word 3-grams) and the Jaccard dedup bar — shared
    * by the pair builder AND the Materialize signature params below,
    * so a knob change re-keys the artifact automatically.  Builder
    * CODE changes (same knobs, different algorithm/output) must bump
    * the `"ver"` param at each readOrBuild call site — the persistent
    * cross-round cache otherwise serves stale pairs.
    */
  private[operators] val ShingleW = 3
  private[operators] val JaccardThreshold = 0.8

  /** Exact 3-gram Jaccard ≥ 0.8 pairs via a shingle inverted index:
    * explode distinct shingles, self-join on shingle (the shuffle key),
    * count intersections per pair, then J = |∩| / (|A|+|B|−|∩|).
    * Candidate volume is Σ_shingle n_s², not n² — bounded because a
    * planted near-dup pair shares many shingles but unrelated docs
    * share few, and [[ShingleDfCap]] caps any single shingle's
    * contribution.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(s, dir)
      .orderBy(col("d1"), col("d2"))

  /** Cross-feed duplication matrix — WHO copies WHOM: the near-dup
    * pair graph rolled up by the unordered (source, source) endpoint
    * pair.  The off-diagonal rows are the syndication/plagiarism
    * signal a corpus owner acts on (feed B is 80% reposts of feed A ⇒
    * keep one); the diagonal is each feed's internal redundancy.
    * Pure consumer of the materialized pair substrate: one FileScan,
    * two id-keyed joins against the skinny (doc_id, source) relation,
    * then a ≤|sources|² keyed aggregate — no shingle work at query
    * time.
    */
  def sourcePairOverlap(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    nearDupPairs(s, dir)
      .join(src.select(col("doc_id").as("d1"), col("source").as("sa")), Seq("d1"))
      .join(src.select(col("doc_id").as("d2"), col("source").as("sb")), Seq("d2"))
      .groupBy(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** THE suite-level shared intermediate: the exact near-dup pair graph
    * (d1, d2, jaccard), materialized once per corpus snapshot via
    * [[graft.sources.Materialize]] and read by every consumer —
    * dedup_ngram_jaccard, [[nearDupComponentLabels]] (and through it
    * dedup_components, split_assign_grouped, corpus_clean) and
    * graph_triangles.  At 100 TB the shingle self-join is the single
    * most expensive stage in the dedup suite; recomputing it per
    * downstream query (the pre-round-12 shape) multiplies that cost by
    * the consumer count, while this seam pays it once and hands every
    * consumer a FileScan.  The artifact is keyed on the documents
    * table's stats + the pipeline knobs, so an input refresh rebuilds
    * and the oracle contract is untouched: parquet round-trips longs
    * and doubles exactly, so read-back is bit-identical to the inline
    * [[ngramJaccardPairs]] (spec-pinned).
    *
    * (contamination_matrix and link_predict are deliberately NOT
    * consumers: the former aggregates a (source, shingle) index — a
    * different, coarser intermediate — and the latter predicts over the
    * co-purchase graph because near-dup components are near-cliques
    * with an empty transitive-missing set.)
    *
    * Round 13: the substrate is DELTA-MAINTAINED on append — see
    * [[nearDupIndex]]/[[nearDupPairsDelta]]; a daily crawl's append
    * recomputes only pairs with an endpoint in appended∪dirty and
    * rewrites no corpus-sized artifact.  NOT sublinear: the bipartite
    * join's probe side and the size aggregate still take one linear
    * pass over the composed index, so the win over a full rebuild is
    * the avoided self-join + index write, bounded by that linear term
    * (measured ≈0.7× at sf1 steady state).  Round 14 adds the
    * cost-based decline: an oversized cumulative append compacts
    * (full rebuild → new base) instead of paying a delta that would
    * approach full cost anyway.
    */
  private def docInputs(dir: String): Seq[String] = Seq(s"$dir/documents.parquet")

  private def idxParams: Seq[(String, String)] =
    Seq("w" -> ShingleW.toString, "dfCap" -> ShingleDfCap.toString, "ver" -> "1")

  private def dfParams: Seq[(String, String)] =
    Seq("w" -> ShingleW.toString, "ver" -> "1")

  /** Distinct word-3-gram explode of any (doc_id, text) frame — the
    * linear substrate every neardup artifact derives from.
    */
  private def explodedShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), ShingleW))).as("shingle"))

  /** Uncapped corpus-wide shingle document frequencies for an explicit
    * BASE file set — the sidecar that makes the cap delta-decidable:
    * over-cap shingles are absent from the capped index, so without
    * their true DF an append could wrongly re-admit one.  Keyed on the
    * base FILES (not the live directory), so it is built once per base
    * snapshot — the first append pays this one linear scan, every
    * later append gets a cache hit.
    */
  private def nearDupBaseDf(s: SparkSession, baseFiles: Seq[String]): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "neardup_df", baseFiles, dfParams) {
      explodedShingles(graft.sources.Scan.parquet(s, baseFiles: _*).select(col("doc_id"), col("text")))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    }

  /** The capped (doc_id, shingle) inverted index as a materialized
    * artifact — [[cappedShingles]] (the one-exchange pipeline,
    * plan-pinned), built ONCE per base snapshot and deliberately NOT
    * rewritten on append: an appended snapshot's index is composed
    * LAZILY in [[nearDupPairsDelta]] as (base index FileScan ∪ delta
    * explode) semi-join the merged-DF cap — the LSM discipline that
    * keeps append cost free of any corpus-sized artifact rewrite.  A
    * full (re)build — first contact, param bump, non-append change —
    * compacts: the current snapshot becomes the new base.
    */
  private[graft] def nearDupIndex(s: SparkSession, dir: String): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "neardup_index",
      docInputs(dir), idxParams) {
      cappedShingles(Tables.documents(s, dir), ShingleDfCap)
    }

  /** [[nearDupIndex]] keyed to an EXPLICIT file set — signature-equal
    * to the live-dir form whenever the listing matches, which is how
    * the delete builder refreshes the index for the SURVIVING files
    * only: under the mixed (remove∘delta) composition the appended
    * files are already on disk, so the live-dir form would index them
    * into the remove leg's state.
    */
  private def nearDupIndexFiles(s: SparkSession, files: Seq[String]): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "neardup_index", files, idxParams) {
      cappedShingles(graft.sources.Scan.parquet(s, files: _*).select(col("doc_id"), col("text")),
        ShingleDfCap)
    }

  /** Pair generation from the materialized index — the same math as
    * [[ngramJaccardPairs]] (per-pair intersection count over the
    * shingle-keyed self-join, J = c/(n₁+n₂−c)), reading the index
    * FileScan on both sides instead of replaying the shingle pipeline.
    */
  private def pairsFromIndex(idx: DataFrame): DataFrame = {
    val sz = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = idx.as("a").hint("merge").join(idx.as("b").hint("merge"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  private def pairsParams: Seq[(String, String)] =
    Seq("w" -> ShingleW.toString, "dfCap" -> ShingleDfCap.toString,
      "thresh" -> JaccardThreshold.toString, "ver" -> "2")

  private[graft] def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Materialize.readOrBuildMaintainedFused(s, "neardup_pairs",
      docInputs(dir), pairsParams) {
      // a full (re)build compacts — the current snapshot becomes the
      // new base — so pay the base DF sidecar NOW (one linear
      // aggregate over shingles the build explodes anyway): the first
      // append then reads it as a signature-exact cache hit instead of
      // paying a corpus scan inside its own critical path (the r13
      // probe's first-append-at-1.18×-full came exactly from this
      // build being lazy)
      val cur = graft.sources.Materialize.listFiles(s, s"$dir/documents.parquet")
      nearDupBaseDf(s, cur)
      pairsFromIndex(nearDupIndex(s, dir))
    } { (prevPairs, prevFiles, deltaFiles) =>
      nearDupPairsDelta(s, dir, prevPairs, prevFiles, deltaFiles)
    } { (prevPairs, prevStats, removedFiles) =>
      nearDupPairsDelete(s, dir, prevPairs, prevStats, removedFiles)
    } { (prevPairs, prevStats, removedFiles, appendedFiles) =>
      nearDupPairsMixed(s, prevPairs, prevStats, removedFiles, appendedFiles)
    }

  /** Cumulative-append byte fraction past which a delta builder
    * declines and the full rebuild compacts to a new base.  The delta
    * path's cost is the B-endpoint pair recompute (∝ appended∪dirty)
    * plus a linear composed-index pass; as the cumulative append
    * approaches a third of the base, the measured win over a full
    * rebuild vanishes (sf1 probe: steady-state delta ≈0.7× full at
    * 1–3% appends, shrinking with the appended fraction) — past it
    * compaction is also what keeps LATER appends cheap, since delta
    * cost grows with the cumulative delta against the same base.
    * Overridable for spec engineering via
    * `spark.graft.delta.maxAppendFraction`.
    */
  private[graft] val MaxAppendFraction = 0.34

  private[graft] def maxAppendFraction(s: SparkSession): Double =
    s.conf.get("spark.graft.delta.maxAppendFraction", MaxAppendFraction.toString).toDouble

  /** Incremental pair maintenance on append, aligned at the BASE
    * snapshot (the one whose index artifact exists).  Invariant: a
    * pair's (c, n₁, n₂) only changes if an endpoint's capped shingle
    * SET changed — for appended docs, or "dirty" base docs containing
    * a shingle the appends pushed over the DF cap.  So: keep base
    * pairs whose BOTH endpoints are clean (their jaccard doubles are
    * bit-identical by construction), and recompute exactly the pairs
    * with ≥ 1 endpoint in B = dirty ∪ appended, via a bipartite join
    * of B's index rows against the LAZILY-composed current index
    * (base FileScan ∪ appended explode, merged-DF cap) — candidate
    * volume scales with B's shingle mass and NOTHING corpus-sized is
    * rewritten.  Appends accumulate against the same base (cost grows
    * with the cumulative delta); a full rebuild compacts.  Declines
    * (→ full build) when the base index or base pairs artifact is
    * missing.
    */
  private def nearDupPairsDelta(s: SparkSession, dir: String, prevPairs: DataFrame,
      prevFiles: Seq[String], deltaFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val prior = M.readPrior(s, "neardup_index", docInputs(dir), idxParams)
    if (prior.isEmpty) return null
    val (baseIdx, baseFiles) = prior.get
    // when the index base IS the prev snapshot, the passed prev frame
    // is the base pairs — and under the mixed (remove∘delta)
    // composition it is an UNPUBLISHED intermediate, so the keyed
    // lookup would miss; the lookup remains for the cumulative-append
    // case where the base predates prev
    val basePairs =
      if (baseFiles.toSet == prevFiles.toSet) prevPairs
      else M.readIfFresh(s, "neardup_pairs", baseFiles, pairsParams)
        .getOrElse(return null)
    // everything appended since the base — possibly several batches
    val appended = ((prevFiles ++ deltaFiles).toSet -- baseFiles).toSeq.sorted
    require(appended.nonEmpty, "delta invoked with no appended files")
    // cost-based decline: past the crossover fraction the delta's
    // B-endpoint recompute + linear composed-index pass approaches
    // full-rebuild cost — compact instead (and reset the cumulative
    // delta so later appends stay cheap)
    if (M.totalBytes(s, appended) >
        maxAppendFraction(s) * M.totalBytes(s, baseFiles)) return null
    val appendedDocs = graft.sources.Scan.parquet(s, appended: _*).select(col("doc_id"), col("text"))
    val shD = explodedShingles(appendedDocs)
    // merged DF decides the cap for the composed snapshot: base DF
    // sidecar (built once per base) + appended counts
    val totalDf = nearDupBaseDf(s, baseFiles)
      .unionByName(shD.groupBy(col("shingle")).agg(count(lit(1)).as("df")))
      .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
    val keep = totalDf.filter(col("df") <= ShingleDfCap).select(col("shingle"))
    // the current snapshot's index, composed lazily — never written
    val newIdx = baseIdx.unionByName(shD)
      .join(keep, Seq("shingle"), "left_semi")
      .repartition(col("shingle"))
    // shingles that LEFT the index (crossed the cap through the appends)
    val affected = baseIdx.select(col("shingle")).distinct()
      .join(keep, Seq("shingle"), "left_anti")
    val dirty = baseIdx.join(affected, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val bIds = dirty.unionByName(appendedDocs.select(col("doc_id"))).distinct()
    val fresh = pairsWithBEndpoint(newIdx, bIds)
    val clean = basePairs
      .join(bIds.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
      .join(bIds.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
    clean.select(col("d1"), col("d2"), col("jaccard")).unionByName(fresh)
  }

  /** Every qualifying pair with ≥ 1 endpoint in `bIds`, computed over
    * the composed index `idx` — the recompute kernel both maintenance
    * paths (append delta, takedown delete) share: candidate volume
    * scales with B's shingle mass, never the corpus's.
    */
  private def pairsWithBEndpoint(idx: DataFrame, bIds: DataFrame): DataFrame = {
    val bIdx = idx.join(bIds, Seq("doc_id"), "left_semi")
    val flagged = idx.join(bIds.withColumn("inB", lit(true)), Seq("doc_id"), "left")
      .withColumn("inB", coalesce(col("inB"), lit(false)))
    // each unordered pair with >= 1 B endpoint matches exactly once per
    // shared shingle: B-vs-clean in either order via the inB guard,
    // B-vs-B only under a < b
    val inter = bIdx.as("a").join(flagged.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (!col("b.inB") || col("a.doc_id") < col("b.doc_id")))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .agg(count(lit(1)).as("c"))
    val sz = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    inter
      .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Takedown maintenance for the pair substrate.  Under DELETE the
    * document texts never change — only presence and the DF landscape
    * do, and DF can only DECREASE, so the only cap transition is
    * over→under: a boilerplate shingle whose removed occurrences drop
    * it back under [[ShingleDfCap]] is RE-ADMITTED to the index for
    * every surviving doc containing it.  So: pairs lose rows whose
    * endpoint was removed (a join against the surviving ids — the
    * "only witness removed" case needs no recompute, pair metrics are
    * pairwise), pairs of two CLEAN docs carry bit-identically (their
    * capped shingle sets are untouched: no flipped shingle, same
    * texts), and only docs CONTAINING a flipped shingle are dirty —
    * their pairs recompute over the surviving corpus' index via the
    * shared [[pairsWithBEndpoint]] kernel (new pairs can APPEAR here:
    * a re-admitted shingle can push two survivors over the Jaccard
    * threshold — spec-pinned).  Flip detection compares the PREV
    * corpus DF (the base [[nearDupBaseDf]] sidecar, located
    * manifest-vs-manifest since removed files cannot be stat'ed, plus
    * the appended-since-base survivors' counts) against the surviving
    * corpus DF.  The delete pays the full build's two LINEAR passes —
    * the DF and capped-index sidecars, refreshed for the surviving
    * snapshot so every consumer below reads a FileScan and the NEXT
    * maintenance step finds its aligned base as a cache hit — plus
    * the dirty recompute; saved vs full is the corpus-wide pair
    * self-join that dominates a rebuild.
    *
    * Declines (→ full rebuild, which compacts): the base DF sidecar
    * is missing; a removed file post-dates the base (its shingle
    * counts are unrecoverable, so the PREV DF cannot be reconstructed
    * — appends should compact before takedowns apply); or removed
    * bytes exceed [[MaxAppendFraction]] of the prev corpus.
    */
  private def nearDupPairsDelete(s: SparkSession, dir: String, prevPairs: DataFrame,
      prevStats: Map[String, String], removedFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val removedBytes = removedFiles.map(f => M.statLen(prevStats(f))).sum
    if (removedBytes > maxAppendFraction(s) * prevStats.values.map(M.statLen).sum)
      return null
    val prior = M.readWithin(s, "neardup_df", prevStats, dfParams)
    if (prior.isEmpty) return null
    val (baseDf, baseFiles) = prior.get
    if (!removedFiles.forall(baseFiles.contains)) return null
    // PREV-corpus DF: base sidecar + appended-since-base counts (all
    // appended files survive — guarded above)
    val appended = (prevStats.keySet -- baseFiles).toSeq.sorted
    val prevDf =
      if (appended.isEmpty) baseDf
      else baseDf.unionByName(
          explodedShingles(graft.sources.Scan.parquet(s, appended: _*)
            .select(col("doc_id"), col("text")))
          .groupBy(col("shingle")).agg(count(lit(1)).as("df")))
        .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
    // refresh BOTH sidecars for the surviving snapshot (the
    // eager-sidecar discipline): the full build's two linear passes,
    // paid here so (a) every consumer below reads a FileScan instead
    // of replaying a corpus explode, and (b) the NEXT maintenance
    // step — append delta or another takedown — finds its aligned
    // base as a cache hit instead of declining to a full rebuild.
    // Survivors derive from prevStats − removed, NEVER the live
    // listing: identical under the pure-delete shape, but under the
    // mixed (remove∘delta) composition the appended files are already
    // on disk and must not leak into this leg's state
    val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
    val newDf = nearDupBaseDf(s, survivors)
    val curIdx = nearDupIndexFiles(s, survivors)
    // cap flips under delete are over→under only (DF can only drop):
    // the re-admitted shingle's postings are IN the refreshed index
    val flipped = prevDf.filter(col("df") > ShingleDfCap).select(col("shingle"))
      .join(newDf.filter(col("df") <= ShingleDfCap).select(col("shingle")),
        Seq("shingle"), "left_semi")
    val dirty = curIdx.join(flipped, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val fresh = pairsWithBEndpoint(curIdx, dirty)
    val curIds = graft.sources.Scan.parquet(s, survivors: _*).select(col("doc_id"))
    val carried = prevPairs
      .join(curIds.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
      .join(curIds.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
      .join(dirty.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
      .join(dirty.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
    carried.select(col("d1"), col("d2"), col("jaccard")).unionByName(fresh)
  }

  /** FUSED single-pass MIXED maintenance (round 17) — the same-epoch
    * crawl+takedown handled in one builder instead of the generic
    * remove∘delta composition, which pays both legs' linear floors
    * (an intermediate pair-relation checkpoint, two carry scans, two
    * dirty recomputes) and measured AT PAR with a full rebuild for
    * this substrate at sf10.  Texts never change under either
    * mutation, so a surviving doc's capped-shingle set changes iff it
    * holds a shingle whose capped-status changed between the PREV and
    * FINAL corpus — ONE dirty definition covering both legs:
    *
    *  - flip detection compares prevDf (base sidecar + retained
    *    appends' counts, the delete leg's reconstruction) against
    *    finalDf (refreshed survivor sidecar + appended batch counts,
    *    the delta leg's composition), in BOTH directions at once —
    *    removals re-admit (df drops under the cap), appends cap out
    *    (df crosses over);
    *  - both directions' postings live in the refreshed SURVIVOR
    *    index: over-crossed ⇒ prev ≤ cap ∧ surv ≤ prev; re-admitted ⇒
    *    final ≤ cap ∧ surv ≤ final (df is monotone in the file set),
    *    so no posting outside it is ever needed;
    *  - dirty = survivor holders of any flipped shingle ∪ the
    *    appended docs; ONE [[pairsWithBEndpoint]] recompute over the
    *    lazily-composed final index, ONE carry scan of the prev pairs
    *    (removed endpoints drop, dirty endpoints excluded), no
    *    checkpointed intermediate.
    *
    * Sidecars refresh for the SURVIVORS exactly as the delete leg
    * would (eager-sidecar discipline — the next maintenance step's
    * aligned base); the appended batch composes lazily on top (the
    * delta shape), so the final index is value-identical to the full
    * build's by the same argument as the append delta's, with
    * base = survivors.  Declines (→ the composition, which then
    * declines to full on the same conditions): base DF sidecar
    * missing, a removed file outside the base, removed bytes or
    * appended bytes past [[MaxAppendFraction]].
    */
  private def nearDupPairsMixed(s: SparkSession, prevPairs: DataFrame,
      prevStats: Map[String, String], removedFiles: Seq[String],
      appendedFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val removedBytes = removedFiles.map(f => M.statLen(prevStats(f))).sum
    if (removedBytes > maxAppendFraction(s) * prevStats.values.map(M.statLen).sum)
      return null
    val prior = M.readWithin(s, "neardup_df", prevStats, dfParams)
    if (prior.isEmpty) return null
    val (baseDf, baseFiles) = prior.get
    if (!removedFiles.forall(baseFiles.contains)) return null
    val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
    if (M.totalBytes(s, appendedFiles) >
        maxAppendFraction(s) * M.totalBytes(s, survivors)) return null
    // PREV-corpus DF: base sidecar + appends retained since the base
    // (all survive — removed ⊆ base was just checked)
    val earlier = (prevStats.keySet -- baseFiles).toSeq.sorted
    val prevDf =
      if (earlier.isEmpty) baseDf
      else baseDf.unionByName(
          explodedShingles(graft.sources.Scan.parquet(s, earlier: _*)
            .select(col("doc_id"), col("text")))
          .groupBy(col("shingle")).agg(count(lit(1)).as("df")))
        .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
    // survivor sidecar refresh + lazy final composition
    val survDf = nearDupBaseDf(s, survivors)
    val survIdx = nearDupIndexFiles(s, survivors)
    val appendedDocs = graft.sources.Scan.parquet(s, appendedFiles: _*)
      .select(col("doc_id"), col("text"))
    val shD = explodedShingles(appendedDocs)
    val finalDf = survDf
      .unionByName(shD.groupBy(col("shingle")).agg(count(lit(1)).as("df")))
      .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
      .localCheckpoint(eager = false)
    val finalCapped = finalDf.filter(col("df") <= ShingleDfCap).select(col("shingle"))
    val finalIdx = survIdx.unionByName(shD)
      .join(finalCapped, Seq("shingle"), "left_semi")
      .repartition(col("shingle"))
    // both flip directions in one symmetric difference
    val prevCapped = prevDf.filter(col("df") <= ShingleDfCap).select(col("shingle"))
    val flipped = prevCapped.join(finalCapped, Seq("shingle"), "left_anti")
      .unionByName(finalCapped.join(prevCapped, Seq("shingle"), "left_anti"))
    val dirty = survIdx.join(flipped, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val bIds = dirty.unionByName(appendedDocs.select(col("doc_id"))).distinct()
    val fresh = pairsWithBEndpoint(finalIdx, bIds)
    val curIds = graft.sources.Scan.parquet(s, survivors: _*).select(col("doc_id"))
    val carried = prevPairs
      .join(curIds.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
      .join(curIds.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
      .join(bIds.select(col("doc_id").as("d1")), Seq("d1"), "left_anti")
      .join(bIds.select(col("doc_id").as("d2")), Seq("d2"), "left_anti")
    carried.select(col("d1"), col("d2"), col("jaccard")).unionByName(fresh)
  }

  /** Pair generation over any (doc_id, text) frame — parameterized so
    * the spec can plant a corpus-wide shingle and assert the cap bounds
    * candidate work.
    *
    * PPJoin prefix filtering was implemented, MEASURED, and REJECTED
    * (round 10, the knn_join-prune adjudication discipline): a
    * rare-first-prefix index (Bayardo WWW'07 / Xiao WWW'08 — index
    * n−⌈t·n⌉+1 shingles per doc, size-filter candidates, verify by
    * array_intersect) produced bit-identical pairs but ran 1.4→3.5 s
    * at sf0.1, 8.0→13.8 s on the 10× sf1 corpus, and 4.97→5.74 s even
    * on an ENGINEERED boilerplate-heavy corpus (200 template groups ×
    * 100 docs, shingle DF ≈ 100 just under the cap — prefix
    * filtering's best case).  Reason: [[ShingleDfCap]] already bounds
    * per-shingle candidate volume at cap² (the coarse form of the
    * same pruning), so the prefix filter only discounts work the cap
    * has already bounded, while its verification pass ships per-doc
    * shingle ARRAYS through two extra doc-keyed joins — more bytes
    * than the candidate rows it saves at every measured DF profile.
    */
  /** The capped shingle inverted index (doc_id, shingle) — the relation
    * BOTH sides of the pair self-join read.  Exposed as a seam so the
    * skew spec can pin the per-key bound on the REAL pipeline: after
    * the cap semi-join, no shingle key carries more than `dfCap` rows,
    * which is what bounds the self-join's per-key (and so per-task)
    * candidate work at cap² regardless of corpus-wide boilerplate.
    */
  private[graft] def cappedShingles(docs: DataFrame, dfCap: Int): DataFrame = {
    // repartition on the join key: both sides of the self-join then
    // read from one ReusedExchange instead of recomputing the
    // tokenize→shingle→explode pipeline twice
    val exploded = docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), ShingleW))).as("shingle"))
      .repartition(col("shingle"))
    // DF cap as a keyed aggregate semi-joined back (the
    // [[dedupIncremental]] shape): both the aggregate and the join
    // read the one shingle-partitioned exchange, so no new shuffle —
    // and a corpus-wide boilerplate shingle collapses to one (shingle,
    // count) row map-side, then streams through the semi join and
    // drops.  The window-count form this replaced had to BUFFER every
    // occurrence of a hot shingle in a single task before the cap
    // could drop the first row — the cap filter itself was the skew
    // bottleneck it exists to prevent.
    val keep = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("shingle"))
    exploded.hint("merge").join(keep.hint("merge"), Seq("shingle"), "left_semi")
  }

  private[graft] def ngramJaccardPairs(docs: DataFrame, dfCap: Int): DataFrame = {
    val sh = cappedShingles(docs, dfCap)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // merge hint: below the broadcast threshold Spark would flip this
    // self-join to a BroadcastHashJoin, recomputing the whole shingle
    // pipeline for the built side; forcing the sort-merge form makes
    // both sides read the ONE shingle exchange (ReusedExchange) at any
    // size — the same plan the join takes at scale anyway
    val inter = sh.as("a").hint("merge").join(sh.as("b").hint("merge"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Dedup cluster resolution: connected components over the exact
    * near-dup pair graph, emitting (doc_id, rep, n_members) with
    * rep = the component's minimum doc_id — the "keep one per
    * cluster" step every dedup pipeline runs after pair generation.
    *
    * Components come from the large-star/small-star contraction
    * ([[connectedComponents]]): O(log n) rounds independent of
    * component diameter, every round a fully-distributed
    * aggregate+join over the edge list with the partition count
    * derived from the edge volume ([[ccPartitions]]) — no
    * single-partition stage and no diameter-bound round cap anywhere.
    */
  def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val labels = nearDupComponentLabels(s, dir)
    val sizes = labels.groupBy(col("comp").as("srep")).agg(count(lit(1)).as("n_members"))
    labels.select(col("id").as("doc_id"), col("comp").as("rep"))
      .join(sizes, col("rep") === col("srep"))
      .select(col("doc_id"), col("rep"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** Cluster-representative selection by QUALITY, not by id: for each
    * near-dup component keep the member with the most content
    * (`n_chars` DESC, doc_id ASC tie-break) — the policy real curation
    * pipelines run, where near-dup clusters hold truncated/boilerplate
    * variants of one document and the canonical-min-id choice of
    * [[corpusClean]] would happily keep the stub.  One row per
    * component: the kept doc, its size, the cluster size, and the
    * characters the dedup saves (`chars_dropped`) — the number a
    * storage-budget owner actually asks for.
    *
    * Scale shape: rides the MATERIALIZED (and delta-maintained)
    * component-label substrate — no pair generation here, just one
    * hash join of the label map against the (doc_id, n_chars)
    * projection (column-pruned at the scan) and one window partitioned
    * by component.  Near-dup components are bounded by the shingle DF
    * cap's pair fan-out, so no window partition is corpus-sized; the
    * output is one row per CLUSTER, strictly smaller than the label
    * map itself.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val labels = nearDupComponentLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    labels.join(docs, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("comp"))
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("doc_id"))).as("kept_doc"),
        max(when(col("rn") === 1, col("n_chars"))).as("kept_chars"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("comp"), col("n_members"), col("kept_doc"), col("kept_chars"),
        col("total_chars"),
        (col("total_chars") - col("kept_chars")).as("chars_dropped"))
      .orderBy(col("comp"))
  }

  /** Component labels (id, comp) over [[nearDupPairs]], materialized as
    * the suite's SECOND shared intermediate: dedup_components,
    * split_assign_grouped and corpus_clean all need the doc → cluster-rep
    * map, and at 100 TB the O(log n)-round contraction is itself worth
    * paying once per corpus snapshot, not once per consumer.  Keyed on
    * the same inputs as the pair artifact (plus the solver version), so
    * both artifacts refresh together.  Both solver paths read the
    * materialized pair parquet — the count that picks the solver and
    * sizes the fixpoint partitioning is a cheap metadata-backed scan,
    * not a pipeline replay.
    */
  private def compsParams: Seq[(String, String)] =
    Seq("w" -> ShingleW.toString, "dfCap" -> ShingleDfCap.toString,
      "thresh" -> JaccardThreshold.toString, "cc" -> "ls-ss-v1", "ver" -> "1")

  private[graft] def nearDupComponentLabels(s: SparkSession, dir: String): DataFrame =
    graft.sources.Materialize.readOrBuildDelta(s, "neardup_comps",
      inputs = docInputs(dir), params = compsParams) {
      val pairs = nearDupPairs(s, dir).select(col("d1"), col("d2"))
      val nPairs = pairs.count()
      if (nPairs <= LocalCcMaxEdges) localComponents(s, pairs)
      else connectedComponents(pairs, ccPartitions(nPairs))
    } { (prevLabels, prevFiles, _) =>
      nearDupCompsDelta(s, dir, prevLabels, prevFiles)
    }

  /** Incremental component maintenance on append.  Under append the
    * pair-edge set normally only GROWS, and new edges can only MERGE
    * components — so the prior star-forest labels plus a
    * component-level union-find over the ADDED pairs reproduce the
    * full contraction exactly: each added pair links comp(a)–comp(b)
    * (a node's comp = its prior label, or itself if previously
    * unlabeled), the union-find roots every merged group at its
    * minimum comp id — which IS the merged component's minimum member
    * id, because prior labels are their components' minima and fresh
    * nodes are their own — and only labels inside merged components
    * change; everything else carries over bit-identically.
    *
    * Cost-based take: the delta runs ONLY in the distributed regime
    * (current pairs > [[LocalCcMaxEdges]], where the full alternative
    * is the O(log n)-round star contraction over the whole edge list;
    * the delta is one bounded diff-collect plus a broadcast relabel).
    * Below the budget the full path is a single driver union-find
    * collect — measured strictly cheaper than ANY multi-job delta —
    * so the builder declines and compacts (sf1 probe: delta 2.1 s vs
    * 0.65 s full at ~30k pairs).  The regime bound is overridable via
    * `spark.graft.delta.comps.minPairs` (spec hook).
    *
    * Declines additionally when: any pair DIED (a DF-cap crossing
    * shrinks a dirty doc's shingle set, and a died edge may SPLIT a
    * component — splits are not expressible as label merges), or the
    * added-pair count exceeds the driver budget.  The whole diff is
    * ONE bounded collect: pairs present on exactly one side, with
    * their endpoints' prior labels joined on, limit budget+1.
    */
  private def nearDupCompsDelta(s: SparkSession, dir: String,
      prevLabels: DataFrame, prevFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val prevPairs = M.readIfFresh(s, "neardup_pairs", prevFiles, pairsParams)
      .getOrElse(return null)
      .select(col("d1"), col("d2"))
    // the CURRENT pair artifact — itself delta-maintained; building it
    // here keeps its cost attributed to the pair substrate, and comps
    // read the published parquet
    val curPairs = nearDupPairs(s, dir).select(col("d1"), col("d2"))
    val minPairs = s.conf.get("spark.graft.delta.comps.minPairs",
      LocalCcMaxEdges.toString).toLong
    if (curPairs.count() <= minPairs) return null
    val budget = LocalCcMaxEdges.toInt
    val diff = curPairs.withColumn("w", lit(1L))
      .unionByName(prevPairs.withColumn("w", lit(2L)))
      .groupBy(col("d1"), col("d2")).agg(sum(col("w")).as("w"))
      .filter(col("w") =!= 3L)
      .join(prevLabels.select(col("id").as("d1"), col("comp").as("c1")), Seq("d1"), "left")
      .join(prevLabels.select(col("id").as("d2"), col("comp").as("c2")), Seq("d2"), "left")
      .select(col("d1"), col("d2"), col("w"),
        coalesce(col("c1"), col("d1")).as("a"), coalesce(col("c2"), col("d2")).as("b"))
      .limit(budget + 1)
      .collect()
    if (diff.length > budget) return null          // added set past the driver budget
    if (diff.exists(_.getLong(2) == 2L)) return null // a died edge can SPLIT a component
    if (diff.isEmpty) return prevLabels
    val compEdges = diff.map(r => (r.getLong(3), r.getLong(4)))
    import s.implicits._
    val remap = broadcast(unionFindLabels(compEdges).toDF("mkey", "mroot"))
    // prior labels: comps that merged remap to the new root, the rest
    // carry over untouched; endpoints never labeled before (appended
    // docs, or base docs pairing for the first time) join their root
    // directly — their comp-node in the union-find is their own id
    val relabeled = prevLabels
      .join(remap.withColumnRenamed("mkey", "comp"), Seq("comp"), "left")
      .select(col("id"), coalesce(col("mroot"), col("comp")).as("comp"))
    val addedIds = diff.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.toSeq
    val freshIds = addedIds.toDF("id")
      .join(prevLabels.select(col("id")), Seq("id"), "left_anti")
      .join(remap, col("id") === col("mkey"))
      .select(col("id"), col("mroot").as("comp"))
    relabeled.unionByName(freshIds)
  }

  /** Pair graphs at or below this edge count solve on the driver
    * (≈8 MB collected — the same bounded-driver-state budget as IVF's
    * training sample): a union-find over a small edge list is one
    * collect instead of ~2 Spark jobs per contraction round, and the
    * pair graph is usually tiny relative to the corpus.  Above the
    * bound the distributed star contraction takes over — the driver
    * never holds an unbounded structure.
    */
  private[graft] val LocalCcMaxEdges: Long = 1L << 19

  /** Driver-local union-find (path compression + union-by-min-root, so
    * each root is its component's minimum id) for pair graphs under
    * [[LocalCcMaxEdges]].  Same (id, comp) output contract as
    * [[connectedComponents]]; agreement between the two solvers is
    * spec-pinned.
    */
  private[graft] def localComponents(s: SparkSession, pairs: DataFrame): DataFrame = {
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    import s.implicits._
    unionFindLabels(edges).sortBy(_._1).toDF("id", "comp")
  }

  /** Driver union-find core shared by [[localComponents]] and the
    * comps delta: (node, root) for every node in `edges`, root = the
    * component's minimum node id.  Self-pairs are dropped exactly as
    * the distributed contraction drops them (u =!= v), so the solvers
    * agree on any input.
    */
  private def unionFindLabels(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val nx: Long = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
    }
    val out = new Array[(Long, Long)](parent.size())
    var i = 0
    parent.keySet().forEach { k => out(i) = (k.longValue(), find(k)); i += 1 }
    out.toSeq
  }

  /** Fixpoint partition count derived from edge volume: ~250k edges
    * (a few MB) per task, clamped to a sane ceiling.  At the test SFs
    * this is 1 partition (47 pairs); at a billion-edge 100 TB pair
    * graph it is thousands of tasks — the sizing the old hard-coded
    * `repartition(1)` could not express.
    */
  private[graft] def ccPartitions(nPairs: Long): Int =
    // clamp in Long BEFORE narrowing: a .toInt on the raw quotient
    // wraps negative past ~5.4e14 edges and would silently collapse
    // the sizing back to one partition at exactly the scale it exists for
    math.max(1L, math.min(20000L, nPairs / 250000L + 1L)).toInt

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14).  Input: a pair frame (d1, d2); output:
    * (id, comp) with comp = the component's minimum node id, one row
    * per distinct node.
    *
    * Edges are kept in canonical child>parent form.  Per round:
    *
    *  - large-star: for every node u, link each strictly-larger
    *    neighbor to m = min(Γ(u) ∪ {u});
    *  - small-star: group the resulting child→parent edges by child
    *    and link the child and all its parents to the minimum parent.
    *
    * Both steps are a keyed min-aggregate plus a same-key join — no
    * driver-side data, no single-partition stage, and map-side partial
    * mins neutralize degree skew.  Components contract to stars rooted
    * at their minimum in O(log n) rounds REGARDLESS of diameter (min
    * labels hop one edge per round in plain propagation, so a
    * chain-shaped cluster of diameter d would need d rounds there; the
    * star steps shortcut paths multiplicatively instead).  The round
    * cap scales with log²(edges) and is a runaway guard, not a
    * diameter bound; convergence is verified (edge set unchanged), and
    * the star shape is re-checked before labels are emitted.
    */
  private[graft] def connectedComponents(pairs: DataFrame, partitions: Int): DataFrame = {
    var edges = pairs
      .select(greatest(col("d1"), col("d2")).as("u"), least(col("d1"), col("d2")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .repartition(partitions, col("u"))
      .persist()
    val n = edges.count()
    // ceil(log2) of the edge count; LS/SS is proven to converge in
    // O(log² n) alternating rounds (observed ~log n), so 2·lg² + 16 can
    // only trip on an implementation bug, never on graph shape
    val lg = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 2L) - 1)
    val maxRounds = 16 + 2 * lg * lg
    var converged = n == 0
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // large-star over the symmetrized view of the cached edges
      val sym = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // emitted rows are (child, parent) with child > parent by
      // construction (m ≤ u < v); eagerly checkpointed because
      // small-star reads it twice (min-aggregate + join probe) in ONE
      // job — a lazy persist would let the two racing stages each
      // recompute the large-star subtree before cache blocks land
      val ls = sym.join(lmins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .repartition(partitions, col("u"))
        .localCheckpoint(eager = true)
      // small-star: per child u, every parent and u itself link to the
      // minimum parent (strictly smaller than u, so min(v) suffices)
      val smins = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      // localCheckpoint — NOT persist — because each round's plan
      // references the previous round's ~8× (sym twice inside ls,
      // twice inside next): with lineage intact the logical plan grows
      // 8^rounds and analysis itself dies around round 7.  The eager
      // checkpoint truncates every round to a materialized leaf
      // (constant plan size); superseded round RDDs are released by the
      // context cleaner once unreferenced.  On a cluster a lost
      // executor replays nothing (no lineage) — acceptable for an
      // O(log n)-round loop whose per-round output is the shrinking
      // edge list.
      val next = ls.join(smins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(smins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()
        .repartition(partitions, col("u"))
        .localCheckpoint(eager = true)
      // exact set-equality fixpoint check in ONE action: both sides
      // are distinct canonical sets, so an edge appears twice in the
      // union iff it is in both — any group with count ≠ 2 is a
      // difference (count + except would be two jobs per round, and
      // the per-round action overhead dominates on small pair graphs)
      val changed = next.unionAll(edges)
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2)
        .count()
      edges.unpersist(blocking = false)
      edges = next
      converged = changed == 0
      rounds += 1
    }
    require(converged, s"star contraction did not converge in $rounds rounds")
    // verify the star invariant the label emit relies on: every child
    // has exactly one parent and no node is both child and parent —
    // with edges canonical child>parent, stars are then rooted at the
    // component minimum
    val multiParent = edges.groupBy(col("u")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    val childAndParent = edges.select(col("u")).intersect(edges.select(col("v")).distinct()).count()
    require(multiParent == 0 && childAndParent == 0,
      s"contraction fixpoint is not a star forest (multiParent=$multiParent, childAndParent=$childAndParent)")
    val labels = edges.select(col("u").as("id"), col("v").as("comp"))
      .unionAll(edges.select(col("v")).distinct().select(col("v").as("id"), col("v").as("comp")))
      // localCheckpoint materializes the (small) label set and truncates
      // the round-by-round lineage, so the final edge cache can be
      // released immediately and an eviction can never replay the
      // contraction
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    labels
  }

  /** Train/test decontamination: for every "test" document, count the
    * "train" documents sharing ≥1 five-gram and the total shared
    * shingle occurrences — the overlap audit an LLM pipeline runs
    * before training (here the split is doc_id parity as a
    * deterministic stand-in for real split labels).
    *
    * Same scale shape as [[dedupNgramJaccard]]: one shingle-keyed
    * exchange feeds both sides of a bipartite inverted-index join
    * (never test×train all-pairs), with the [[ShingleDfCap]] dropping
    * boilerplate shingles that would explode the join and flag
    * everything as contaminated.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(shingles(col("text"), 5))).as("shingle"))
      .repartition(col("shingle"))
    // DF cap as a keyed aggregate semi-joined back (the
    // [[ngramJaccardPairs]] shape): a boilerplate shingle collapses to
    // one (shingle, count) row map-side instead of buffering every
    // occurrence in one window task; aggregate and semi join both read
    // the one shingle-partitioned exchange
    val keep = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select(col("shingle"))
    val capped = sh.hint("merge").join(keep.hint("merge"), Seq("shingle"), "left_semi")
    val train = capped.filter(col("doc_id") % 2 === 1)
      .select(col("shingle"), col("doc_id").as("train_id"))
    val test = capped.filter(col("doc_id") % 2 === 0)
      .select(col("shingle"), col("doc_id").as("test_id"))
    test.hint("merge").join(train.hint("merge"), "shingle")
      .groupBy(col("test_id"))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        count(lit(1)).as("n_shared_shingles"))
      .orderBy(col("test_id"))
  }

  /** 5-gram sidecar params for the DECON substrate — the
    * [[graft.operators.Pipeline.curationFlags]] delta's alignment
    * keys (round 16): the decon verdict is the one flag stage whose
    * evidence is corpus-wide (shared capped 5-grams across the
    * parity split), so maintaining the flag leaf incrementally needs
    * the same DF + capped-index sidecar pair the near-dup pair delta
    * rides — at w = 5 instead of [[ShingleW]].
    */
  private[operators] def deconDfParams: Seq[(String, String)] =
    Seq("w" -> "5", "ver" -> "1")

  private[operators] def deconIdxParams: Seq[(String, String)] =
    Seq("w" -> "5", "dfCap" -> ShingleDfCap.toString, "ver" -> "1")

  /** Distinct word-5-gram explode — [[decontaminate]]'s substrate. */
  private[operators] def exploded5(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), 5))).as("shingle"))

  /** Uncapped corpus-wide 5-gram document frequencies for an explicit
    * BASE file set — built once per base snapshot (the
    * [[nearDupBaseDf]] discipline), so the flag delta can decide cap
    * crossings without a corpus re-scan.
    */
  private[operators] def deconBaseDf(s: SparkSession, baseFiles: Seq[String]): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "decon_df", baseFiles, deconDfParams) {
      exploded5(graft.sources.Scan.parquet(s, baseFiles: _*).select(col("doc_id"), col("text")))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    }

  /** The capped 5-gram (doc_id, shingle) inverted index for an
    * explicit file set — [[decontaminate]]'s exact shingle/cap
    * pipeline (same explode, same [[ShingleDfCap]] over BOTH
    * parities), materialized so the flag leaf's decon stage and its
    * delta read a FileScan instead of replaying the corpus explode.
    */
  private[operators] def deconIndexFiles(s: SparkSession, files: Seq[String]): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "decon_index", files, deconIdxParams) {
      val sh = exploded5(graft.sources.Scan.parquet(s, files: _*).select(col("doc_id"), col("text")))
        .repartition(col("shingle"))
      val keep = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= ShingleDfCap)
        .select(col("shingle"))
      sh.hint("merge").join(keep.hint("merge"), Seq("shingle"), "left_semi")
    }

  /** [[decontaminate]]'s 100 TB form: the benchmark/test side is SMALL
    * by contract (benchmarks are megabytes; the training corpus is the
    * 100 TB side), so instead of shuffling every training shingle into
    * a bipartite join, the test side's shingles compress into a Bloom
    * filter that probes the training corpus MAP-SIDE — zero shuffle on
    * the big side, no corpus-sized exchange anywhere.
    *
    * Build: per-partition filters merged in a tree
    * (`treeAggregate` — the one imperative-RDD idiom here, because a
    * sketch merge is genuinely per-partition state), sized by the test
    * side's shingle count at fpp 0.001; [[graft.functions.BloomCountHits]]
    * probes UTF-8 bytes against the same `putBinary` encoding.
    * Contract bound: the test side must fit a broadcastable sketch
    * (≤ 10⁸ shingles ≈ 180 MB at this fpp — asserted, the ANN
    * broadcast-query-side shape).
    *
    * One-sided error, audit direction reversed from [[decontaminate]]:
    * this flags TRAIN docs carrying test 5-grams (the removal
    * candidates).  Every truly contaminated doc is flagged with its
    * hit count ≥ the exact count (NO false negatives — a bloom can
    * only over-count); a clean doc appears with probability
    * ≈ fpp·n_shingles.  Exactness-critical audits re-check flagged
    * docs with the exact join over the (now tiny) flagged subset.
    */
  /** Distributed Bloom sketch of a (text) frame's distinct 5-gram
    * shingles: per-partition filters merged in a tree, fpp 0.001,
    * UTF-8 `putBinary` (the [[graft.functions.BloomCountHits]] probe
    * contract).  Broadcast-side bound asserted (≤ 1e8 shingles).
    * Shared by [[decontaminateBloom]] and the streaming gate
    * [[graft.streaming.Stateful.contaminationGate]].
    */
  def shingleBloom(docs: DataFrame): org.apache.spark.util.sketch.BloomFilter = {
    val s = docs.sparkSession
    import s.implicits._
    val sh = docs
      .select(explode(array_distinct(shingles(col("text"), 5))).as("shingle"))
    // size and bound on the DISTINCT shingle count (HLL, rsd 2%), not
    // the exploded row count: a duplicate-heavy sketch side (the same
    // boilerplate shingle across every doc) fits the broadcast
    // contract and should neither be rejected nor oversized for its
    // duplicates.  The 1.1 margin restores the oversize-only-lowers-
    // fpp property against HLL under-estimation (≥ 5σ at rsd 0.02).
    val n = (sh.agg(approx_count_distinct(col("shingle"), 0.02))
      .head.getLong(0) * 1.1).toLong
    require(n <= 100000000L,
      s"sketch side has ~$n distinct shingles; the broadcast-sketch contract caps at 1e8")
    sh.as[String].rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(math.max(n, 1L), 0.001))(
      (f, x) => { f.putBinary(x.getBytes(java.nio.charset.StandardCharsets.UTF_8)); f },
      (a, b) => a.mergeInPlace(b))
  }

  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bf = shingleBloom(docs.filter(col("doc_id") % 2 === 0))
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("train_id"),
        array_distinct(shingles(col("text"), 5)).as("sh"))
      .select(col("train_id"), size(col("sh")).cast("long").as("n_shingles"),
        graft.functions.BloomCountHits.bloomCountHits(col("sh"), bf)
          .cast("long").as("n_hit"))
      .filter(col("n_hit") > 0)
      .select(col("train_id"), col("n_shingles"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_shingles").cast("double")).as("hit_frac"))
      .orderBy(col("train_id"))
  }

  /** Sub-document decontamination — [[decontaminate]] at WINDOW
    * granularity (the published form of the check: verbatim benchmark
    * SPANS inside training docs, which distinct-5-gram counting
    * dilutes once a doc is long): per TRAIN doc, how many of its
    * stride-1 w-token windows occur verbatim anywhere in the TEST
    * side.  Catches a pasted benchmark paragraph regardless of
    * alignment ([[substrAudit]]'s guarantee applied bipartite) and
    * reports the contaminated FRACTION — the thresholdable number a
    * removal policy acts on.
    *
    * Scale shape: window identity is the 64-bit [[graft.functions
    * .WindowHashes]] hash (16 B/row exchanged, window text never
    * shuffles); the train probe is a merge SMJ semi join on the
    * wk-keyed exchange; per-doc window totals come map-side from the
    * un-exploded array on a separate narrow scan (the documented
    * scan-bandwidth trade).  The dir entry's doc_id-parity fixture
    * makes Catalyst specialize the split into per-side scans (the
    * parity predicates push to the parquet scan — three corpus scans
    * total here); a REAL deployment passes the benchmark as its own
    * SMALL table, making this two corpus scans + one tiny test scan
    * with identical exchange volume.  Only contaminated docs are
    * emitted.
    */
  def decontaminateSubstr(s: SparkSession, dir: String, w: Int = 20): DataFrame =
    decontaminateSubstrOver(Tables.documents(s, dir), w)

  /** [[decontaminateSubstr]] over any (doc_id, text) frame with the
    * doc_id-parity split (even = test, odd = train) — parameterized so
    * the spec can plant an offset span.
    */
  private[graft] def decontaminateSubstrOver(docs: DataFrame, w: Int): DataFrame = {
    val base = docs.select(col("doc_id"),
      graft.functions.WindowHashes.windowHashes(tokens(col("text")), w).as("wks"))
    val totals = base.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("train_id"), size(col("wks")).cast("long").as("n_windows"))
      .filter(col("n_windows") > 0)
    val wins = base.select(col("doc_id"), explode(col("wks")).as("wk"))
      .repartition(col("wk"))
    val test = wins.filter(col("doc_id") % 2 === 0).select(col("wk")).distinct()
    val hits = wins.filter(col("doc_id") % 2 === 1)
      .hint("merge").join(test.hint("merge"), Seq("wk"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_windows"))
      .select(col("doc_id").as("train_id"), col("n_hit_windows"))
    totals.join(hits, "train_id")
      .select(col("train_id"), col("n_windows"), col("n_hit_windows"),
        (col("n_hit_windows") / col("n_windows")).as("hit_frac"))
      .orderBy(col("train_id"))
  }

  /** Sub-document duplication audit: split every document into
    * consecutive 10-token chunks and measure, per doc, how much of it
    * is duplicated elsewhere in the corpus (the chunk-granularity
    * approximation of suffix-array ExactSubstr dedup — the signal that
    * catches templated/boilerplate SPANS exact whole-doc dedup misses).
    *
    * Scale shape: chunk identity is the 64-bit chunk hash (16 B/row
    * instead of the ~60 B chunk text — at 10¹² chunks that is a 24 TB
    * exchange instead of 90 TB; a 64-bit birthday collision alters one
    * count in ~10⁷ corpora and is the standard trade every production
    * chunk-dedup makes).  Corpus-wide frequency is a keyed aggregate
    * joined back to the per-(doc, chunk) rows — see [[chunkAudit]] for
    * why that beats a window over the hot chunk key.  An occurrence is
    * "duplicated" when its chunk text occurs anywhere else in the
    * corpus (including the same doc — self-repetition is duplication
    * too).
    */
  def dedupChunk(s: SparkSession, dir: String): DataFrame =
    chunkAudit(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Fixed-width chunk split shared by [[chunkAudit]] and
    * [[dedupLines]]: consecutive `chunkLen`-token spans.  tokens("")
    * is [""], so the trimmed-LENGTH guard gives a truly empty doc zero
    * chunks (mirrored in the oracle SQL).
    */
  private[graft] def chunkCol(text: Column, chunkLen: Int): Column = {
    val toks = tokens(text)
    val nChunks = ceil(size(toks) / lit(chunkLen.toDouble)).cast("int")
    when(length(trim(text)) > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * chunkLen + 1, lit(chunkLen)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** The audit over any (doc_id, text) frame — parameterized so the
    * spec can plant known duplicate spans and pin exact counts.
    *
    * Skew note: a corpus-wide boilerplate chunk is the SIGNAL here (it
    * must be counted, not dropped like jaccard's capped shingles), so
    * the hot key cannot be filtered away.  A window count over ck
    * would buffer every occurrence of that chunk in one task; instead
    * the frequency is a keyed aggregate (map-side partials collapse
    * each partition's occurrences of the hot chunk to one row) joined
    * back to the per-(doc, chunk) rows — an SMJ that AQE's skew-join
    * splitting can subdivide, which a window never can.
    */
  private[graft] def chunkAudit(docs: DataFrame, chunkLen: Int = 10): DataFrame = {
    val chunks = chunkCol(col("text"), chunkLen)
    // collapse to one row per (doc, chunk) with its in-doc occurrence
    // count before anything keys on ck alone
    val perDoc = docs
      .select(col("doc_id"), explode(chunks).as("chunk"))
      .groupBy(col("doc_id"), xxhash64(col("chunk")).as("ck"))
      .agg(count(lit(1)).as("cnt"))
    val freq = perDoc.groupBy(col("ck")).agg(sum(col("cnt")).as("freq"))
    // merge hint: below the broadcast threshold Spark would build freq
    // as a BroadcastHashJoin, recomputing the whole chunk pipeline for
    // the built side; the sort-merge form lets both sides read the ONE
    // (doc, chunk) exchange (ReusedExchange) — and at scale freq is
    // |distinct chunks| rows, far past any broadcast threshold anyway
    perDoc.hint("merge").join(freq.hint("merge"), "ck")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        sum(when(col("freq") > 1, col("cnt")).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks") / col("n_chunks")).as("dup_chunk_frac"))
  }

  /** Stride-1 ExactSubstr audit over `documents` with 20-token windows
    * — see [[substrAudit]].
    */
  def dedupSubstr(s: SparkSession, dir: String): DataFrame =
    substrAudit(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Stride-1 ExactSubstr audit — closes the alignment gap
    * [[chunkAudit]] documents: a duplicated span offset by even one
    * token produces disjoint CHUNK hashes there (the spec's negative
    * control proves the miss), but every w-token window at EVERY
    * offset hashes here, so any duplicated run of ≥ w tokens is caught
    * regardless of alignment — the relational form of suffix-array
    * ExactSubstr dedup (byte-granular suffix arrays detect ≥L-byte
    * repeats; fixed-w windows at stride 1 detect ≥w-token repeats with
    * a join-shaped plan).  Docs shorter than w tokens have no windows
    * and are absent from the output (mirrored in the oracle).
    *
    * Scale shape: identical to [[chunkAudit]] — window identity is the
    * 64-bit [[graft.functions.WindowHashes]] hash (16 B/row; the ~7·w
    * B window TEXT never shuffles), corpus frequency is a keyed
    * aggregate (map-side partials collapse a boilerplate window's
    * occurrences per partition) joined back as a merge-hinted SMJ both
    * of whose sides read the ONE (doc, window) exchange.  Stride 1
    * costs ~w× the ROWS of chunking but the same bytes-per-row scale
    * class, and the hashes come from one O(n) incremental pass, not w
    * slices per position.
    */
  def substrAudit(docs: DataFrame, w: Int = 20): DataFrame = {
    val wins = graft.functions.WindowHashes.windowHashes(tokens(col("text")), w)
    val perDoc = docs
      .select(col("doc_id"), explode(wins).as("wk"))
      .groupBy(col("doc_id"), col("wk"))
      .agg(count(lit(1)).as("cnt"))
    val freq = perDoc.groupBy(col("wk")).agg(sum(col("cnt")).as("freq"))
    perDoc.hint("merge").join(freq.hint("merge"), "wk")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_windows"),
        sum(when(col("freq") > 1, col("cnt")).otherwise(0L)).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows") / col("n_windows")).as("dup_window_frac"))
  }

  /** Stride-1 ExactSubstr REMOVAL over `documents` — see
    * [[substrRemove]].
    */
  def dedupSubstrRemove(s: SparkSession, dir: String): DataFrame =
    substrRemove(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** The removal twin of [[substrAudit]] (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * cleaning step): every duplicated ≥w-token run keeps ONE canonical
    * occurrence — the globally first by (doc_id, pos) — and every
    * other occurrence's tokens are cut, with each doc rebuilt from its
    * surviving tokens in order.  Overlapping duplicated windows merge
    * naturally: the removal mask is the UNION of [start, start+w)
    * over a doc's non-canonical duplicated-window starts, MINUS the
    * union of the doc's CANONICAL window spans — the exemption that
    * upgrades "keep one occurrence" from best-effort to invariant:
    * without it, a different run's non-canonical window overlapping a
    * canonical span eats part of the one copy the rule promised to
    * keep (round-7's documented approximation, now closed; the spec
    * plants exactly that cross-run overlap).  INVARIANT: every
    * duplicated window's canonical occurrence survives verbatim, so
    * the cleaned corpus still contains at least one full copy of every
    * duplicated ≥w-token run.
    *
    * Scale shape: windows shuffle as 16-byte hash rows ([[substrAudit]]
    * trade); the canonical pick is a keyed (wk) count+min-struct
    * aggregate whose MAP-SIDE PARTIALS collapse a hot boilerplate
    * window per partition — deliberately NOT a shared raw occ exchange
    * (the [[linesRemoval]] trade: sharing would forfeit the partials
    * and funnel every occurrence of the hot key into one aggregate
    * task; the occ pipeline recomputes per consumer at scan
    * bandwidth, and the probe join stays an AQE-skew-splittable SMJ).
    * Removal decisions come back as ONE skinny starts-array row per
    * affected doc; the rebuild is a map-side HOF over the token array,
    * so document text crosses at most one exchange.
    */
  def substrRemove(docs: DataFrame, w: Int = 20): DataFrame = {
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val occ = toksDf.select(col("doc_id"),
      posexplode(graft.functions.WindowHashes.windowHashes(col("toks"), w))
        .as(Seq("pos", "wk")))
    val dups = occ.groupBy(col("wk"))
      .agg(count(lit(1)).as("freq"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("freq") > 1)
    val starts = occ.hint("merge").join(dups.hint("merge"), "wk")
      .filter(!(col("doc_id") === col("keep.doc_id") && col("pos") === col("keep.pos")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    // canonical spans per doc: one row per duplicated window key in
    // `dups`, collapsing to one skinny starts-array row per doc that
    // hosts a canonical — strictly smaller than `starts` (≤1 row per
    // distinct duplicated window vs one per surviving occurrence)
    val canon = dups
      .groupBy(col("keep.doc_id").as("doc_id"))
      .agg(sort_array(collect_list(col("keep.pos"))).as("canon_starts"))
    toksDf.join(starts, Seq("doc_id"), "left")
      .join(canon, Seq("doc_id"), "left")
      .withColumn("st", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("cst", coalesce(col("canon_starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("toks"),
        (_, i) => !exists(col("st"), s => s <= i && i < s + w) ||
          exists(col("cst"), s => s <= i && i < s + w)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Corpus-level boilerplate-line REMOVAL — the C4-style cleaning step
    * [[dedupChunk]] only audits: every line occurring ≥3 times
    * corpus-wide is dropped, and each document is rebuilt from its
    * surviving lines in order.  The synthetic corpus has no newlines,
    * so this driver entry uses the same fixed 10-token chunk unit as
    * [[dedupChunk]] as its "line"; [[removeBoilerplateLines]] is the
    * real newline form for corpora with line structure.
    */
  def dedupLines(s: SparkSession, dir: String): DataFrame =
    linesRemoval(Tables.documents(s, dir), chunkCol(col("text"), 10), 3, " ")
      .orderBy(col("doc_id"))

  /** Newline-split boilerplate removal for corpora with real line
    * structure (the C4/Gopher dup-line cleaning step; spec-pinned on
    * planted multi-line docs — the synthetic corpus is single-line, so
    * the driver entry [[dedupLines]] substitutes the chunk unit).
    */
  def removeBoilerplateLines(docs: DataFrame, minOccurs: Long = 3): DataFrame =
    linesRemoval(docs, split(col("text"), "\n"), minOccurs, "\n")

  /** Shared removal pipeline over an arbitrary line split.
    *
    * Scale shape: the frequency pipeline shuffles only (doc_id, pos,
    * 64-bit line hash) — 24 B/row, never line text (the hash-identity
    * trade [[dedupChunk]] documents); the corpus-wide count is a keyed
    * aggregate with map-side partials (hot-boilerplate-safe, same
    * reasoning as [[chunkAudit]]), and removal DECISIONS come back as
    * ONE skinny (doc_id, removed-positions) row per affected doc.  The
    * rebuild is then a map-side HOF over the
    * original text: document text crosses at most one exchange (zero
    * when the sparse decisions frame broadcasts — boilerplate-bearing
    * docs are typically a small subset).
    */
  private[graft] def linesRemoval(docs: DataFrame, linesCol: Column,
      minOccurs: Long, sep: String): DataFrame = {
    val withLines = docs.select(col("doc_id"), linesCol.as("lines"))
    val occ = withLines
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), xxhash64(col("line")).as("lk"))
    val freq = occ.groupBy(col("lk")).agg(count(lit(1)).as("freq"))
    // deliberately NOT one shared occ exchange (the dedup_chunk
    // pattern): the frequency aggregate must keep its MAP-SIDE
    // PARTIALS so a corpus-wide boilerplate line collapses per
    // partition before the shuffle — sharing a raw repartition(lk)
    // would forfeit them and funnel every occurrence of the hot key
    // into one aggregate task.  The line split recomputes map-side per
    // consumer (scan-bandwidth work); the merge hint keeps the
    // occ⋈freq probe an AQE-skew-splittable SMJ
    val removed = occ.hint("merge").join(freq.hint("merge"), "lk")
      .filter(col("freq") >= minOccurs)
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("rm"))
    withLines.join(removed, Seq("doc_id"), "left")
      .withColumn("rmset", coalesce(col("rm"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("rmset")).cast("long").as("n_removed"),
        array_join(filter(col("lines"),
          (_, i) => !array_contains(col("rmset"), i)), sep).as("clean_text"))
  }

  /** MinHash(128) signature per doc + banded LSH (32 bands × 4 rows).
    * Signatures come from the one-pass [[graft.functions.MinHashSig]]
    * expression (two-hash construction).  Pairs sharing ≥1 band bucket
    * are candidates; the reported estimate is the matching-position
    * fraction of the two signatures.  With t = (1/b)^(1/r) ≈ 0.42,
    * recall at J ≥ 0.8 is effectively 1.  The shuffle is keyed by
    * (band, bucket): only same-bucket docs ever meet, so this is the
    * 100 TB-safe form of near-dedup.
    */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val numHashes = 128
    val bands = 32
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    // one exchange on doc_id makes every downstream consumer (band
    // explode, both candidate rejoins) a ReusedExchange reader — the
    // signature pipeline runs exactly once
    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig.minhashSig(col("sh"), numHashes).as("sig"))
      .repartition(col("doc_id"))
    // band keys only (24 B/row) through the explode + self-join; the
    // fat 128-long signatures rejoin just for the surviving candidates.
    // Native one-pass band hashing (posexplode index = band id) — the
    // HOF form interpreted a lambda and allocated a slice per band
    val banded = sig.select(col("doc_id"),
      posexplode(graft.functions.MinHashBandKeys.minhashBandKeys(col("sig"), bands))
        .as(Seq("band", "bkey")))
      // shared exchange: the self-join reuses one computation
      .repartition(col("band"), col("bkey"))
    // merge hint: keep the self-join in sort-merge form so both sides
    // read the one band exchange (broadcast would recompute the
    // signature pipeline for the built side below the threshold)
    val cand = banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
    cand
      .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (size(filter(zip_with(col("s1.sig"), col("s2.sig"), (x, y) => x === y), b => b))
          / lit(numHashes)).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.7)
      .orderBy(col("d1"), col("d2"))
  }

  /** SimHash64 fingerprints + Hamming ≤ 7 pairs.
    *
    * Blocking (Manku-style combination multi-index): split the 64-bit
    * fingerprint into 9 blocks (8×7 bits + 1×8 bits) and key each doc
    * under all C(9,2)=36 ordered block-pair concatenations (~14-bit
    * keys, 16k–32k values per table).  ≤7 bit errors dirty ≤7 blocks,
    * leaving ≥2 clean blocks, so one pair-key always matches — the
    * exact Hamming ≤ 7 guarantee of single-block pigeonhole, but with
    * random-collision volume Θ(n²/2¹⁴) per table instead of the
    * Θ(n²/2⁸) of 8-bit bands (the old scheme's scale-killer: bucket
    * occupancy n/256 grows linearly with the corpus).  36 skinny
    * (16-byte) rows per doc through the exchange is the price; the
    * fat columns never fan out.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), simhash64(array_distinct(shingles(col("text"), 3))).as("sh"))
    val banded = docs.select(col("doc_id"), col("sh"),
      explode(simhashBandKeys(col("sh"))).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bkey"))
      // shared exchange: the self-join reuses one simhash computation
      .repartition(col("band"), col("bkey"))
    banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      // popcount-filter BEFORE the distinct: the band join can be
      // skew-heavy (similar corpora collapse onto few band values) and
      // the filter is codegen'd, so only surviving pairs shuffle
      .filter(col("hamming") <= 7)
      .dropDuplicates("d1", "d2")
      .orderBy(col("d1"), col("d2"))
  }

  /** Combination block keys for [[dedupSimhash]]: blocks 0..7 are 7
    * bits, block 8 is 8 bits; band id = 9·i + j for the (i, j) block
    * pair, key = block_i · 2⁸ + block_j.
    */
  private[graft] def simhashBandKeys(sh: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def block(b: Int): org.apache.spark.sql.Column = {
      val len = if (b == 8) 8 else 7
      shiftrightunsigned(sh, b * 7).bitwiseAND(lit((1L << len) - 1))
    }
    val combos = for (i <- 0 until 9; j <- i + 1 until 9) yield (i, j)
    array(combos.map { case (i, j) =>
      struct(lit(i * 9 + j).as("band"), (block(i) * lit(256L) + block(j)).as("bkey"))
    }: _*)
  }

  /** Hard corpus-size budget for [[dedupEmbedding]]'s all-pairs form:
    * n² pair volume at this bound is ~2³⁴ cosine evaluations — already
    * a deliberately-heavy batch job; past it the all-pairs shape is a
    * scale error, not a bigger job.  Same contract discipline as
    * annBruteforceFor's broadcast bound and the CC contraction's edge
    * budget: fail LOUD at plan time instead of launching a silent n²
    * job.  The scale path is [[dedupEmbeddingLsh]] / semdedup.
    */
  private[operators] val EmbeddingAllPairsBudget = 131072L

  /** Embedding cosine near-dup pairs (threshold 0.4 for this corpus).
    * All-pairs reference form: at 100 TB use the LSH-bucketed variant
    * (see [[Similarity.annLsh]]) to key the shuffle.  The cosine is a
    * strict sequential fold for cross-engine bit parity.  Guarded by
    * [[EmbeddingAllPairsBudget]] — an oversized corpus fails loudly
    * with a pointer to the LSH form instead of running O(n²).
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    dedupEmbeddingBudgeted(s, dir, EmbeddingAllPairsBudget)

  /** Budget-parameterized seam so the spec can pin the loud failure
    * with a tiny bound against the real operator path.
    */
  private[graft] def dedupEmbeddingBudgeted(s: SparkSession, dir: String,
      budget: Long): DataFrame = {
    val n = Similarity.corpusSize(s, dir)
    require(n <= budget,
      s"dedup_embedding's all-pairs form is O(n²) and budgeted at " +
        s"$budget vectors (corpus has $n); use " +
        "dedup_embedding_lsh (LSH-bucketed, same cosine threshold) or " +
        "semdedup for corpora past the budget")
    // the O(n²) pair work is inherent to the reference form, but its
    // PARALLELISM must not depend on the input's file count: a
    // single-file corpus otherwise leaves the nested-loop stream side
    // one task wide (measured at sf1: 32 s wall ≈ 32 s task, serial) —
    // one cheap n-row exchange fans the quadratic work across the
    // cluster, values bit-unchanged
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      .filter(col("nrm") > 0)
      .repartition(col("vec_id"))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos6"))
      .orderBy(col("id1"), col("id2"))
  }

  /** The 100 TB form of embedding near-dup: random-hyperplane LSH
    * buckets key the shuffle (same 8-table machinery as [[Similarity]],
    * bucket width derived from corpus size), so only same-bucket
    * vectors ever pair; survivors are confirmed by exact cosine ≥ 0.4.
    * All-pairs work drops from O(n²) to Σ_bucket n_b² — the
    * recall/threshold trade is pinned by the spec against the exact
    * [[dedupEmbedding]].
    */
  def dedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    val bits = Similarity.lshBitsFor(Similarity.corpusSize(s, dir))
    val banded = Similarity.normalizedVecs(s, dir)
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(Similarity.hyperplaneBuckets(col("e"), bits)).as("tb"))
      .select(col("vec_id"), col("e"), col("nrm"), col("tb.tbl"), col("tb.bucket"))
      // shared exchange for the self-join
      .repartition(col("tbl"), col("bucket"))
    banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos6"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Incremental dedup: clear a NEW batch against an EXISTING corpus
    * without reprocessing the corpus — the production shape for
    * continuous ingestion (today's crawl vs the accumulated corpus,
    * where corpus×corpus work was already paid in previous runs).
    * One verdict per batch doc, exact match taking precedence:
    * `exact_dup` (normalized-text fingerprint already in the corpus),
    * `near_dup` (≥ τ 3-gram Jaccard with some corpus doc), `kept`.
    *
    * Both checks are BIPARTITE batch×corpus — never corpus×corpus:
    * the exact pass semi-joins 16-byte fingerprints; the near pass
    * rides the [[ShingleDfCap]]-capped shingle inverted index with the
    * two sides joined on the shingle key, so candidate volume per
    * shingle is ≤ min(df_batch, cap)·min(df_corpus, cap) and corpus
    * text crosses the wire as skinny (doc_id, shingle) rows exactly
    * once.  At 100 TB the corpus fingerprint/shingle relations live as
    * maintained append-only tables rather than being recomputed per
    * batch; the joins here are identical either way.
    */
  def dedupIncremental(corpus: DataFrame, batch: DataFrame, tau: Double): DataFrame = {
    // the one canonical content fingerprint — the batch entry
    // (dedup_exact), this, and the streaming twin must never diverge
    def fp(df: DataFrame) =
      df.select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val exactDup = fp(batch)
      .join(fp(corpus), Seq("fp"), "left_semi")
      .select(col("doc_id"))
    // the near pass runs only on exact-SURVIVORS: an exact dup's
    // verdict is decided (exact takes precedence), and on a real crawl
    // exact dups are a large fraction of the batch — sparing them the
    // shingle pipeline prunes the expensive side of the join by that
    // fraction.  Output is unchanged: the CASE below would mask their
    // near flag anyway.  The DF cap is therefore measured over
    // survivors ∪ corpus — the oracle's sh0 excludes exact-dup batch
    // docs the same way, so engine and oracle agree even when the cap
    // binds (pruned exact dups can only LOWER a shingle's frequency).
    val survivors = batch
      .join(exactDup.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // one union-side tag so the DF cap sees the combined frequency (a
    // boilerplate shingle explodes the bipartite join no matter which
    // side it is frequent on), then the two sides split back out of
    // the SAME shingle-partitioned exchange
    val tagged = survivors.select(lit("b").as("side"), col("doc_id"), col("text"))
      .unionAll(corpus.select(lit("c").as("side"), col("doc_id"), col("text")))
      .select(col("side"), col("doc_id"),
        explode(array_distinct(shingles(col("text"), 3))).as("shingle"))
    // DF cap as a keyed aggregate joined back (the [[chunkAudit]]
    // shape): map-side partials collapse a corpus-wide boilerplate
    // shingle per partition before the shuffle, and because the
    // frequency side is filtered BEFORE the join, a hot shingle simply
    // finds no match — a window count would buffer every occurrence of
    // it in one task before the cap could drop a single row, making the
    // cap filter itself the skew bottleneck it exists to prevent.  The
    // merge hints keep the join-back an AQE-skew-splittable SMJ.
    val keep = tagged.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select(col("shingle"))
    val sh = tagged.hint("merge").join(keep.hint("merge"), "shingle")
    val sz = sh.groupBy(col("side"), col("doc_id")).agg(count(lit(1)).as("n"))
    val nearDup = sh.filter(col("side") === "b").as("a").hint("merge")
      .join(sh.filter(col("side") === "c").as("b").hint("merge"),
        col("a.shingle") === col("b.shingle"))
      .groupBy(col("a.doc_id").as("bd"), col("b.doc_id").as("cd"))
      .agg(count(lit(1)).as("c"))
      .join(sz.filter(col("side") === "b").select(col("doc_id").as("bd"), col("n").as("nb")), "bd")
      .join(sz.filter(col("side") === "c").select(col("doc_id").as("cd"), col("n").as("nc")), "cd")
      .filter(col("c") / (col("nb") + col("nc") - col("c")) >= tau)
      .select(col("bd").as("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exactDup.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("kept").as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** Driver entry: even doc_ids are the incoming batch, odd the
    * existing corpus (same split as [[decontaminate]]), τ = 0.8.
    */
  def dedupIncrementalEntry(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    dedupIncremental(docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0), 0.8)
  }

  /** Near-dup cluster-size distribution: how big do duplicate
    * clusters get — the histogram a dedup policy is tuned against
    * (a heavy tail says template boilerplate, a flat 2-spike says
    * mirror pairs).  Singletons (docs in no pair) are the size-1 row,
    * counted by subtraction so no corpus-sized relation is touched
    * beyond one count.
    *
    * Scale shape: pure FileScan consumer of the delta-maintained
    * comps label artifact — one |labels|-key aggregate (comp →
    * size), one ≤|distinct sizes|-key aggregate, two 1-row counts.
    */
  def dupClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val labels = nearDupComponentLabels(s, dir).select(col("id"), col("comp"))
      .localCheckpoint(eager = false) // feeds sizes + the labeled count
    val hist = labels.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    val singles = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      .crossJoin(labels.agg(count(lit(1)).as("nl")))
      .select(lit(1L).as("cluster_size"), (col("n") - col("nl")).as("n_clusters"))
    hist.unionByName(singles)
      .groupBy(col("cluster_size")).agg(sum(col("n_clusters")).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dup_cluster_sizes" -> (dupClusterSizes _),
    "dedup_incremental" -> (dedupIncrementalEntry _),
    "dedup_exact" -> (dedupExact _),
    "dedup_report" -> (dedupReport _),
    "contamination_matrix" -> ((s: SparkSession, dir: String) => contaminationMatrix(s, dir)),
    "lsh_tuning" -> (lshTuning _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "source_pair_overlap" -> (sourcePairOverlap _),
    "dedup_chunk" -> (dedupChunk _),
    "dedup_substr" -> (dedupSubstr _),
    "dedup_substr_remove" -> (dedupSubstrRemove _),
    "dedup_lines" -> (dedupLines _),
    "dedup_components" -> (dedupComponents _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "decontaminate" -> (decontaminate _),
    "decontaminate_bloom" -> (decontaminateBloom _),
    "decontaminate_substr" -> ((s: SparkSession, dir: String) => decontaminateSubstr(s, dir)),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _))

  /** dedup_minhash / dedup_simhash are sketch-based → rows-only check
    * (their ScalaTest specs pin estimates against exact Jaccard).
    */
  def oracleSql: Map[String, String] = Map(
    "dedup_incremental" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS nt,
        |  string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |fp AS (SELECT doc_id, md5(nt) AS fp FROM t),
        |bexact AS (SELECT b.doc_id FROM fp b WHERE b.doc_id % 2 = 0
        |           AND EXISTS (SELECT 1 FROM fp c WHERE c.doc_id % 2 = 1 AND c.fp = b.fp)),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t
        |    WHERE doc_id % 2 = 1 OR doc_id NOT IN (SELECT doc_id FROM bexact)),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS bd, b.doc_id AS cd, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |          WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |          GROUP BY bd, cd),
        |near AS (SELECT DISTINCT bd AS doc_id FROM inter
        |         JOIN sz s1 ON bd = s1.doc_id JOIN sz s2 ON cd = s2.doc_id
        |         WHERE c / (s1.n + s2.n - c) >= 0.8)
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id IN (SELECT doc_id FROM bexact) THEN 'exact_dup'
        |       WHEN d.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
        |       ELSE 'kept' END AS verdict
        |FROM documents d WHERE d.doc_id % 2 = 0 ORDER BY d.doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |f AS (SELECT 'full' AS strategy, md5(nt) AS k, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
        |      FROM n GROUP BY k HAVING COUNT(*) > 1),
        |p AS (SELECT 'prefix50' AS strategy, md5(substr(nt, 1, 50)) AS k, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
        |      FROM n GROUP BY k HAVING COUNT(*) > 1)
        |SELECT * FROM f UNION ALL SELECT * FROM p ORDER BY strategy, k""".stripMargin,
    // exact BIGINT counts; the fraction divides two DOUBLE casts of
    // exact integers, so it is IEEE-identical across engines
    "dedup_report" ->
      """WITH n AS (SELECT source,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
        |  FROM documents),
        |a AS (SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct
        |      FROM n GROUP BY source)
        |SELECT source, n_docs, n_distinct,
        |  CAST(n_docs - n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac
        |FROM a ORDER BY source""".stripMargin,
    // distinct (source, shingle) inverted index; jaccard divides
    // exact BIGINTs cast to DOUBLE — IEEE-identical across engines
    "contamination_matrix" ->
      """WITH t AS (SELECT source, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh AS (SELECT DISTINCT source, unnest(CASE WHEN len(tk) >= 5
        |    THEN [array_to_string(tk[i:i+4], ' ') for i in generate_series(1, len(tk)-4)]
        |    ELSE [] END) AS s FROM t),
        |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        |p AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS c
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |      GROUP BY sa, sb)
        |SELECT sa AS src_a, sb AS src_b, c AS n_shared,
        |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
        |FROM p JOIN sz na ON sa = na.source JOIN sz nb ON sb = nb.source
        |ORDER BY src_a, src_b""".stripMargin,
    // stepwise squarings are the same IEEE multiplications as the
    // engine's explicit product tree; literals cast to DOUBLE
    "lsh_tuning" ->
      """WITH v AS (SELECT unnest(generate_series(1, 19)) * 5 AS s_pct),
        |a AS (SELECT s_pct, CAST(s_pct AS DOUBLE) / CAST(100 AS DOUBLE) AS sim FROM v),
        |b AS (SELECT s_pct, sim, CAST(1 AS DOUBLE) - ((sim * sim) * (sim * sim)) AS q FROM a),
        |c AS (SELECT s_pct, sim, q * q AS q2 FROM b),
        |d AS (SELECT s_pct, sim, q2 * q2 AS q4 FROM c),
        |e AS (SELECT s_pct, sim, q4 * q4 AS q8 FROM d),
        |f AS (SELECT s_pct, sim, q8 * q8 AS q16 FROM e),
        |g AS (SELECT s_pct, sim, q16 * q16 AS q32 FROM f)
        |SELECT s_pct, sim AS jaccard, CAST(1 AS DOUBLE) - q32 AS p_candidate
        |FROM g ORDER BY s_pct""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY d1, d2)
        |SELECT d1, d2, c / (s1.n + s2.n - c) AS jaccard
        |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |WHERE c / (s1.n + s2.n - c) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    // the same pair CTE rolled up by the unordered source pair
    "source_pair_overlap" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY d1, d2),
        |pr AS (SELECT d1, d2 FROM inter
        |       JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |       WHERE c / (s1.n + s2.n - c) >= 0.8)
        |SELECT least(da.source, db.source) AS src_a,
        |  greatest(da.source, db.source) AS src_b, COUNT(*) AS n_pairs
        |FROM pr JOIN documents da ON pr.d1 = da.doc_id
        |        JOIN documents db ON pr.d2 = db.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // chunk grouping rides the chunk TEXT here (the engine's 64-bit
    // hash key is collision-free at any test SF, so the counts agree)
    "dedup_chunk" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
        |           WHERE length(trim(text)) > 0),
        |c AS (SELECT doc_id, unnest([array_to_string(tk[(i*10+1):(i*10+10)], ' ')
        |    for i in generate_series(0, CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1)]) AS chunk FROM t),
        |f AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY chunk) AS freq FROM c)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS dup_chunk_frac
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // window grouping rides the window TEXT here, as dedup_chunk's
    // does the chunk text (the engine's 64-bit window hash is
    // collision-free at any test SF, so the counts agree); tk[i:i+19]
    // is a 20-token inclusive slice
    // window TEXT replays the engine's 64-bit window hashes exactly
    // absent collisions (the dedup_substr precedent); test distinct +
    // train probe mirror the engine's one-exchange bipartite plan
    "decontaminate_substr" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |w AS (SELECT doc_id, unnest([array_to_string(tk[i:i+19], ' ')
        |    for i in generate_series(1, len(tk)-19)]) AS win FROM t WHERE len(tk) >= 20),
        |test AS (SELECT DISTINCT win FROM w WHERE doc_id % 2 = 0),
        |tr AS (SELECT doc_id, win FROM w WHERE doc_id % 2 = 1),
        |tot AS (SELECT doc_id AS train_id, COUNT(*) AS n_windows FROM tr GROUP BY doc_id),
        |h AS (SELECT doc_id AS train_id, COUNT(*) AS n_hit_windows
        |      FROM tr JOIN test USING (win) GROUP BY doc_id)
        |SELECT train_id, n_windows, n_hit_windows,
        |  CAST(n_hit_windows AS BIGINT) / CAST(n_windows AS BIGINT) AS hit_frac
        |FROM tot JOIN h USING (train_id)
        |ORDER BY train_id""".stripMargin,
    "dedup_substr" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |w AS (SELECT doc_id, unnest([array_to_string(tk[i:i+19], ' ')
        |    for i in generate_series(1, len(tk)-19)]) AS win FROM t WHERE len(tk) >= 20),
        |f AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY win) AS freq FROM w)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        |  CAST(SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS dup_window_frac
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // canonical pick replayed as a struct-min (DuckDB structs compare
    // lexicographically like Spark's); removal positions expand each
    // non-canonical start by w offsets; zipped unnests align (pos, tok)
    "dedup_substr_remove" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |o AS (SELECT doc_id, unnest(generate_series(0, len(tk)-20)) AS pos,
        |             unnest([array_to_string(tk[i:i+19], ' ')
        |               for i in generate_series(1, len(tk)-19)]) AS win
        |      FROM t WHERE len(tk) >= 20),
        |d AS (SELECT win, min(struct_pack(d := doc_id, p := pos)) AS keep
        |      FROM o GROUP BY win HAVING COUNT(*) > 1),
        |rmocc AS (SELECT doc_id, pos FROM o JOIN d USING (win)
        |          WHERE NOT (doc_id = keep['d'] AND pos = keep['p'])),
        |keeppos AS (SELECT DISTINCT keep['d'] AS doc_id, keep['p'] + j AS p
        |            FROM d, generate_series(0, 19) g(j)),
        |rmpos AS (SELECT DISTINCT doc_id, pos + j AS p FROM rmocc, generate_series(0, 19) g(j)
        |          EXCEPT SELECT doc_id, p FROM keeppos),
        |tokpos AS (SELECT doc_id, unnest(tk) AS tok,
        |                  unnest(generate_series(0, len(tk)-1)) AS p FROM t),
        |agg AS (SELECT tp.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN r.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  COALESCE(array_to_string(list(tok ORDER BY tp.p) FILTER (WHERE r.p IS NULL), ' '), '') AS clean_text
        |  FROM tokpos tp LEFT JOIN rmpos r ON tp.doc_id = r.doc_id AND tp.p = r.p
        |  GROUP BY tp.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_removed, clean_text
        |FROM agg ORDER BY doc_id""".stripMargin,
    // same chunk-wrap replay as dedup_chunk; zipped unnests carry the
    // 0-based position (as 1-based here — only order matters for the
    // rebuild), and the FILTERed ordered list rebuilds clean_text
    "dedup_lines" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |w AS (SELECT doc_id, CASE WHEN length(trim(text)) > 0
        |    THEN [array_to_string(tk[(i*10+1):(i*10+10)], ' ')
        |          for i in generate_series(0, CAST(ceil(len(tk) / 10.0) AS BIGINT) - 1)]
        |    ELSE [] END AS lines FROM t),
        |o AS (SELECT doc_id, unnest(lines) AS line,
        |             unnest(generate_series(1, len(lines))) AS pos FROM w),
        |f AS (SELECT line, COUNT(*) AS freq FROM o GROUP BY line),
        |a AS (SELECT doc_id,
        |        SUM(CASE WHEN freq >= 3 THEN 1 ELSE 0 END) AS nrm,
        |        array_to_string(list(line ORDER BY pos) FILTER (WHERE freq < 3), ' ') AS clean
        |      FROM o JOIN f USING (line) GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(nrm, 0) AS BIGINT) AS n_removed,
        |  COALESCE(clean, '') AS clean_text
        |FROM w LEFT JOIN a USING (doc_id) ORDER BY w.doc_id""".stripMargin,
    "decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 5
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
        |          for i in generate_series(1, len(tk)-4)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |tr AS (SELECT shingle, doc_id AS train_id FROM sh WHERE doc_id % 2 = 1),
        |te AS (SELECT shingle, doc_id AS test_id FROM sh WHERE doc_id % 2 = 0)
        |SELECT test_id, COUNT(DISTINCT train_id) AS n_train_docs, COUNT(*) AS n_shared_shingles
        |FROM te JOIN tr USING (shingle)
        |GROUP BY test_id ORDER BY test_id""".stripMargin,
    // the dedup_components CC replay, aggregated to a size histogram;
    // singletons counted by subtraction exactly as the engine does
    "dup_cluster_sizes" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY d1, d2),
        |p AS (SELECT d1, d2 FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |      WHERE c / (s1.n + s2.n - c) >= 0.8),
        |e AS (SELECT d1 AS src, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |      UNION
        |      SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
        |cmp AS (SELECT id AS doc_id, LEAST(id, MIN(reach)) AS rep FROM r GROUP BY id),
        |cs AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM cmp GROUP BY rep),
        |h AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM cs GROUP BY 1),
        |alls AS (SELECT cluster_size, n_clusters FROM h
        |  UNION ALL SELECT CAST(1 AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM cmp) AS BIGINT))
        |SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters,
        |  CAST(cluster_size * SUM(n_clusters) AS BIGINT) AS n_docs
        |FROM alls GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_components" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY d1, d2),
        |p AS (SELECT d1, d2 FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |      WHERE c / (s1.n + s2.n - c) >= 0.8),
        |e AS (SELECT d1 AS src, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |      UNION
        |      SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
        |comp AS (SELECT id AS doc_id, LEAST(id, MIN(reach)) AS rep FROM r GROUP BY id)
        |SELECT c.doc_id, c.rep, cnt.n AS n_members
        |FROM comp c JOIN (SELECT rep, COUNT(*) AS n FROM comp GROUP BY rep) cnt ON c.rep = cnt.rep
        |ORDER BY c.doc_id""".stripMargin,
    // same component CTE as dedup_components, then keep-best by
    // (n_chars DESC, doc_id) per cluster
    "dedup_keep_best" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END) AS shingle FROM t),
        |sh AS (SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY d1, d2),
        |p AS (SELECT d1, d2 FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |      WHERE c / (s1.n + s2.n - c) >= 0.8),
        |e AS (SELECT d1 AS src, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |      UNION
        |      SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
        |cmp AS (SELECT id AS doc_id, LEAST(id, MIN(reach)) AS comp FROM r GROUP BY id),
        |sel AS (SELECT cmp.comp, d.doc_id, d.n_chars,
        |        row_number() OVER (PARTITION BY cmp.comp
        |                           ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |        FROM cmp JOIN documents d USING (doc_id))
        |SELECT comp, COUNT(*) AS n_members,
        |  MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
        |  MAX(CASE WHEN rn = 1 THEN n_chars END) AS kept_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_chars) AS BIGINT) - MAX(CASE WHEN rn = 1 THEN n_chars END)
        |    AS chars_dropped
        |FROM sel GROUP BY comp ORDER BY comp""".stripMargin,
    "dedup_embedding" ->
      """WITH v AS (SELECT * FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(CAST(embedding AS DOUBLE[]))),
        |    i -> CAST(embedding AS DOUBLE[])[i] * CAST(embedding AS DOUBLE[])[i]))) AS nrm
        |  FROM embeddings) WHERE nrm > 0),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  list_sum(list_transform(generate_series(1, len(a.e)), i -> a.e[i] * b.e[i]))
        |  / (a.nrm * b.nrm) AS cos
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, round(cos, 6) AS cos6 FROM p WHERE cos >= 0.4
        |ORDER BY id1, id2""".stripMargin)
}
