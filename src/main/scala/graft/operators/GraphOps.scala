package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graph algorithms over relations the other operators emit — the
  * near-dup pair graph ([[Dedup.dedupComponents]] already resolves
  * components over it) and the kNN neighbor graph ([[Similarity
  * .knnJoin]]).  Everything here is expressed as joins + keyed
  * aggregates with bounded per-key state, iterated a FIXED number of
  * rounds with lineage cuts — the components playbook.
  */
object GraphOps {

  /** PageRank over an edge list — embedding-space centrality when run
    * on the kNN graph: a vector many others count among their nearest
    * neighbors is a hub of its region, the signal coreset-selection
    * and diversity-sampling passes rank by (and the web-graph
    * original is a classic document-quality prior).
    *
    * DETERMINISM: rank mass accumulates in DECIMAL (the
    * [[Similarity.kmeansTrain]] trade) — decimal addition is exact ⇒
    * order-insensitive ⇒ the ranks are bit-identical on any
    * partitioning or cluster layout, where double sums would drift
    * with shuffle arrival order.  The working type is
    * DECIMAL(20,18), NOT (38,18): ranks are probabilities (≤ 1, two
    * integer digits are ample) and the narrow type is what keeps
    * Spark's decimal arithmetic EXACT — at (38,18), `+`/`*`/`/` all
    * overflow precision 38 and `adjustPrecisionScale` silently cuts
    * the result scale to 17/6, costing ~1e-7 per iteration (measured
    * before this was fixed).  At (20,18): share = r/deg with deg as
    * decimal(10,0) divides at scale 29 within precision 31; the sum
    * widens to (30,18); damping (10,9) × inflow (20,18) multiplies
    * exactly at scale 27; base (20,18) + that adds exactly at scale
    * 18 — every step exact or a single deterministic HALF_UP
    * rounding back to scale 18.
    *
    * Scale shape: per iteration one join of the rank relation onto
    * the edge list (both partitioned by src — the exchange reuses
    * round to round) and one dst-keyed sum with map-side partials;
    * per-node state is one decimal.  Lineage cuts via lazy
    * localCheckpoint every round keep the plan from growing with
    * iteration count.
    *
    * Dangling nodes (out-degree 0): by DEFAULT their mass leaks —
    * Σranks < 1 is the honest signature of sinks, and the kNN graph
    * has out-degree k everywhere so the default costs nothing there.
    * `redistributeDangling = true` turns on the textbook correction
    * for GENERAL graphs: each round the dangling nodes' total rank is
    * collected as ONE decimal scalar (a semi-join aggregate over the
    * dangling slice — O(1) driver state, never O(nodes)) and re-spread
    * uniformly inside the damping term, so Σranks stays ≈ 1 (exact up
    * to one HALF_UP rounding per node per round; spec-pinned on a
    * planted sink graph).  The scalar's /n happens driver-side in
    * BigDecimal at an explicit scale-18 HALF_UP — the same decimal
    * discipline as every other step, so bit-determinism is unchanged.
    *
    * Input: (src, dst) long columns.  Output: (id, rank double,
    * n_in long) — rank plus the in-degree diagnostic.
    */
  def pageRank(edges: DataFrame, iters: Int = 8,
      damping: Double = 0.85, redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1,
      s"need iters >= 1 and 0 < damping < 1, got $iters/$damping")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("id"), lit(0.0).as("rank"), lit(0L).as("n_in"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    // edges with their src out-degree, joined ONCE: both sides are
    // static across rounds, so re-joining inside the loop paid one
    // whole join (and its exchanges) per iteration for an identical
    // result — the per-round work is now rank-join + dst-sum only
    val edeg = e.join(outdeg, "src").localCheckpoint(eager = false)
    // the out-degree-0 slice, computed once; empty on the kNN graph
    val danglingIds =
      if (redistributeDangling)
        nodes.join(outdeg.select(col("src").as("id")), Seq("id"), "left_anti")
          .localCheckpoint(eager = false)
      else null
    val D = "decimal(20,18)"
    def d18(x: BigDecimal) =
      lit(x.setScale(18, BigDecimal.RoundingMode.HALF_UP)).cast(D)
    val base = (BigDecimal(1) - BigDecimal(damping)) / BigDecimal(n)
    var rank = nodes.select(col("id"),
      d18(BigDecimal(1) / BigDecimal(n)).as("r"))
    (1 to iters).foreach { _ =>
      // no join-strategy hints: AQE picks from ACTUAL sizes — the rank
      // relation broadcasts while the graph is small and graduates to
      // a shuffled join when it is corpus-sized; a forced merge hint
      // would pay two sorts per iteration at every scale
      val contrib = edeg
        .join(rank.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          (col("r") / col("deg").cast("decimal(10,0)")).cast(D).as("share"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("inflow"))
      // dangling correction: one decimal scalar per round (exact sum,
      // then a single explicit HALF_UP /n in driver BigDecimal), added
      // inside the damping term like a uniform inflow
      val dmShare: BigDecimal =
        if (redistributeDangling) {
          val row = rank.join(danglingIds, Seq("id"), "left_semi")
            .agg(sum(col("r")).as("s")).head
          val dm = Option(row.getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
          (dm / BigDecimal(n)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        } else BigDecimal(0)
      rank = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (d18(base) +
            (lit(BigDecimal(damping).setScale(9, BigDecimal.RoundingMode.HALF_UP))
              .cast("decimal(10,9)") *
              (coalesce(col("inflow").cast(D), d18(BigDecimal(0))) + d18(dmShare))
                .cast(D)).cast(D))
            .cast(D).as("r"))
        .localCheckpoint(eager = false)
    }
    val indeg = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("n_in"))
    rank.join(indeg, Seq("id"), "left")
      .select(col("id"), col("r").cast("double").as("rank"),
        coalesce(col("n_in"), lit(0L)).as("n_in"))
  }

  /** Driver entry: PageRank centrality of the embedding corpus's kNN
    * graph (k = 5 neighbor edges from [[Similarity.knnJoinEmbeddings]]),
    * top 50 hubs.  Approximate upstream (LSH candidate generation) →
    * rows-only oracle; the spec pins pageRank itself on exact planted
    * graphs.
    */
  def knnPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnJoinEmbeddings(s, dir)
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
    // 6 iterations: hub ORDERING stabilizes well before rank VALUES
    // (0.85⁶ ≈ 0.38 residual) and each extra round is a full
    // join+agg stage pair — the probe-measured knee for a top-50 cut
    pageRank(edges, iters = 6)
      .orderBy(col("rank").desc, col("id"))
      .limit(50)
  }

  /** Label-propagation communities over an edge list — the
    * graph-native clustering pass (topic/near-field grouping) that
    * complements the centroidal view ([[Similarity.kmeansEmbed]]
    * partitions SPACE; this follows CONNECTIVITY, so two dense
    * regions a centroid would merge stay separate unless edges
    * actually bridge them).  RAW LPA is notoriously
    * nondeterministic (random update order, random tie-breaks); this
    * is the deterministic form: SYNCHRONOUS rounds, each node takes
    * the most frequent label among its neighbors with ties broken by
    * SMALLEST label, fixed `iters` rounds.  Synchronous updates can
    * oscillate on bipartite substructures instead of converging —
    * the documented trade for run-to-run reproducibility; a fixed
    * round count bounds it, and community IDENTITY (the min-id
    * anchor) stabilizes rounds before membership edges do.
    *
    * Scale shape per round: one join of the |V|-row label relation
    * onto the symmetrized edge list (both keyed by dst) and two
    * bounded aggregates — (src, label) counts collapse map-side, the
    * per-src argmax is a single struct-max with map-side partials
    * (no window function, no per-node neighbor list materialized).
    * Lineage cuts via lazy localCheckpoint per round, the
    * [[pageRank]] playbook.
    *
    * Input: (src, dst) long columns (direction ignored — edges are
    * symmetrized; self-loops dropped).  Output: (id, label) with
    * label = a member id of the community.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    // symmetrized ⇒ every node occurs as src; isolated nodes have no
    // edges at all and are out of scope (no label to propagate)
    val nodes = e.select(col("src").as("id")).distinct()
      .localCheckpoint(eager = false)
    var lab = nodes.select(col("id"), col("id").as("label"))
    (1 to iters).foreach { _ =>
      // the vote relation COVERS every node (symmetrization puts each
      // node on the src side of ≥1 edge), so it IS the next label
      // relation — no per-round rejoin against `nodes` needed.
      //
      // ONE exchange per round, not two: repartitioning the joined
      // votes by src ALONE satisfies the clustering requirement of
      // BOTH aggregates (HashPartitioning(src) clusters (src, nlabel)
      // too), so the (src,nlabel) count and the per-src argmax run
      // back-to-back in the same stage with no second shuffle —
      // probe-measured on the kNN graph, where a round's exchange is
      // pure fixed overhead.  The trade vs letting groupBy(src,nlabel)
      // shuffle itself: the wire carries raw votes (deg(v) rows per
      // node) instead of map-side-combined (node, label) pairs — on a
      // bounded-degree kNN graph those are the same rows, on a skewed
      // general graph a celebrity node's votes land uncombined on one
      // partition, which is when the count aggregate's own combine
      // was worth its extra exchange.  Degree is bounded here by
      // construction (the documented input contract: near-dup pair
      // graphs and kNN graphs, both k-bounded).
      lab = e
        .join(lab.select(col("id").as("dst"), col("label").as("nlabel")), "dst")
        .repartition(col("src"))
        .groupBy(col("src"), col("nlabel")).agg(count(lit(1)).as("c"))
        // argmax by (count, then SMALLEST label): labels are non-negative
        // ids, so max over (c, -label) structs is exactly that order
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("nlabel")).as("neg"))).as("m"))
        .select(col("src").as("id"), (-col("m.neg")).as("label"))
        .localCheckpoint(eager = false)
    }
    lab
  }

  /** Driver entry: community structure of the embedding corpus's kNN
    * graph (same k = 5 edge relation as [[knnPagerank]]) — community
    * sizes, largest first.  Approximate upstream (LSH candidates) →
    * rows-only oracle; the spec pins labelPropagation itself on exact
    * planted graphs.
    */
  def knnCommunities(s: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnJoinEmbeddings(s, dir)
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
    labelPropagation(edges, iters = 4)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
      .limit(50)
  }

  /** Per-node triangle counts over an undirected edge list — the
    * graph-cohesion diagnostic for dedup clusters: a near-dup
    * component whose members form triangles is a genuine clique of
    * copies (every member pairwise-similar), while a triangle-free
    * chain is transitive drift (A~B~C with A̸~C) — exactly the case
    * where "keep one representative per component" quietly drops
    * documents that were never actually similar to the kept one.
    *
    * Degree-oriented enumeration (Suri & Vassilvitskii, WWW'11): each
    * undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher one, wedges are built only from each node's
    * OUT-edges, and a wedge (u→v, u→w) closes iff {v,w} is an edge.
    * Every triangle then has exactly one wedge-center (its
    * minimum-order node), so each is found once — and out-degree under
    * this orientation is O(√m), so wedge volume is Σ outdeg² = O(m^1.5)
    * REGARDLESS of degree skew, where naive wedge-building at a
    * celebrity node of degree d contributes d² alone ("the curse of
    * the last reducer" — the paper's title problem).  All three steps
    * are joins + keyed aggregates with map-side partials; nothing is
    * ever collected.
    *
    * Input: (src, dst) long columns (direction ignored; self-loops
    * dropped).  Output: (id, n_neighbors, n_triangles) — one row per
    * node with ≥1 edge.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // read by the degree aggregate, both orientation joins and the
      // closing join — without the cache the upstream pair pipeline
      // (e.g. the full shingle self-join) would execute per reference
      .persist()
    try {
      val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      // orient by (degree, id) — a TOTAL order, so orientation is
      // deterministic and acyclic; ties in degree break by id
      val withDeg = e
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      val o = withDeg.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      // wedges from out-edges only; v1 < v2 dedupes the unordered
      // out-neighbor pair, and the closing edge is probed in the
      // CANONICAL id-ordered set (orientation order ≠ id order)
      val wedges = o.as("x").join(o.as("y"),
          col("x.u") === col("y.u") && col("x.v") < col("y.v"))
        .select(col("x.u").as("w0"),
          least(col("x.v"), col("y.v")).as("a"),
          greatest(col("x.v"), col("y.v")).as("b"))
      val tris = wedges.join(e, Seq("a", "b"))
      val perNode = tris
        .select(explode(array(col("w0"), col("a"), col("b"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
      deg.join(perNode, Seq("id"), "left")
        .select(col("id"), col("deg").as("n_neighbors"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        // one action materializes everything that reads the cached
        // edge list, so unpersist in the caller's finally is safe
        .localCheckpoint(eager = true)
    } finally { e.unpersist(blocking = false); () }
  }

  /** Driver entry: triangle structure of the exact near-dup pair graph
    * ([[Dedup]]'s ngram-Jaccard pairs — deterministic and
    * SQL-replayable, so unlike the kNN-graph entries this one is
    * oracle-EXACT: DuckDB re-derives the pairs and counts triangles
    * relationally).  One row per document that has a near-dup
    * neighbor: its neighbor count and the triangles through it.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    // reads the materialized pair artifact ([[Dedup.nearDupPairs]]):
    // the triangle pass starts from a FileScan, not a shingle self-join
    val pairs = Dedup.nearDupPairs(s, dir)
      .select(col("d1").as("src"), col("d2").as("dst"))
    triangleCounts(pairs)
      .select(col("id").as("doc_id"), col("n_neighbors"), col("n_triangles"))
      .orderBy(col("doc_id"))
  }

  /** Common-neighbor link prediction over an undirected edge list:
    * for every NON-adjacent pair sharing ≥1 neighbor, the shared-
    * neighbor count and the Jaccard of the two neighborhoods — the
    * "who SHOULD be connected" query (recommendation candidates on a
    * co-purchase graph, missed near-dup candidates on a similarity
    * graph whose components aren't already transitively closed).
    *
    * Scale design: candidate pairs come from wedges (v—c—w), keyed on
    * the center — volume Σ_c deg(c)², the quadratic-in-block-size
    * shape of [[Analytics.entityMatch]], bounded the same way: hub
    * centers with deg > `centerCap` generate no wedges (a shared
    * celebrity neighbor is weak link evidence — the Adamic-Adar
    * rationale — while the blow-up it causes is real).  Degrees in the
    * jaccard denominator stay UNcapped corpus truth.  Everything is
    * keyed joins/aggregates; the existing-edge exclusion is a
    * left-anti join on the canonical pair.
    *
    * Deterministic and SQL-replayable ⇒ oracle-exact (counts are
    * integers; jaccard is one exact int/int IEEE division).
    *
    * `inputCanonical = true` skips the defensive canonicalize+distinct
    * exchange when the caller's edges are already (src < dst, unique) —
    * true for anything produced by a pair-groupBy.
    */
  def linkPredict(edges: DataFrame, centerCap: Int = 64,
      inputCanonical: Boolean = false): DataFrame = {
    val e = (if (inputCanonical)
        edges.select(col("src").cast("long").as("a"),
          col("dst").cast("long").as("b"))
      else edges
        .select(least(col("src").cast("long"), col("dst").cast("long")).as("a"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
      .persist()
    try {
      // degree via a partition-only window on the ONE id-exchange the
      // wedge self-join then reuses (merge hints keep both sides on
      // that exchange — the semDedup discipline); a separate groupBy
      // degree relation + semi join would add three stages for the
      // same answer
      val nb = e.select(col("a").as("id"), col("b").as("nb"))
        .unionAll(e.select(col("b").as("id"), col("a").as("nb")))
        .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("id"))))
        .localCheckpoint(eager = false)
      val centered = nb.filter(col("deg") <= centerCap)
      val cand = centered.as("x").hint("merge")
        .join(centered.as("y").hint("merge"),
          col("x.id") === col("y.id") && col("x.nb") < col("y.nb"))
        .select(col("x.nb").as("d1"), col("y.nb").as("d2"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_common"))
      val deg = nb.select(col("id"), col("deg")).distinct()
      cand
        .join(e, cand("d1") === e("a") && cand("d2") === e("b"), "left_anti")
        .join(deg.select(col("id").as("d1"), col("deg").as("deg1")), Seq("d1"))
        .join(deg.select(col("id").as("d2"), col("deg").as("deg2")), Seq("d2"))
        .select(col("d1"), col("d2"), col("n_common"), col("deg1"), col("deg2"),
          (col("n_common").cast("double") /
            (col("deg1") + col("deg2") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy(col("d1"), col("d2"))
        .localCheckpoint(eager = true)
    } finally { e.unpersist(blocking = false); () }
  }

  /** Driver entry: link prediction on the part CO-PURCHASE graph
    * (parts sharing ≥2 distinct orders — the [[Analytics.basketPairs]]
    * support relation with a min-support floor): predicted pairs are
    * parts NOT co-purchased at support ≥ 2 (a single shared order is
    * below the evidence floor and the pair can still be predicted)
    * whose co-purchase neighborhoods overlap — the classic "customers
    * who bought X also bought" candidate set.  (The near-dup pair graph is the wrong substrate
    * here: its components are near-cliques, so its transitive-missing
    * set is empty by construction.)  Oracle-EXACT: support counts and
    * the wedge/degree arithmetic are all integers.
    */
  def linkPredictParts(s: SparkSession, dir: String): DataFrame =
    linkPredict(coPurchasePairs(s, dir)
      .filter(col("n_ab") >= 2).select(col("src"), col("dst")),
      inputCanonical = true)

  /** Distinct co-order part pairs with their support count — the
    * substrate both graph drivers peel/predict over, materialized once
    * per corpus snapshot ([[graft.sources.Materialize]]): link_predict
    * and graph_kcore otherwise each pay the order-keyed lineitem
    * self-join, the expensive first stage of both queries.  The build
    * lazy-checkpoints the item set so the scan+distinct feeds both
    * self-join sides from ONE exchange (the [[Analytics.basketPairs]]
    * discipline); consumers read the (src, dst, n_ab) parquet.
    *
    * DELTA-MAINTAINED on append (round 14, the 4th substrate): orders
    * PARTITION the pair multiset — every pair lives inside exactly one
    * order — so an appended batch decomposes additively:
    * pairs(old ∪ new) = pairs(old) + pairs(new-only lines within an
    * order) + (old × new-only cross pairs of the TOUCHED orders).  The
    * delta pays the appended lines' self-join plus ONE semi-filtered
    * scan of the prior lines (orders the append touched — no corpus
    * self-join), then merges counts into the prior artifact by
    * integer sum; an (ok, pk) line replayed in the append is stripped
    * by an anti-join so it cannot double-count.  Inherits the
    * [[Dedup.maxAppendFraction]] decline → full rebuild compacts.
    * Value identity vs full — including the cross-order case where an
    * append adds an item to an EXISTING order — is spec-pinned.
    *
    * Round 16 adds TAKEDOWN maintenance ([[coPurchaseDelete]]): the
    * same order-partition algebra inverted to a subtraction, fed by
    * the [[copLinesChunk]] line sidecar since removed files cannot be
    * read back — a GDPR erasure of a user's orders costs the touched
    * orders' pair recompute plus one linear sidecar refresh, never
    * the corpus self-join.
    */
  private[graft] def coPurchasePairs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Materialize.readOrBuildMaintained(s, "copurchase_pairs",
      inputs = Seq(s"$dir/lineitem.parquet"),
      params = Seq("ver" -> "1")) {
      // a full (re)build compacts — pay the line sidecar chunk for the
      // whole snapshot NOW (one linear distinct over two skinny
      // columns), so a later takedown can recover the removed files'
      // lines after the files themselves are gone
      copLinesChunk(s,
        graft.sources.Materialize.listFiles(s, s"$dir/lineitem.parquet"))
      val it = graft.sources.Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint(eager = false)
      it.as("a").join(it.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(count(lit(1)).as("n_ab"))
    } { (prevPairs, prevFiles, deltaFiles) =>
      val M = graft.sources.Materialize
      if (M.totalBytes(s, deltaFiles) >
          Dedup.maxAppendFraction(s) * M.totalBytes(s, prevFiles)) null
      else {
        // the append's own line chunk — the LSM half of the sidecar:
        // each batch covers only its own files, so the append path
        // rewrites nothing corpus-sized and a takedown still finds
        // every file's lines across the chunk set
        copLinesChunk(s, deltaFiles)
        val newIt = graft.sources.Scan.parquet(s, deltaFiles: _*)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint(eager = false)
        // prior lines of only the TOUCHED orders: a semi-filtered
        // linear scan, never the corpus self-join
        val oldIt = graft.sources.Scan.parquet(s, prevFiles: _*)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .join(newIt.select(col("ok")).distinct(), Seq("ok"), "left_semi")
          .localCheckpoint(eager = false)
        val newOnly = newIt.join(oldIt, Seq("ok", "pk"), "left_anti")
          .localCheckpoint(eager = false)
        val within = newOnly.as("a").join(newOnly.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        val cross = oldIt.as("o").join(newOnly.as("n"), col("o.ok") === col("n.ok"))
          .filter(col("o.pk") =!= col("n.pk"))
          .select(least(col("o.pk"), col("n.pk")).as("src"),
            greatest(col("o.pk"), col("n.pk")).as("dst"))
        prevPairs.select(col("src"), col("dst"), col("n_ab"))
          .unionByName(within.unionByName(cross)
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_ab")))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col("n_ab")).as("n_ab"))
      }
    } { (prevPairs, prevStats, removedFiles) =>
      coPurchaseDelete(s, prevPairs, prevStats, removedFiles)
    }

  private def copLinesParams: Seq[(String, String)] = Seq("ver" -> "1")

  /** Per-FILE distinct (order, part) line chunk — the sidecar that
    * makes the co-purchase DELETE algebra computable after the removed
    * files are GONE from disk.  Chunked LSM, zero corpus-sized rewrite
    * on the append path: the full build writes one chunk covering the
    * whole snapshot, each append delta writes one chunk covering only
    * its batch, and a takedown gathers every chunk intersecting the
    * prior snapshot via [[graft.sources.Materialize.readAllWithin]]
    * (a partially-surviving chunk contributes its surviving files'
    * rows).  Rows carry the file BASENAME — unique within one flat
    * dataset directory, the corpus layout contract — so chunk rows
    * compare stably across path requalification.
    */
  private def copLinesChunk(s: SparkSession, files: Seq[String]): DataFrame =
    graft.sources.Materialize.readOrBuild(s, "cop_lines", files, copLinesParams) {
      graft.sources.Scan.parquet(s, files: _*)
        .select(regexp_extract(input_file_name(), "[^/]+$", 0).as("file"),
          col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
    }

  /** Takedown maintenance for the co-purchase substrate — the cheapest
    * delete algebra of the substrate family, because orders PARTITION
    * the pair multiset (SURVEY §4): every pair lives inside exactly
    * one order, so the additive append decomposition inverts to a
    * SUBTRACTIVE one.  pairs(survivors) = pairs(prior) −
    * [pairs(prior lines of TOUCHED orders) − pairs(surviving lines of
    * touched orders)], where touched orders are those with ≥ 1 line in
    * a removed file.  The removed files cannot be read, so their lines
    * come from the [[copLinesChunk]] sidecar; the surviving lines of
    * touched orders are one semi-filtered linear scan (the append
    * delta's discipline); both pair recomputes self-join ONLY the
    * touched orders' lines (volume Σ k² over touched orders, never
    * the corpus); and the merge is one integer subtraction against
    * the prior artifact, dropping pairs that hit zero.  A line whose
    * (ok, pk) also survives in another file subtracts nothing — the
    * prior/current sets are both DISTINCT line sets, so replay
    * duplication cancels by construction.  Deliberately NO survivor
    * sidecar refresh: [[graft.sources.Materialize.readAllWithin]]'s
    * partial-validity semantics keep the existing chunks aligned for
    * every later maintenance step (a removed file simply drops out of
    * the valid subset), so unlike the knn/neardup deletes this path
    * carries no corpus-sized linear term at all — the work is the
    * chunk-union filter, the touched orders' scans and self-joins,
    * and the artifact merge.
    *
    * Declines (→ full rebuild, which compacts — re-seeding the chunk
    * LSM): removed bytes exceed the [[Dedup.MaxAppendFraction]]
    * fraction of the prior corpus (by the manifest's recorded lengths
    * — removed files cannot be live-stat'ed), or the chunk set does
    * not cover every removed file (chunks reaped by gc, or by a
    * compliance purge — [[graft.sources.Materialize.purgeContaining]]
    * drops any chunk that listed a removed file, so the takedown
    * AFTER a purge full-builds once and is incremental again).
    */
  private def coPurchaseDelete(s: SparkSession, prevPairs: DataFrame,
      prevStats: Map[String, String], removedFiles: Seq[String]): DataFrame = {
    val M = graft.sources.Materialize
    val removedBytes = removedFiles.map(f => M.statLen(prevStats(f))).sum
    if (removedBytes >
        Dedup.maxAppendFraction(s) * prevStats.values.map(M.statLen).sum)
      return null
    val chunks = M.readAllWithin(s, "cop_lines", prevStats, copLinesParams)
    def base(f: String) = f.substring(f.lastIndexOf('/') + 1)
    val removedNames = removedFiles.map(base).toSet
    val covered = chunks.flatMap(_._2).map(base).toSet
    if (!removedNames.subsetOf(covered)) return null
    val removedLines = chunks.flatMap { case (df, valid) =>
        val names = (valid.map(base).toSet & removedNames).toSeq.sorted
        if (names.isEmpty) None
        else Some(df.filter(col("file").isin(names: _*))
          .select(col("ok"), col("pk")))
      }
      .reduce(_ unionByName _)
      .distinct()
      .localCheckpoint(eager = false)
    val touched = removedLines.select(col("ok")).distinct()
    val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
    // surviving lines of the touched orders: SEMI-FILTER BEFORE the
    // distinct, so the scan stays linear and the dedup exchange
    // carries only the touched orders' lines — a distinct-then-filter
    // order would shuffle the whole corpus and cost the full build's
    // first stage (measured: delete ≈ full at sf1 before this)
    val curTouched = graft.sources.Scan.parquet(s, survivors: _*)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .join(touched, Seq("ok"), "left_semi")
      .distinct()
      .localCheckpoint(eager = false)
    val priorTouched = curTouched.unionByName(removedLines).distinct()
    def orderPairs(lines: DataFrame) =
      lines.as("a").join(lines.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(count(lit(1)).as("n"))
    // curTouched ⊆ priorTouched per order ⇒ every add key is a sub key
    // with n_add ≤ n_sub, so a left join suffices and n_dec ≥ 0
    val dec = orderPairs(priorTouched).withColumnRenamed("n", "n_sub")
      .join(orderPairs(curTouched).withColumnRenamed("n", "n_add"),
        Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        (col("n_sub") - coalesce(col("n_add"), lit(0L))).as("n_dec"))
      .filter(col("n_dec") > 0)
    prevPairs.join(dec, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        (col("n_ab") - coalesce(col("n_dec"), lit(0L))).as("n_ab"))
      .filter(col("n_ab") > 0)
  }

  /** k-core of an undirected edge list: the maximal subgraph where
    * every node keeps ≥ k neighbors — the standard "dense cohesive
    * region" extractor (for dedup graphs: the clusters that are
    * genuinely clique-like rather than chains; for kNN graphs: the
    * high-confidence manifold regions).  Computed by synchronous
    * peeling: drop all nodes with degree < k, recompute, repeat to
    * fixpoint.  Output: (id, core_deg) per surviving node — degree
    * WITHIN the core.
    *
    * Scale shape: each round is one keyed degree aggregate + two
    * left-semi joins (edges whose BOTH endpoints survive), then an
    * eager localCheckpoint so round r+1 reads materialized blocks, not
    * r's lineage (the [[pageRank]] iteration discipline); superseded
    * checkpoints unpersist as soon as their successor is materialized.
    * Peeling strictly shrinks the edge set, so rounds ≤ peel depth —
    * single digits on real graphs; the loop runs to TRUE fixpoint
    * (driver-side count compare), no semantic iteration cap.
    * Iterative fixpoint ⇒ no SQL image ⇒ rows-only; the spec pins a
    * sequential peel replay and planted clique/chain graphs.
    */
  def kCore(edges: DataFrame, k: Int = 3,
      inputCanonical: Boolean = false): DataFrame = {
    var cur = (if (inputCanonical)
        edges.select(col("src").cast("long").as("a"),
          col("dst").cast("long").as("b"))
      else edges
        .select(least(col("src").cast("long"), col("dst").cast("long")).as("a"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
      .localCheckpoint(eager = true)
    try {
      var n = cur.count()
      var stable = n == 0
      while (!stable) {
        val deg = cur.select(col("a").as("id")).unionAll(cur.select(col("b").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        val keep = deg.filter(col("deg") >= k).select(col("id"))
        val nxt = cur
          .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
          .localCheckpoint(eager = true)
        val m = nxt.count()
        // nxt is materialized (eager) — the superseded round's blocks
        // release NOW, so peak block-manager footprint is two rounds'
        // edges, not the whole peel history
        cur.unpersist(blocking = false)
        cur = nxt
        stable = m == n
        n = m
      }
      cur.select(col("a").as("id")).unionAll(cur.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
        .orderBy(col("id"))
        .localCheckpoint(eager = true)
    } finally {
      cur.unpersist(blocking = false); ()
    }
  }

  /** Driver entry: 64-core of the part co-purchase graph (distinct
    * co-order pairs, no support floor — the dense substrate; the kNN
    * graph's core structure is a step function 5-core=all/6-core=∅,
    * and the near-dup graph is tiny cliques, so neither actually
    * peels).  k = 64 sits in the measured transition band at every
    * test SF (sf0.001: 189/200 parts survive in 3 rounds; sf0.01:
    * 1993/2000 in 2; sf0.1: 19872/20000 in 3), so the fixpoint loop,
    * the cascade, and the core-degree recount all exercise for real.
    * Iterative fixpoint ⇒ rows-only; the spec pins a sequential peel
    * replay plus planted clique/chain graphs.
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    kCore(coPurchasePairs(s, dir).select(col("src"), col("dst")), k = 64,
        inputCanonical = true)
      .select(col("id").as("p_partkey"), col("core_deg"))

  /** Degree distribution of the co-purchase graph in power-of-two
    * buckets — the shape report that decides every downstream graph
    * plan (is there a hub that needs salting?  how heavy is the
    * tail?), and the first thing to diff when a crawl lands.  Bucket
    * = ⌊log₂ deg⌋ computed EXACTLY via the binary string length
    * (`length(bin(deg)) − 1` — a float log2 of a power of two can
    * land at 2.9999… and floor wrong; both engines' bin() is exact).
    * Rides the materialized pair substrate: one FileScan, one degree
    * aggregate keyed on the node id, then a ≤64-bucket aggregate —
    * nothing corpus-sized after the first groupBy.
    */
  def graphDegreeHist(s: SparkSession, dir: String): DataFrame = {
    val pairs = coPurchasePairs(s, dir)
    val deg = pairs.select(col("src").as("id"))
      .unionAll(pairs.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    deg.groupBy((length(bin(col("deg"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("sum_deg"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy(col("bucket"))
  }

  /** Support distribution of the co-purchase graph in power-of-two
    * buckets — [[graphDegreeHist]]'s twin over EDGE WEIGHT instead of
    * node degree: how heavy is the co-occurrence tail, and is there a
    * staple pair whose support dwarfs the rest (the skew signal for
    * any support-floored consumer like link_predict).  Bucket =
    * ⌊log₂ n_ab⌋ via the exact `bin()` length; rides the materialized
    * pair substrate — one FileScan, one ≤64-bucket aggregate, nothing
    * corpus-sized at all.
    */
  def pairSupportHist(s: SparkSession, dir: String): DataFrame =
    coPurchasePairs(s, dir)
      .groupBy((length(bin(col("n_ab"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("n_ab")).as("sum_support"),
        min(col("n_ab")).as("min_support"), max(col("n_ab")).as("max_support"))
      .orderBy(col("bucket"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_pagerank" -> (knnPagerank _),
    "knn_communities" -> (knnCommunities _),
    "link_predict" -> (linkPredictParts _),
    "graph_kcore" -> (graphKcore _),
    "graph_degree_hist" -> (graphDegreeHist _),
    "pair_support_hist" -> (pairSupportHist _),
    "graph_triangles" -> (graphTriangles _))

  /** graph_kcore oracle: the synchronous peel UNROLLED to a fixed
    * horizon of 16 rounds — peeling is idempotent at fixpoint (a
    * no-change round reproduces its input), so the unrolled SQL
    * equals the true-fixpoint Spark result whenever the actual peel
    * depth ≤ 16 (measured: 3/2/3 rounds at sf0.001/0.01/0.1 for
    * k = 64 — the horizon is 5× the deepest measured peel, so a gate
    * mismatch from a too-shallow oracle would need a corpus shaped
    * unlike anything observed; if it ever happens it shows up as an
    * honest gate row mismatch, not a silent wrong answer).  This
    * upgrades an iterative operator from rows-only to oracle-CHECKED
    * without pretending SQL can express a fixpoint.
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val head =
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.pk AS a, b.pk AS b
        |       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2),
        |""".stripMargin
    val body = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM
         |  (SELECT a AS id FROM e$i UNION ALL SELECT b FROM e$i) GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $k),
         |e${i + 1} AS MATERIALIZED (SELECT e$i.a, e$i.b FROM e$i
         |  JOIN k$i ka ON e$i.a = ka.id JOIN k$i kb ON e$i.b = kb.id),
         |""".stripMargin
    }.mkString
    val tail =
      s"""fin AS (SELECT a AS id FROM e$rounds UNION ALL SELECT b FROM e$rounds)
         |SELECT id AS p_partkey, COUNT(*) AS core_deg
         |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
    head + body + tail
  }

  /** graph_triangles replays the exact pair graph (the
    * dedup_ngram_jaccard CTE) and counts triangles with a canonical
    * 3-way join: for x < y < z all of (x,y), (y,z), (x,z) are in the
    * id-ordered pair set, found once via a.d2 = b.d1 chaining.
    */
  def oracleSql: Map[String, String] = Map(
    "graph_kcore" -> kcoreOracle(64, 16),
    // support histogram over the same DISTINCT-line pair relation;
    // bin() is exact on both engines (the graph_degree_hist trap note)
    "pair_support_hist" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS n_ab
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2)
        |SELECT CAST(length(bin(n_ab)) - 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_pairs, CAST(SUM(n_ab) AS BIGINT) AS sum_support,
        |  CAST(MIN(n_ab) AS BIGINT) AS min_support,
        |  CAST(MAX(n_ab) AS BIGINT) AS max_support
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // degree = neighbor count over the same DISTINCT-line pair graph;
    // bin() is exact on both engines, so the log2 bucket is integer
    "graph_degree_hist" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT a.pk AS src, b.pk AS dst
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        |d AS (SELECT id, COUNT(*) AS deg FROM
        |  (SELECT src AS id FROM p UNION ALL SELECT dst FROM p) GROUP BY 1)
        |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_nodes, CAST(SUM(deg) AS BIGINT) AS sum_deg,
        |  CAST(MIN(deg) AS BIGINT) AS min_deg, CAST(MAX(deg) AS BIGINT) AS max_deg
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // co-purchase support relation (the basket_pairs CTE with a ≥2
    // floor); wedges through ≤64-degree centers, minus existing edges,
    // joined back to UNcapped degrees
    "link_predict" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p0 AS (SELECT a.pk AS d1, b.pk AS d2, COUNT(*) AS n_ab
        |       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2),
        |p AS (SELECT d1, d2 FROM p0 WHERE n_ab >= 2),
        |nb AS (SELECT d1 AS id, d2 AS nb FROM p UNION ALL SELECT d2, d1 FROM p),
        |deg AS (SELECT id, COUNT(*) AS deg FROM nb GROUP BY 1),
        |ctr AS (SELECT nb.id, nb.nb FROM nb JOIN deg USING (id) WHERE deg <= 64),
        |cand AS (SELECT x.nb AS d1, y.nb AS d2, COUNT(*) AS n_common
        |         FROM ctr x JOIN ctr y ON x.id = y.id AND x.nb < y.nb
        |         GROUP BY 1, 2),
        |pred AS (SELECT * FROM cand WHERE NOT EXISTS
        |           (SELECT 1 FROM p WHERE p.d1 = cand.d1 AND p.d2 = cand.d2))
        |SELECT pred.d1, pred.d2, n_common, ga.deg AS deg1, gb.deg AS deg2,
        |  CAST(n_common AS DOUBLE)
        |    / CAST(ga.deg + gb.deg - n_common AS DOUBLE) AS jaccard
        |FROM pred JOIN deg ga ON pred.d1 = ga.id
        |          JOIN deg gb ON pred.d2 = gb.id
        |ORDER BY pred.d1, pred.d2""".stripMargin,
    "graph_triangles" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
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
        |tri AS (SELECT a.d1 AS x, a.d2 AS y, b.d2 AS z
        |        FROM p a JOIN p b ON a.d2 = b.d1 JOIN p c ON a.d1 = c.d1 AND b.d2 = c.d2),
        |deg AS (SELECT id, COUNT(*) AS n_neighbors FROM
        |          (SELECT d1 AS id FROM p UNION ALL SELECT d2 FROM p) GROUP BY id),
        |tn AS (SELECT id, COUNT(*) AS n_tri FROM
        |         (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |       GROUP BY id)
        |SELECT deg.id AS doc_id, deg.n_neighbors,
        |  COALESCE(tn.n_tri, 0) AS n_triangles
        |FROM deg LEFT JOIN tn ON deg.id = tn.id
        |ORDER BY doc_id""".stripMargin)
}
