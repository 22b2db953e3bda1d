package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_pagerank" -> (knnPagerank _),
    "knn_communities" -> (knnCommunities _))

  def oracleSql: Map[String, String] = Map()
}
