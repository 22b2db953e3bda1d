package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Double-precision replay of the operator's iteration (the decimal
    * accumulation differs from this by ≤ ulps per op; 1e-9 absolute
    * covers 8 iterations with wide margin on unit-mass ranks).
    */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
      damping: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    val n = nodes.length
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val inflow = edges
        .map { case (s, d) => d -> rank(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rank = nodes.map(id =>
        id -> ((1.0 - damping) / n + damping * inflow.getOrElse(id, 0.0))).toMap
    }
    rank
  }

  test("pagerank matches a double replay on a star graph; n_in is the in-degree") {
    import spark.implicits._
    // leaves 1,2,3 -> hub 0; hub -> 1
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val ref = refRanks(edges, 8, 0.85)
    assert(got.keySet === ref.keySet)
    ref.foreach { case (id, r) =>
      assert(math.abs(got(id)._1 - r) < 1e-9, s"rank of $id")
    }
    assert(got(0L)._2 === 3L)
    assert(got(1L)._2 === 1L)
    assert(got(2L)._2 === 0L)
    // the 0↔1 cycle concentrates mass; leaves 2,3 decay to the base
    assert(got(0L)._1 > got(2L)._1 && got(1L)._1 > got(2L)._1)
    assert(got(2L)._1 === got(3L)._1)
  }

  test("dangling redistribution conserves total mass 1 on a planted sink graph") {
    import spark.implicits._
    // 3 is a pure sink (out-degree 0): 0->1, 0->3, 1->3, 2->0
    val edges = Seq((0L, 1L), (0L, 3L), (1L, 3L), (2L, 0L))
    // default: the sink leaks its mass every round — Σ < 1, the
    // documented honest signature
    val leaky = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 8)
      .collect().map(_.getDouble(1))
    assert(leaky.sum < 0.9, s"expected visible leak, got ${leaky.sum}")
    // with redistribution: Σrank ≈ 1 (exact up to one scale-18 HALF_UP
    // per node per round — 1e-12 is orders of magnitude of headroom)
    val kept = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 8,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(kept.values.sum - 1.0) < 1e-12, s"sum=${kept.values.sum}")
    // the sink holds the most mass (everything flows into 3), and the
    // double replay with the same correction agrees
    assert(kept(3L) === kept.values.max)
    def ref(iters: Int): Map[Long, Double] = {
      val nodes = Seq(0L, 1L, 2L, 3L)
      val outdeg = Map(0L -> 2, 1L -> 1, 2L -> 1)
      var rank = nodes.map(_ -> 0.25).toMap
      (1 to iters).foreach { _ =>
        val inflow = Map(
          1L -> rank(0L) / 2, 3L -> (rank(0L) / 2 + rank(1L)), 0L -> rank(2L))
        val dm = rank(3L) / 4
        rank = nodes.map(id =>
          id -> (0.15 / 4 + 0.85 * (inflow.getOrElse(id, 0.0) + dm))).toMap
      }
      rank
    }
    val expect = ref(8)
    expect.foreach { case (id, r) =>
      assert(math.abs(kept(id) - r) < 1e-9, s"rank of $id")
    }
    // no dangling nodes → flag is a no-op bit-for-bit
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val a = GraphOps.pageRank(cyc.toDF("src", "dst"), iters = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = GraphOps.pageRank(cyc.toDF("src", "dst"), iters = 4,
        redistributeDangling = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("symmetric cycle converges to exactly 1/n per node; total mass 1") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val ranks = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 8)
      .collect().map(r => r.getDouble(1))
    assert(ranks.length === 3)
    ranks.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-15))
    assert(math.abs(ranks.sum - 1.0) < 1e-12)
  }

  test("dangling node leaks mass (documented): total rank < 1, replay agrees") {
    import spark.implicits._
    val edges = Seq((10L, 20L)) // 20 has out-degree 0
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = refRanks(edges, 8, 0.85)
    assert(got.values.sum < 1.0)
    ref.foreach { case (id, r) => assert(math.abs(got(id) - r) < 1e-9) }
  }

  test("ranks are bit-identical across input partitionings (decimal claim)") {
    import spark.implicits._
    // irregular graph so unequal ranks actually exercise the sums
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L),
      (3L, 2L), (4L, 3L), (2L, 4L))
    def run(parts: Int) =
      GraphOps.pageRank(edges.toDF("src", "dst").repartition(parts), iters = 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val a = run(1)
    val b = run(7)
    assert(a.zip(b).forall { case ((i, x), (j, y)) =>
      i == j && java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    }, "decimal accumulation must make ranks partitioning-invariant")
  }

  test("label propagation resolves two planted cliques across a bridge, deterministically") {
    import spark.implicits._
    // K4 on {0..3} and K4 on {10..13}, one bridge 3–10 (directed input;
    // the operator symmetrizes)
    def k4(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (k4(Seq(0L, 1L, 2L, 3L)) ++ k4(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
    Seq(0L, 1L, 2L, 3L).foreach(id => assert(got(id) === 0L, s"node $id"))
    Seq(10L, 11L, 12L, 13L).foreach(id => assert(got(id) === 10L, s"node $id"))
    // partitioning-invariant (synchronous rounds, deterministic argmax)
    val again = GraphOps.labelPropagation(edges.toDF("src", "dst").repartition(7), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
    // self-loops are dropped, not voted
    val self = GraphOps.labelPropagation(
      (edges :+ (5L, 5L)).toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0)).toSet
    assert(!self.contains(5L))
  }

  test("knn_communities covers the corpus with multiple communities, largest first") {
    val rows = GraphOps.knnCommunities(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val sizes = rows.map(_.getAs[Long]("n_members"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
    assert(sizes.forall(_ > 0))
    assert(rows.length > 1, "kNN graph should not collapse to one community")
  }

  test("knn_pagerank returns top-50 hubs in rank order on the corpus") {
    val rows = GraphOps.knnPagerank(spark, sf).collect()
    assert(rows.length === 50)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(ranks.forall(_ > 0.0))
  }

  private def triMap(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("triangle counts on planted shapes: triangle, square, K4, star") {
    // single triangle: every node in exactly 1
    assert(triMap(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ===
      Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L))))
    // 4-cycle: wedges exist but never close
    assert(triMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
      .values.forall(_ == ((2L, 0L))))
    // K4: 4 triangles total, each node in C(3,2) = 3 of them
    assert(triMap(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) ===
      Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)), 4L -> ((3L, 3L))))
    // star: the degree-skew case the orientation exists for — hub has
    // high degree but zero out-wedges (all edges orient leaf -> hub)
    assert(triMap(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))) ===
      Map(0L -> ((4L, 0L)), 1L -> ((1L, 0L)), 2L -> ((1L, 0L)),
        3L -> ((1L, 0L)), 4L -> ((1L, 0L))))
  }

  test("triangle counts agree with a brute-force replay on a random graph; input form is irrelevant") {
    // deterministic pseudo-random graph: ~120 edges over 40 nodes
    val edges = (for (a <- 0L until 40L; b <- (a + 1) until 40L
      if ((a * 2654435761L + b * 40503L) % 13) == 0L) yield (a, b)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val refTri = nodes.map { u =>
      u -> adj(u).toSeq.combinations(2).count {
        case Seq(v, w) => adj(v).contains(w); case _ => false }.toLong
    }.toMap
    // direction + duplicates + self-loops must not change the counts
    val noisy = edges ++ edges.map(_.swap) ++ Seq((7L, 7L))
    val got = triMap(noisy)
    assert(got.keySet === nodes.toSet)
    nodes.foreach { u =>
      assert(got(u)._1 === adj(u).size.toLong, s"degree of $u")
      assert(got(u)._2 === refTri(u), s"triangles through $u")
    }
  }

  test("kCore: planted clique+chain peels exactly; core degrees are within-core") {
    import spark.implicits._
    // 4-clique {0,1,2,3} with a pendant chain 3-4-5: the 3-core is the
    // clique alone, and peeling must CASCADE (5 drops, then 4)
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val edges = (clique ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    val got3 = GraphOps.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k=2: chain end 5 drops (deg 1), then 4 (deg 1 after cascade)
    val got2 = GraphOps.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k above the clique degree: empty core
    assert(GraphOps.kCore(edges, k = 4).collect().isEmpty)
  }

  test("graph_kcore driver entry matches a sequential peel replay of the co-purchase graph") {
    val it = graft.sources.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
        org.apache.spark.sql.functions.col("l_partkey").as("pk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    it.groupBy(_._1).values.foreach { parts =>
      val ps = parts.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
    }
    var changed = true
    while (changed) {
      changed = false
      adj.filter(_._2.size < 64).keys.toSeq.foreach { x =>
        adj(x).foreach(m => adj(m) -= x)
        adj -= x; changed = true
      }
    }
    val want = adj.map { case (id, s) => id -> s.size.toLong }.toMap
    val got = GraphOps.graphKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty && got.size < 200, "the 64-core actually peeled something")
  }

  test("linkPredict: planted path predicts exactly the distance-2 pairs; hub cap suppresses wedges") {
    import spark.implicits._
    // path 0-1-2-3: predictions are (0,2) via 1 and (1,3) via 2
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.linkPredict(path).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set((0L, 2L), (1L, 3L)))
    // (0,2): common={1}, deg(0)=1, deg(2)=2 → jaccard 1/2
    assert(got((0L, 2L)) === ((1L, 1L, 2L, 0.5)))
    // a star hub above the cap generates NO wedges: no predictions
    val star = (1L to 70L).map(i => (0L, i)).toDF("src", "dst")
    assert(GraphOps.linkPredict(star, centerCap = 64).collect().isEmpty)
    // same star under a generous cap: all leaf pairs predicted
    val small = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(GraphOps.linkPredict(small).collect().length === 10)
  }

  test("graph_triangles driver entry: canonical node set, triangles bounded by wedges") {
    val rows = GraphOps.graphTriangles(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "ordered by doc_id")
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      assert(deg >= 1)
      assert(tri <= deg * (deg - 1) / 2, s"triangles through ${r.getLong(0)} exceed wedge bound")
    }
  }

  test("graph_degree_hist: buckets partition the degree domain and conserve the edge count") {
    import org.apache.spark.sql.functions._
    val hist = GraphOps.graphDegreeHist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(hist.nonEmpty)
    val pairs = GraphOps.coPurchasePairs(spark, sf)
    val nEdges = pairs.count()
    val nNodes = pairs.select(col("src").as("id"))
      .unionByName(pairs.select(col("dst").as("id"))).distinct().count()
    // handshake: every edge contributes 2 to total degree
    assert(hist.map(_._3).sum === 2 * nEdges)
    assert(hist.map(_._2).sum === nNodes)
    hist.foreach { case (b, n, _, lo, hi) =>
      assert(n >= 1)
      // bucket b holds exactly the degrees in [2^b, 2^(b+1))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)), s"bucket $b: [$lo, $hi]")
    }
    assert(hist.map(_._1).toSeq === hist.map(_._1).toSeq.sorted)
  }

  test("pair_support_hist: buckets partition the support domain and conserve the pair mass") {
    import org.apache.spark.sql.functions._
    val hist = GraphOps.pairSupportHist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(hist.nonEmpty)
    val supports = GraphOps.coPurchasePairs(spark, sf)
      .select(col("n_ab")).collect().map(_.getLong(0))
    assert(hist.map(_._2).sum === supports.length.toLong, "every pair lands in one bucket")
    assert(hist.map(_._3).sum === supports.sum, "total support mass conserves")
    // exact-log2 replay: bucket of n = 63 - nlz(n), the bin()-length form
    val want = supports.groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, xs) => (b.toLong, xs.length.toLong, xs.sum, xs.min, xs.max) }
      .toSeq.sortBy(_._1)
    assert(hist.toSeq === want)
  }
}
