package graft

import org.apache.spark.sql.functions.{col, count, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Pins the 100 TB plan-shape claims of SURVEY §4: pushdown reaches the
  * scan, small sides broadcast, shared pipelines reuse one exchange,
  * scan-only operators don't shuffle.  A regression here is a scale
  * bug even when values stay correct.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countIn(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("sample_stratified is scan-filter only (one presentation-sort exchange)") {
    val p = plan(EventOps.sampleStratified(spark, sf))
    assert(countIn(p, "Exchange") <= 1, p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("PushedFilters"))
  }

  test("q17 broadcasts the brand key set on both the aggregate and probe sides") {
    val p = plan(Relational.q17SmallQty(spark, sf))
    assert(countIn(p, "BroadcastExchange") >= 1)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
  }

  test("q18 probes with the filtered aggregate, never a second lineitem scan per join") {
    val p = plan(Relational.q18LargeOrders(spark, sf))
    // exactly one lineitem scan feeds the per-order aggregate
    assert(countIn(p, "lineitem") >= 1)
    assert(countIn(p, "TakeOrderedAndProject") === 1)
  }

  test("ngram jaccard BUILD self-join reads one shared shingle exchange") {
    // the claim moved to the artifact builder in round 12: the driver
    // query reads the materialized pair graph (pinned in
    // MaterializeSpec), and the build pipeline underneath it keeps the
    // one-shingle-exchange discipline.  Exchange reuse is an AQE
    // runtime decision (the merge hint keeps the self-join in SMJ form
    // so it can happen at any data size): execute, then assert on the
    // final adaptive plan
    val df = Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, sf), 128)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("ReusedExchange"), p.linesIterator.take(20).mkString("\n"))
  }

  test("pairs-from-index BUILD reads the index artifact, never replays the shingle pipeline") {
    // round 13: the artifact build path is index-first — the pair
    // self-join's two sides are FileScans of the materialized index,
    // so the tokenize→shingle→explode pipeline runs exactly once (in
    // the index build), not once per pair-build side
    val cache = java.nio.file.Files.createTempDirectory("graft_plan_idx").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    try {
      val idx = Dedup.nearDupIndex(spark, sf) // materialize the index
      val p = plan({
        val sz = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        idx.as("a").join(idx.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("c"))
          .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      })
      assert(p.contains("neardup_index"), p.linesIterator.take(8).mkString("\n"))
      assert(!p.contains("Generate"), "pair build must not replay the shingle explode")
    } finally spark.conf.unset("spark.graft.cache.dir")
  }

  test("ann_bruteforce rides the annix_exact FileScan; inline body broadcasts the query side") {
    // r18: the driver entry consumes the materialized exact top-k —
    // no corpus scan, no broadcast join, just the |Q|·k artifact leaf
    // plus the deterministic re-rank aggregate
    val p = plan(Similarity.annBruteforce(spark, sf))
    assert(p.contains("annix_exact"),
      p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    assert(!p.contains("embeddings.parquet"),
      "artifact consumer must not rescan the corpus")
    // the cold-build body keeps the r17 shape: query side broadcast,
    // corpus scanned once, no corpus shuffle before the top-k
    val pi = plan(Similarity.annBruteforceInline(spark, sf))
    assert(pi.contains("BroadcastExchange"))
    assert(pi.contains("BroadcastNestedLoopJoin") || pi.contains("BroadcastHashJoin"))
  }

  test("text_commonness broadcasts the vocabulary") {
    val p = plan(TextOps.textCommonness(spark, sf))
    assert(p.contains("BroadcastExchange"))
  }

  test("q22 broadcasts the 1-row scalar aggregate and anti-joins orders") {
    val p = plan(Relational.q22NoOrders(spark, sf))
    assert(p.contains("BroadcastExchange"))
    assert(p.contains("LeftAnti"))
  }

  test("q4 decorrelates EXISTS to one semi join with date filters pushed to the orders scan") {
    val p = plan(Relational.q4OrderPriority(spark, sf))
    assert(p.contains("LeftSemi"), p.linesIterator.take(15).mkString("\n"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "date filter must reach the scan")
  }

  test("q21 decorrelates the EXISTS + NOT EXISTS chain to one semi and one anti join") {
    val p = plan(Relational.q21Waiting(spark, sf))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      p.linesIterator.take(20).mkString("\n"))
    // the final ordering stays map-side bounded
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q15 broadcasts the 1-row scalar max back onto the shared revenue view") {
    val df = Relational.q15TopSupplier(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("BroadcastExchange"))
    // the revenue view's shuffle executes once — the scalar-max branch
    // reads the same exchange (AQE runtime reuse)
    assert(p.contains("ReusedExchange"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q19 pushes per-side OR implications into BOTH scans") {
    val p = plan(Relational.q19Disjunctive(spark, sf))
    // quantity-range union reaches the lineitem scan, brand/size union
    // reaches the part scan — without these the disjunction would scan
    // both tables in full at 100 TB
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"), "lineitem side pushdown missing")
    assert(p.contains("= Brand#12)"), "part side predicate missing below the join")
  }

  test("q10 ranks in decimal via TakeOrderedAndProject, nation broadcast") {
    val p = plan(Relational.q10Returned(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastExchange"))
  }

  test("top_terms keeps the limit map-side (TakeOrderedAndProject)") {
    val p = plan(TextOps.topTerms(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q8 pushes the part-type filter to the scan and broadcasts every dimension hop") {
    val p = plan(Relational.q8MarketShare(spark, sf))
    assert(p.contains("EqualTo(p_type,ECONOMY)"), "p_type filter must reach the part scan")
    // part, customer-nation(+region), supplier, supplier-nation all broadcast
    assert(countIn(p, "BroadcastExchange") >= 4, p.linesIterator.take(20).mkString("\n"))
  }

  test("q12 pushes the returnflag IN-list and date window to the lineitem scan") {
    val p = plan(Relational.q12ShipClass(spark, sf))
    // (plan toString truncates scan metadata at 100 chars — match the
    // pushed-filter prefix)
    assert(p.contains("In(l_returnflag"), "IN-list must reach the scan")
    assert(p.contains("IsNotNull(l_shipdate)"))
  }

  test("pack_stats aggregates without any window or corpus-wide row numbering") {
    val p = plan(Pipeline.packStats(spark, sf))
    assert(!p.contains("Window"), p)
  }

  test("pii_scrub is scan-project only (one presentation-sort exchange)") {
    val p = plan(TextOps.piiScrub(spark, sf))
    assert(countIn(p, "Exchange") <= 1, p)
    assert(p.contains("PushedFilters"))
  }

  test("dedup_incremental reuses the side-tagged shingle exchange across its consumers") {
    val df = Dedup.dedupIncrementalEntry(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("ReusedExchange"), p.linesIterator.take(20).mkString("\n"))
  }

  test("q2 decorrelates min-cost with broadcast dim hops and a map-side top-100") {
    val p = plan(Relational.q2MinCost(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countIn(p, "BroadcastExchange") >= 2, p)
  }

  test("q9 broadcasts every dimension around the composite-key partsupp join") {
    val p = plan(Relational.q9Profit(spark, sf))
    assert(countIn(p, "BroadcastExchange") >= 3, p)
    // the partsupp derivation dedups only the queried slice: the
    // part-key semi join must sit BELOW the distinct's aggregate
    assert(countIn(p, "LeftSemi") >= 1, p)
  }

  test("event_transitions shuffles once on user_id, then only the bounded-key aggregate") {
    val p = plan(EventOps.eventTransitions(spark, sf))
    // window exchange on user_id + aggregate exchange on the pair key +
    // presentation sort — nothing else (no join, no extra repartition)
    assert(!p.contains("Join"), p.linesIterator.take(12).mkString("\n"))
    assert(countIn(p, "Exchange") <= 3)
  }

  test("lm_score scans the corpus once (type rows checkpoint; consumers must not re-scan)") {
    val df = TextOps.lmScoreDocs(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans === 1, s"lm_score re-ran the bigram pipeline: $scans scans")
  }

  test("shuffle_shards and split_assign scan once and prune to the columns they use") {
    val sh = Pipeline.shuffleShardsDocs(spark, sf)
    sh.collect()
    val pSh = sh.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(pSh).size === 1)
    assert(pSh.contains("ReadSchema: struct<doc_id:bigint>"), "shard shuffle must not read text")
    val sp = Pipeline.splitAssignDocs(spark, sf)
    sp.collect()
    val pSp = sp.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(pSp).size === 1)
    // map-side assignment + one bounded-key aggregate + presentation
    // sort — membership itself must add no exchange (count the FINAL
    // adaptive plan only; the formatted dump appends the pre-AQE
    // Initial Plan with its own node ids)
    val finalPlan = pSp.split("== Initial Plan ==").head
    val exIds = """\((\d+)\) Exchange""".r.findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(exIds.size <= 2, finalPlan.linesIterator.take(15).mkString("\n"))
  }

  test("knn_join BUILD exchanges bucket keys only; vectors rejoin by id; top-k is map-side partial") {
    // round 12: the driver query reads the materialized kNN edge
    // artifact (pinned in MaterializeSpec); the plan claims belong to
    // the BUILD pipeline underneath it
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val p = Similarity.knnJoin(emb, emb, 5,
        Similarity.lshBitsFor(Similarity.corpusSize(spark, sf)))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the two bucket-join exchanges carry exactly (id, tbl, bucket) —
    // the 64-double embedding arrays must never ride the bucket
    // exchange (24 B/row vs 512 B/row is the operator's core trade)
    val exchanges = """\(\d+\) Exchange\nInput \[(\d+)\][^\n]*\nArguments: hashpartitioning\(([a-z_]+)#"""
      .r.findAllMatchIn(p).map(m => (m.group(2), m.group(1).toInt)).toSeq
    val bucketEx = exchanges.filter(_._1 == "tbl")
    assert(bucketEx.length === 2, s"expected 2 bucket exchanges, got $exchanges")
    assert(bucketEx.forall(_._2 == 3), s"bucket exchange grew past its 3 key columns: $bucketEx")
    // candidate dedupe exchanges the bare 16 B pair key (Catalyst
    // prunes the diagnostic hits count when unused)
    assert(exchanges.exists { case (k, w) => k == "lid" && w == 2 })
    // winners-only shuffle: the top-k aggregate combines map-side
    assert(p.contains("partial_top_k_scored"), "top-k lost its partial (map-side) phase")
  }

  test("diversity_sample selects via the map-side partial top-k, centroids broadcast") {
    val p = plan(Similarity.diversitySampleEmbeddings(spark, sf))
    // the selection must combine per-cluster winners BEFORE the cid
    // shuffle — a window/rank formulation would funnel every cluster's
    // full membership through one task per cid
    assert(p.contains("partial_top_k_scored"),
      "per-cluster selection lost its map-side partial phase")
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("Window"), "selection must not use a window function")
  }

  test("col_profile scans the table once (Expand fans columns out map-side)") {
    val p = plan(Pipeline.colProfileDocs(spark, sf))
    assert(countIn(p, "FileScan") === 1,
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("Expand"), "multi-column distinct lost its single-scan Expand")
  }

  test("importance_resample broadcasts every rate relation; keep is map-side (no window)") {
    val p = plan(Pipeline.importanceResampleDocs(spark, sf))
    assert(countIn(p, "BroadcastExchange") >= 2,
      p.linesIterator.take(15).mkString("\n"))
    assert(!p.contains("Window"), "hash-threshold keep must not use a window")
  }

  test("mixture_plan is one scan + a broadcast of the weight relation") {
    val p = plan(Pipeline.mixturePlanDocs(spark, sf))
    assert(countIn(p, "FileScan") === 1)
    assert(p.contains("BroadcastExchange"))
  }

  test("decontaminate_bloom never shuffles the training side (probe is map-side)") {
    val p = plan(Dedup.decontaminateBloom(spark, sf))
    // one presentation sort is the only exchange; the bloom probe and
    // the contamination filter ride the scan projection
    assert(countIn(p, "Exchange") <= 1, p.linesIterator.take(15).mkString("\n"))
    assert(countIn(p, "FileScan") === 1)
    assert(p.contains("bloom_count_hits"), "probe must be the native expression")
  }

  test("decontaminate reads one shared shingle exchange for cap and join sides") {
    val df = Dedup.decontaminate(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("ReusedExchange"), p.linesIterator.take(20).mkString("\n"))
    assert(!p.contains("Window"), "the DF cap must be the keyed aggregate, not a window")
  }

  test("decontaminate_substr: semi-probe on window hashes, parity pushed to the scans, no window fn") {
    val df = Dedup.decontaminateSubstr(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("LeftSemi"))
    // the declared fixture shape: parity predicates specialize three
    // scans (totals, train windows, test windows) — no fourth; count
    // only the Final Plan section (the AQE string repeats the scans
    // in its Initial Plan echo)
    val finalSection = p.split("== Initial Plan ==")(0)
    assert(countIn(finalSection, "FileScan") === 3,
      finalSection.linesIterator.take(20).mkString("\n"))
    assert(!p.contains("Window"), "window-hash audit must not use a window function")
  }

  test("event_spike broadcasts the per-type stats and reuses the daily exchange") {
    val df = EventOps.eventSpike(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    // the |types|-row stats relation must broadcast back onto the
    // daily frame — a shuffled join here would re-key the whole
    // (type, day) relation for a handful of stats rows
    assert(p.contains("BroadcastExchange"), p.linesIterator.take(20).mkString("\n"))
    // both consumers of the (type, day) aggregate read ONE exchange:
    // stats and the flag join share the daily frame, so the corpus
    // is scanned and the daily shuffle paid exactly once
    assert(p.contains("ReusedExchange"),
      "stats and flag-join must share the daily (type, day) exchange")
    // daily counts combine map-side before the (type, day) shuffle
    assert(countIn(p, "partial_count") >= 1)
  }

  test("labelPropagation round: both aggregates share the one src-keyed exchange") {
    // the round-9 rework keys the per-round vote exchange by src
    // alone, so the (src,nlabel) count and the per-src argmax run in
    // one stage — replicate ONE round's plan (the loop hides each
    // round behind a localCheckpoint lineage cut) and pin it
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val lab = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "label")
    val round = e
      .join(lab.select(col("id").as("dst"), col("label").as("nlabel")), "dst")
      .repartition(col("src"))
      .groupBy(col("src"), col("nlabel")).agg(count(lit(1)).as("c"))
      .groupBy(col("src"))
      .agg(max(struct(col("c"), (-col("nlabel")).as("neg"))).as("m"))
      .select(col("src").as("id"), (-col("m.neg")).as("label"))
    val p = plan(round)
    // exactly one shuffle exchange downstream of the join: the
    // repartition(src).  A second one means an aggregate stopped
    // accepting HashPartitioning(src) as satisfying its clustering
    // and the one-stage property silently regressed.
    val shuffles = countIn(p, "Exchange hashpartitioning")
    assert(shuffles === 1,
      s"expected the single src repartition, found $shuffles:\n" +
        p.linesIterator.take(25).mkString("\n"))
  }

  test("compression_ratio is one pruned scan into a bounded aggregate (no join, no window)") {
    val p = plan(TextOps.compressionRatio(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"), p.linesIterator.take(12).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 1)
    // column pruning reaches the scan: text + source only
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      "scan must read only text and source")
  }

  test("keyword_topk broadcasts the query terms and the 1-row corpus stats") {
    val p = plan(TextOps.keywordTopkEntry(spark, sf))
    assert(countIn(p, "BroadcastExchange") >= 2,
      "terms and stats must both broadcast:\n" + p.linesIterator.take(15).mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("winnow_fingerprint is one pruned scan; selection is map-side (no join, no window fn)") {
    val p = plan(TextOps.winnowFingerprint(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("hashpartitioning") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 1)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to (doc_id, text):\n" +
        p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("ann_sq8 broadcasts the query side; reconstruction is map-side on the scan") {
    val p = plan(Similarity.annSq8(spark, sf))
    assert(p.contains("BroadcastExchange"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the join")
  }

  test("knn delta collision join: forced broadcast only under the batch byte budget") {
    import spark.implicits._
    val comp = Seq((1L, 0, 5L), (2L, 0, 5L), (3L, 1, 9L)).toDF("vec_id", "tbl", "bucket")
    val batch = Seq((9L, 0, 5L)).toDF("vec_id", "tbl", "bucket")
    // streaming-cadence epoch: under budget, the hint pins a
    // BroadcastHashJoin — the single-stage plan that never shuffles
    // the corpus-sized composed assignment
    val small = Similarity.knnCollisionHits(comp, batch, batchBytes = 100L, budgetBytes = 1000L)
    assert(small.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      small.queryExecution.optimizedPlan.toString)
    assert(plan(small).contains("BroadcastHashJoin"))
    // oversized one-shot append: the forced hint is DROPPED so AQE
    // picks the strategy from measured sizes instead of OOMing on a
    // tens-of-GB bucket relation
    val big = Similarity.knnCollisionHits(comp, batch, batchBytes = 2000L, budgetBytes = 1000L)
    assert(!big.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      big.queryExecution.optimizedPlan.toString)
    // both branches compute the same collisions
    assert(small.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === big.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
  }

  test("active_users: one per-user window pass, day-bounded global sweep, broadcast day relations") {
    val p = plan(Temporal.activeUsers(spark, sf))
    // exactly three Window nodes: lag + interval-group sum over the
    // per-user frame, then ONE global sweep whose input is the day
    // spine — a fourth would mean the interval leg's union replays
    // the per-user pipeline per delta sign (the round-15 audit bug)
    assert(countIn(p, "Window ") === 3, p.linesIterator.take(30).mkString("\n"))
    // the per-user leg shuffles once on user_id (its window sort);
    // the (user, day) distinct exchange lives inside the shared
    // checkpointed leaf, executed once for the dau + interval legs
    assert(countIn(p, "hashpartitioning\\(user_id") === 1)
    // the global sweep's input is the generated calendar spine with
    // the day-keyed aggregates BROADCAST onto it — never a
    // corpus-sized relation under an unpartitioned window
    assert(p.contains("explode(sequence("))
    assert(countIn(p, "BroadcastHashJoin") === 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("vocab_coverage: each V is a map-side top-V, never a corpus-wide row numbering") {
    val p = plan(TextOps.vocabCoverage(spark, sf))
    assert(countIn(p, "TakeOrderedAndProject") === 3,
      p.linesIterator.take(15).mkString("\n"))
    assert(!p.contains("Window"), "no global row_number funnel")
  }

  test("dedup_report is one pruned scan into a keyed aggregate (no join, no window)") {
    val p = plan(Dedup.dedupReport(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("ReadSchema: struct<text:string,source:string>") ||
      p.contains("ReadSchema: struct<source:string,text:string>"),
      "scan must prune to (source, text):\n" +
        p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("contamination_matrix self-join reads one shared distinct-shingle exchange") {
    val df = Dedup.contaminationMatrix(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(countIn(p, "ReusedExchange") >= 1,
      "both sides must read the one (source, shingle) exchange:\n" +
        p.linesIterator.take(20).mkString("\n"))
  }

  test("embed_pca projection is map-side: no shuffle before the presentation sort") {
    val p = plan(Similarity.embedPca(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("hashpartitioning"),
      p.linesIterator.take(12).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 1)
  }

  /** AQE's executedPlan.toString prints final AND initial plans after
    * execution — scan counts must read the final section only.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("quality_mad scans the corpus once: every consumer reads the checkpointed histogram") {
    val p = finalPlan(Analytics.qualityMad(spark, sf))
    // the one parquet scan happens inside the checkpoint materialization
    // job; the final plan reads ONLY the shared histogram RDD
    assert(countIn(p, "Scan parquet") === 0, p.linesIterator.take(20).mkString("\n"))
    assert(countIn(p, "Scan ExistingRDD") >= 2, "histogram checkpoint must be shared")
  }

  test("heavy_hitters never shuffles the term universe: only sketch summaries move") {
    val p = finalPlan(TextOps.heavyHitters(spark, TestSpark.sf))
    // the single-group aggregate exchanges ONE summary row per partition;
    // no hashpartitioning on the term column anywhere
    assert(!p.contains("hashpartitioning(term"),
      p.linesIterator.take(20).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 1)
  }

  test("shared-frame queries scan the corpus once via the checkpoint") {
    for ((name, df) <- Seq(
      "basket_pairs" -> Analytics.basketPairs(spark, TestSpark.sf),
      "rfm_segments" -> Analytics.rfmSegments(spark, TestSpark.sf),
      "skew_report" -> Analytics.skewReport(spark, TestSpark.sf))) {
      val p = finalPlan(df)
      assert(countIn(p, "Scan parquet") === 0, s"$name re-scans:\n" +
        p.linesIterator.take(15).mkString("\n"))
      assert(p.contains("Scan ExistingRDD"), s"$name missing checkpoint")
    }
  }

  test("equidepth_hist carries no corpus-wide unpartitioned row_number") {
    val df = Analytics.equidepthHist(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only unpartitioned window runs over the DISTINCT-value frame
    // (post-aggregate); the per-row window is partitioned by cents
    assert(p.contains("row_number()") &&
      p.contains("windowspecdefinition(cents"),
      p.linesIterator.take(20).mkString("\n"))
  }

  test("customer_value_deciles: the tiling row_number is value-partitioned, never corpus-wide") {
    val df = Analytics.customerValueDeciles(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the equidepth staircase: the per-customer row_number is keyed by
    // the revenue value; the only unpartitioned window is the
    // |distinct values| cumulative staircase
    assert(p.contains("row_number()") &&
      p.contains("windowspecdefinition(rev_cents"),
      p.linesIterator.take(20).mkString("\n"))
  }

  test("sentence_stats is a zero-shuffle scan-project (one presentation sort only)") {
    val p = plan(TextOps.sentenceStats(spark, sf))
    // higher-order array ops stay in the row: the only exchange is the
    // final orderBy's range partitioning
    assert(countIn(p, "Exchange") <= 1, p.linesIterator.take(15).mkString("\n"))
    assert(!p.contains("Generate"), "no explode should appear")
  }

  test("order_gaps shuffles once on the customer key and reuses the window clustering") {
    val p = plan(Temporal.orderGaps(spark, sf))
    // one hash exchange (custkey) feeds both the LAG window and the
    // follow-up aggregate; +1 range exchange for presentation order
    assert(countIn(p, "Exchange hashpartitioning") === 1,
      p.linesIterator.take(20).mkString("\n"))
  }

  test("interval_merge: both island windows and the aggregate share one user exchange") {
    val p = plan(Temporal.intervalMerge(spark, sf))
    // one hash exchange (user_id) + the presentation range sort; the
    // running-max window, island-id window, island aggregate and user
    // aggregate all reuse the user clustering
    assert(countIn(p, "Exchange hashpartitioning") === 1,
      p.linesIterator.take(25).mkString("\n"))
  }

  test("gini_topshare has no per-customer global window — only the value staircase") {
    val df = Analytics.giniTopshare(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("row_number()"),
      "the staircase decomposition must not rank individual customers")
  }

  test("msg_decode_json: codec passes pipeline with the scan, one hash exchange") {
    val p = plan(EventOps.msgDecodeJson(spark, sf))
    // encode (to_json), corrupt branch and decode (from_json) are all
    // narrow projects over the single events scan; the only hash
    // exchange carries per-type partial aggregates (+ presentation sort)
    assert(countIn(p, "Exchange hashpartitioning") === 1,
      p.linesIterator.take(15).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 1)
  }

  test("anomaly_mad is one daily aggregate + one per-type window, join-free") {
    val p = plan(Temporal.anomalyMad(spark, sf))
    // exchanges: partial-agg → (type, day), window repartition → type,
    // presentation sort; everything after the first aggregate is
    // bounded by the calendar span, never corpus-sized
    assert(countIn(p, "Exchange") <= 3, p.linesIterator.take(20).mkString("\n"))
    assert(countIn(p, "Window") === 1)
    assert(!p.contains("Join"), "the trailing frame must come from the window, not a self-join")
    assert(countIn(p, "Scan parquet") === 1)
  }

  test("funnel_window's 9 stage counts read the checkpointed frames, never a recomputed join") {
    val p = plan(EventOps.funnelWindow(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // 3 windows x 3 stages: each count leg scans one localCheckpoint
    // RDD; a recomputed view/click/purchase join pipeline would show
    // parquet scans here instead
    assert(countIn(p, "Scan ExistingRDD") === 9,
      p.linesIterator.take(20).mkString("\n"))
    assert(countIn(p, "Scan parquet") === 0)
  }

  test("dq_checks: the whole suite costs two lineitem scans and two orders-side joins") {
    val p = plan(Analytics.dqChecks(spark, sf))
    // one scan carries ALL row-local range checks (conditional sums),
    // one more feeds the FK/ship-date join — adding a range check must
    // not add a scan
    assert(countIn(p, "Scan parquet") === 6, // 2 lineitem + 3 orders + 1 customer
      p.linesIterator.take(25).mkString("\n"))
    assert(countIn(p, "Join") === 2)
    assert(!p.contains("CartesianProduct"))
    // range checks reach the scan column-pruned
    assert(p.contains("struct<l_quantity:double,l_extendedprice:double,l_discount:double>"), p)
  }

  test("dedup_keep_best reads the comps artifact and the pruned doc projection, one window") {
    val p = plan(Dedup.dedupKeepBest(spark, sf))
    assert(countIn(p, "Window") === 1)
    assert(p.contains("struct<doc_id:bigint,n_chars:bigint>"), "n_chars-pruned doc scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("decon_by_source is a pure FileScan consumer of the flag-leaf artifact") {
    // the r16 query's evidence-kit plan pin (VERDICT r16 missing #3):
    // the decon column is maintained IN the materialized leaf, so the
    // per-feed matrix must read the curation_flags parquet and
    // aggregate — never re-run the 5-gram explode/join
    graft.operators.Pipeline.curationFlags(spark, sf).count() // ensure built
    val p = plan(graft.operators.Pipeline.deconBySource(spark, sf))
    assert(p.contains("curation_flags-"),
      "decon_by_source must scan the materialized flag artifact:\n" +
        p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("posexplode") && !p.contains("shingle"),
      "the 5-gram machinery must not appear in the consumer plan")
    assert(countIn(p, "Exchange") <= 2, "one aggregate + one presentation sort at most")
  }

  test("token_share_by_source and dup_cluster_sizes are pure artifact-FileScan consumers") {
    // the queries' own executed plans end on their shared-aggregate
    // checkpoint leaves; the artifact-FileScan pin belongs on the
    // relations that FEED those leaves
    val leaf = plan(graft.operators.Pipeline.curationFlags(spark, sf))
    assert(leaf.contains("curation_flags-"), "the flag leaf is the materialized artifact")
    val p1 = plan(graft.operators.Pipeline.tokenShareBySource(spark, sf))
    assert(!p1.contains("posexplode") && !p1.contains("tokenCount") &&
      !p1.contains("text"),
      "the token counting must not re-run — n_toks is a carried row-local")
    val labels = plan(Dedup.dedupComponents(spark, sf))
    assert(labels.contains("neardup_comps-"), "labels read the comps artifact:\n" +
      labels.linesIterator.take(10).mkString("\n"))
    val p2 = plan(Dedup.dupClusterSizes(spark, sf))
    assert(!p2.contains("shingle"), "the pair pipeline must not re-run")
  }

  test("ann_ivf searches the materialized IVF-Flat artifact with the probe prune pushed down") {
    val p = plan(Similarity.annIvf(spark, sf))
    assert(p.contains("annix_codes_ivf-"), "search must scan the codes artifact")
    assert(p.contains("In(cid") || p.contains("cid IN") || p.contains("in(cid"),
      "the probe prune must reach the codes FileScan")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("label_noise_centroid broadcasts the centroid relation; no corpus-sized shuffle join") {
    val p = plan(Similarity.labelNoiseCentroid(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.linesIterator.take(15).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // the rank-1 filter prunes map-side before the vec_id exchange
    assert(p.contains("WindowGroupLimit"))
  }
}
