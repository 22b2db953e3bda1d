package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Exact 3-gram Jaccard computed in plain Scala as the ground truth. */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val sh = docs.view.mapValues { t =>
      val toks = t.trim.split("\\s+")
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = sa.intersect(sb).size if inter > 0
    } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("dedup_report matches a local per-source replay of docs/distinct/dup_frac") {
    val rows = Dedup.dedupReport(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def norm(t: String): String =
      t.toLowerCase.replaceAll("[^a-z0-9 ]+", " ").replaceAll(" +", " ").trim
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getString(0) -> norm(r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val d = xs.map(_._2).distinct.length.toLong
      src -> ((n, d, (n - d).toDouble / n.toDouble))
    }
    assert(rows === want)
    assert(rows.values.map(_._1).sum === 500L, "partition of the corpus")
  }

  test("lsh_tuning: repeated-multiplication curve equals pow, monotone, threshold near 0.42") {
    val rows = Dedup.lshTuning(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (1 to 19).map(_ * 5L))
    rows.foreach { case (pct, s, p) =>
      assert(s === pct / 100.0)
      assert(math.abs(p - (1.0 - math.pow(1.0 - math.pow(s, 4), 32))) < 1e-12)
    }
    val ps = rows.map(_._3)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "S-curve is monotone")
    // p crosses 1/2 at s = (1 - 2^(-1/32))^(1/4) ~ 0.383, and the
    // classic threshold (1/b)^(1/r) ~ 0.42 marks the steep midpoint
    // where p ~ 1 - 1/e
    assert(rows.find(_._1 == 35L).get._3 < 0.5 && rows.find(_._1 == 40L).get._3 > 0.5)
    val p42 = 1.0 - math.pow(1.0 - math.pow(0.42, 4), 32)
    assert(math.abs(p42 - (1.0 - 1.0 / math.E)) < 0.03)
    // the operating claims: ~1 at the 0.8 dedup bar, ~0 at 0.2 noise
    assert(rows.find(_._1 == 80L).get._3 > 0.999)
    assert(rows.find(_._1 == 20L).get._3 < 0.06)
  }

  test("contamination_matrix matches a local replay of cross-source shingle sharing") {
    val rows = Dedup.contaminationMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.flatMap { case (_, t) =>
      val toks = t.trim.split("\\s+")
      toks.sliding(5).filter(_.length == 5).map(_.mkString(" "))
    }.toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      inter = bySrc(a).intersect(bySrc(b)).size if inter > 0
    } yield (a, b) -> ((inter.toLong,
      inter.toDouble / (bySrc(a).size + bySrc(b).size - inter).toDouble))).toMap
    assert(rows === want)
    assert(rows.nonEmpty, "synthetic sources share boilerplate by construction")
    rows.values.foreach { case (n, j) => assert(n > 0 && j > 0.0 && j <= 1.0) }
  }

  test("minhash estimate tracks exact jaccard within 0.15") {
    val cand = Dedup.dedupMinhash(spark, sf).collect()
    assert(cand.nonEmpty)
    cand.foreach { r =>
      val key = (r.getAs[Long]("d1"), r.getAs[Long]("d2"))
      val est = r.getAs[Double]("est_jaccard")
      val exact = exactJaccard.getOrElse(key, 0.0)
      assert(math.abs(est - exact) <= 0.15, s"pair $key est=$est exact=$exact")
    }
  }

  test("minhash recall: every exact pair with J>=0.9 is found") {
    val found = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val wanted = exactJaccard.filter(_._2 >= 0.9).keySet
    assert(wanted.nonEmpty)
    assert(wanted.subsetOf(found), s"missed: ${wanted.diff(found)}")
  }

  test("simhash pairs are genuinely similar documents") {
    val pairs = Dedup.dedupSimhash(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val key = (r.getAs[Long]("d1"), r.getAs[Long]("d2"))
      assert(r.getAs[Int]("hamming") <= 7)
      assert(exactJaccard.getOrElse(key, 0.0) >= 0.3, s"false positive $key")
    }
  }

  test("simhash combination blocking is EXACT for Hamming <= 7 (equals brute force)") {
    import org.apache.spark.sql.functions._
    import graft.functions.SimHash64.simhash64
    import graft.functions.TextFunctions.shingles
    val hashes = Tables.documents(spark, sf)
      .select(col("doc_id"), simhash64(array_distinct(shingles(col("text"), 3))).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sh"))
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 7
    } yield (a, b)).toSet
    val got = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(got === want, "blocking must find EVERY pair within Hamming 7, and only those")
  }

  test("simhash recall on near-identical docs (J>=0.98)") {
    val found = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val nearIdentical = exactJaccard.filter(_._2 >= 0.98).keySet
    val recall = if (nearIdentical.isEmpty) 1.0
      else nearIdentical.count(found).toDouble / nearIdentical.size
    assert(recall >= 0.8, s"recall $recall over ${nearIdentical.size} pairs")
  }

  test("lsh embedding dedup finds a useful fraction of the exact pairs, no false positives") {
    val exact = Dedup.dedupEmbedding(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    val lsh = Dedup.dedupEmbeddingLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(3)}")
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.2, s"recall $recall over ${exact.size} pairs")
    }
  }

  test("dedup_embedding fails LOUD past the all-pairs corpus budget, routing to the LSH form") {
    // the real operator path with a budget below the fixture corpus:
    // the n² job must never launch — a plan-time contract error names
    // the scale-safe alternative instead
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupEmbeddingBudgeted(spark, sf, budget = 3L)
    }
    assert(ex.getMessage.contains("dedup_embedding_lsh"))
    assert(ex.getMessage.contains("O(n²)"))
    // and the production budget admits the fixture corpus unchanged
    assert(Dedup.dedupEmbedding(spark, sf).count() > 0)
  }

  test("exact-jaccard operator agrees with the Scala ground truth") {
    val got = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val want = exactJaccard.filter(_._2 >= 0.8).keySet
    assert(got === want)
  }

  test("components resolve the near-dup pair graph: rep = min member, sizes consistent") {
    val pairs = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    // local union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"), r.getAs[Long]("n_members")))
    assert(got.map(g => g._1 -> g._2).toMap === want)
    val sizes = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case (_, rep, n) => assert(n === sizes(rep)) }
  }

  test("star contraction: 100k+-edge chain graph, diameter >> 20, multi-partition fixpoint") {
    import org.apache.spark.sql.functions._
    // 1,000 chains of 120 nodes each: 119,000 edges, component diameter
    // 119 — min-label propagation (one hop per round) would need 119
    // rounds; the star contraction converges in O(log n).  Run on 8
    // partitions to exercise the distributed fixpoint path end to end.
    val chainLen = 120L
    val chains = 1000L
    val edges = spark.range(chains * chainLen)
      .filter(col("id") % chainLen =!= chainLen - 1)
      .select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val labels = Dedup.connectedComponents(edges, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === (chains * chainLen).toInt)
    labels.foreach { case (id, comp) =>
      assert(comp === (id / chainLen) * chainLen, s"node $id")
    }
  }

  test("star contraction matches union-find on a seeded random graph (cycles, stars, merges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 2000
    val raw = Seq.fill(3000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    raw.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical rep = component min (find gives min because merges
    // always point the larger root at the smaller)
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(raw.toDF("d1", "d2"), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the driver-local small-graph solver must agree with the
    // distributed contraction row for row
    val local = Dedup.localComponents(spark, raw.toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === want)
  }

  test("curation_report conserves documents at every stage and chains stage outputs") {
    val rows = graft.operators.Pipeline.curationReport(spark, sf).collect()
      .sortBy(_.getAs[Int]("stage_idx"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("raw", "exact_dedup", "near_dup", "decontaminate", "gopher", "c4",
        "source_mix", "split_train"))
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_in") - r.getAs[Long]("docs_removed") ===
        r.getAs[Long]("docs_out"), s"conservation at ${r.getAs[String]("stage")}")
      assert(r.getAs[Long]("docs_removed") >= 0 && r.getAs[Long]("tokens_out") >= 0)
    }
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(prev.getAs[Long]("docs_out") === next.getAs[Long]("docs_in"),
        s"chain break ${prev.getAs[String]("stage")} -> ${next.getAs[String]("stage")}")
    }
    // the raw row is the whole corpus; tokens only ever shrink
    assert(rows.head.getAs[Long]("docs_in") === 500L)
    assert(rows.map(_.getAs[Long]("tokens_out")).toSeq ===
      rows.map(_.getAs[Long]("tokens_out")).toSeq.sorted.reverse)
    // the selection stages' standalone columns bind even though the
    // synthetic corpus's funnel is empty by stage 7: the split drops a
    // nonzero, non-total share of the raw corpus, and the raw-corpus
    // mixture keeps at least the max-token source entirely
    val bySt = rows.map(r => r.getAs[String]("stage") -> r).toMap
    val rSplit = bySt("split_train").getAs[Long]("removed_alone")
    assert(rSplit > 0L && rSplit < 500L, s"split standalone removal $rSplit")
    assert(bySt("source_mix").getAs[Long]("removed_alone") < 500L,
      "the √-temperature mixture keeps the largest source fully")
  }

  test("decon_by_source conserves the test split and replays the flag leaf's decon column") {
    import org.apache.spark.sql.functions._
    val flags = graft.operators.Pipeline.curationFlags(spark, sf)
      .select(col("doc_id"), col("source"), col("decon")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val evens = flags.filter(_._1 % 2 == 0)
    val want = evens.groupBy(_._2).map { case (src, xs) =>
      val n = xs.length.toLong
      val c = xs.count(_._3).toLong
      (src, n, c, c * 1000000L / n)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Pipeline.deconBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === evens.length.toLong,
      "every test-side doc lands in exactly one source row")
    assert(got.nonEmpty && got.exists(_._3 > 0), "the synthetic corpus has real contamination")
  }

  test("curation_by_source sums to the global funnel at every shared stage") {
    val funnel = graft.operators.Pipeline.curationReport(spark, sf).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_out"), r.getAs[Long]("tokens_out"))).toMap
    val matrix = graft.operators.Pipeline.curationBySource(spark, sf).collect()
    assert(matrix.length > 1, "multi-source corpus expected")
    def tot(c: String): Long = matrix.map(_.getAs[Long](c)).sum
    assert(tot("n_docs") === funnel("raw")._1)
    assert(tot("toks_raw") === funnel("raw")._2)
    assert(tot("o_exact") === funnel("exact_dedup")._1)
    assert(tot("o_neardup") === funnel("near_dup")._1)
    assert(tot("o_decon") === funnel("decontaminate")._1)
    assert(tot("o_gopher") === funnel("gopher")._1)
    assert(tot("o_c4") === funnel("c4")._1)
    assert(tot("toks_c4") === funnel("c4")._2)
    // per-source survivor counts only ever shrink down the ladder
    matrix.foreach { r =>
      val chain = Seq(r.getAs[Long]("n_docs"), r.getAs[Long]("o_exact"),
        r.getAs[Long]("o_neardup"), r.getAs[Long]("o_decon"),
        r.getAs[Long]("o_gopher"), r.getAs[Long]("o_c4"))
      assert(chain === chain.sorted.reverse, s"${r.getAs[String]("source")}: $chain")
    }
  }

  test("curation_report selection stages: cumulative legs bind on a corpus that survives the quality gates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // engineered docs that PASS gopher and c4: >=50 tokens of 3-10
    // mean char length with stopwords, sentence-ended lines; two
    // sources of different sizes so the √-temperature rates differ
    val sentence = "the quick brown fox jumps over the lazy dog with great delight today."
    def doc(i: Long) = {
      val body = (0 until 6).map(k => sentence.replace("today", s"day u${i}v$k")).mkString(" ")
      (i, body, if (i % 3 == 0) "small" else "large")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_curation_sel").toString
    (1L to 90L).map(doc).toDF("doc_id", "text", "source")
      .repartition(2).write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Pipeline.curationReport(spark, dir).collect()
      .sortBy(_.getAs[Int]("stage_idx"))
    val bySt = rows.map(r => r.getAs[String]("stage") -> r).toMap
    val o5 = bySt("c4").getAs[Long]("docs_out")
    assert(o5 > 0L, "the engineered corpus must survive the quality gates")
    val o6 = bySt("source_mix").getAs[Long]("docs_out")
    val o7 = bySt("split_train").getAs[Long]("docs_out")
    assert(o6 > 0L && o6 <= o5, s"mixture keeps a nonempty subset ($o6 of $o5)")
    assert(o7 <= o6, s"train split is a subset of the mixture ($o7 of $o6)")
    // independent recomputation of the mixture stage: √-temperature
    // rates over the c4 survivors, md5-threshold keep — the sourceMix
    // machinery applied to the survivor frame
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    // survivors of the engineered corpus: no exact/near dups, no
    // contamination of odd (train) docs... recompute k5 directly
    val gk = graft.operators.TextOps.qualityGopherFlags(
      spark.read.parquet(s"$dir/documents.parquet")).filter(col("keep"))
      .select(col("doc_id"))
    val ck = graft.operators.TextOps.qualityC4Flags(
      spark.read.parquet(s"$dir/documents.parquet")).filter(col("keep"))
      .select(col("doc_id"))
    val decon = Dedup.decontaminate(spark, dir).select(col("test_id").as("doc_id"))
    val k5 = docs.join(gk, "doc_id").join(ck, "doc_id")
      .join(decon, Seq("doc_id"), "left_anti")
    val perSrc = k5.groupBy(col("source")).agg(sum(col("tok")).as("ts"))
    val mx = math.max(1L, perSrc.agg(max(col("ts"))).head.getLong(0))
    val cut = perSrc.collect().map(r => r.getString(0) ->
      math.floor(math.sqrt(r.getLong(1).toDouble / mx.toDouble) * 65536).toLong).toMap
    val kept = k5.withColumn("h",
        concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4)))
      .collect().count { r =>
        r.getAs[String]("h") < f"${cut(r.getAs[String]("source"))}%05x"
      }
    assert(o6 === kept.toLong, "stage-7 cumulative must equal the independent sourceMix replay")
  }

  test("corpus_clean keeps exactly the quality reps") {
    val kept = Dedup.dedupComponents(spark, sf).collect()
    val nonReps = kept.filter(r => r.getAs[Long]("doc_id") != r.getAs[Long]("rep"))
      .map(_.getAs[Long]("doc_id")).toSet
    val good = graft.operators.TextOps.textQuality(spark, sf).collect()
      .filter(_.getAs[Double]("quality") >= 0.5).map(_.getAs[Long]("doc_id")).toSet
    val lowRep = graft.operators.TextOps.textRepetition(spark, sf).collect()
      .filter(_.getAs[Double]("dup_2gram_frac") < 0.5).map(_.getAs[Long]("doc_id")).toSet
    val got = graft.operators.Pipeline.corpusClean(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got === good.diff(nonReps).intersect(lowRep))
  }

  test("packNextFit: bins respect capacity, every doc packed once, stats consistent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cap = 100
    val docs = (1L to 200L).map(i => (i, (i * 37 % 90) + 5)).toDF("doc_id", "tok")
      .repartition(4)
    val packed = graft.operators.Pipeline.packNextFit(docs, cap).collect()
    assert(packed.length === 200)
    assert(packed.map(_.getAs[Long]("doc_id")).toSet === (1L to 200L).toSet)
    packed.groupBy(_.getAs[Long]("bin_id")).values.foreach { bin =>
      val total = bin.map(_.getAs[Long]("tok")).sum
      assert(total <= cap || bin.length == 1, s"overfull multi-doc bin: $total")
    }
    // pack_stats: bins * capacity always covers the class token mass
    // unless the class is the oversized one (per_bin = 1 can overflow)
    val stats = graft.operators.Pipeline.packStats(spark, sf).collect()
    val toks = graft.sources.Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split("\\s+").length.toLong)
    assert(stats.map(_.getAs[Long]("n_docs")).sum === toks.length)
    assert(stats.map(_.getAs[Long]("tokens")).sum === toks.sum)
    stats.foreach { r =>
      val u = r.getAs[Double]("utilization")
      assert(u > 0)
      if (r.getAs[Long]("per_bin") > 1) assert(u <= 1.0)
    }
  }

  test("dedup_incremental verdicts planted exact, near and fresh batch docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearEdit = (1 to 39).map(i => s"tok$i").mkString(" ") + " changed"
    val corpus = Seq((1L, base), (3L, "some other corpus doc entirely"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                       // exact copy of corpus doc 1
      (12L, nearEdit),                   // tail-edited: J = 35/41 ≈ 0.85
      (14L, "completely fresh material never seen before by anything"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.dedupIncremental(corpus, batch, 0.8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(10L -> "exact_dup", 12L -> "near_dup", 14L -> "kept"))
    // entry smoke: every even doc gets exactly one verdict
    val entry = graft.operators.Dedup.dedupIncrementalEntry(spark, sf).collect()
    val evens = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0).count()
    assert(entry.length.toLong === evens)
    assert(entry.map(_.getAs[String]("verdict")).toSet.subsetOf(
      Set("exact_dup", "near_dup", "kept")))
  }

  test("source_mix keeps everything from the heaviest source, rates follow sqrt temperature") {
    val rows = graft.operators.Pipeline.sourceMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val mx = rows.map(_.getAs[Long]("tok_s")).max
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0 && rate <= 1.0)
      assert(math.abs(rate - math.sqrt(r.getAs[Long]("tok_s").toDouble / mx)) < 1e-12)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      // cutoff 65536 ('10000') sorts above every 16-bit hash → full keep
      if (r.getAs[Long]("tok_s") == mx)
        assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"))
    }
    val again = graft.operators.Pipeline.sourceMix(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("decontaminate_substr catches an offset verbatim span that chunk alignment would miss") {
    import spark.implicits._
    // 25-token benchmark paragraph; the train doc embeds it VERBATIM
    // at offset 10 amid unique filler — every 5-gram of the filler is
    // unique, but the span's 6 interior 20-token windows must hit
    val span = (0 until 25).map(i => s"bench$i")
    val filler1 = (0 until 10).map(i => s"pre$i")
    val filler2 = (0 until 10).map(i => s"post$i")
    val docs = Seq(
      (2L, span.mkString(" ")),                                // test side
      (1L, (filler1 ++ span ++ filler2).mkString(" ")),        // contaminated train
      (3L, (0 until 40).map(i => s"clean$i").mkString(" "))) // clean train
      .toDF("doc_id", "text")
    val got = Dedup.decontaminateSubstrOver(docs, 20).collect()
      .map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_hit_windows"))).toMap
    // only the contaminated doc flagged; span yields 25-20+1 = 6
    // matching windows; doc 1 has 45-20+1 = 26 windows total
    assert(got.keySet === Set(1L))
    assert(got(1L) === ((26L, 6L)))
    // sub-window contamination (< w tokens shared) stays silent: a
    // 19-token prefix of the span in an otherwise-unique doc
    val short = Seq(
      (2L, span.mkString(" ")),
      (1L, ((0 until 10).map(i => s"x$i") ++ span.take(19)).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.decontaminateSubstrOver(short, 20).collect().isEmpty)
  }

  test("decontaminate_bloom: no false negatives vs an exact replay, false positives within fpp") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def sh5(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }
    val testSet = docs.filter(_._1 % 2 == 0).flatMap(d => sh5(d._2)).toSet
    val exact = docs.filter(_._1 % 2 == 1)
      .map { case (id, t) => id -> (sh5(t), sh5(t).count(testSet.contains)) }.toMap
    val got = Dedup.decontaminateBloom(spark, sf).collect()
      .map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"))).toMap
    // every truly contaminated train doc is flagged, with hits >= exact
    exact.foreach { case (id, (shs, ex)) =>
      if (ex > 0) {
        assert(got.contains(id), s"contaminated doc $id missing (false negative)")
        assert(got(id)._2 >= ex, s"doc $id under-counted: ${got(id)._2} < $ex")
        assert(got(id)._1 === shs.size.toLong)
      }
    }
    // one-sided error: total overshoot bounded by the fpp budget
    val totalFp = got.map { case (id, (_, hit)) => hit - exact(id)._2 }.sum
    val probes = exact.values.map(_._1.size.toLong).sum
    assert(totalFp <= math.max(3L, (10 * 0.001 * probes).toLong),
      s"false-positive mass $totalFp over $probes probes exceeds the fpp budget")
    // deterministic
    val again = Dedup.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again === got.toSeq.sortBy(_._1).map { case (id, (ns, nh)) => (id, ns, nh) })
  }

  test("importance_resample: binding source keeps all, kept sets replicate the md5 threshold exactly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    val weights = (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap
    val rows = graft.operators.Pipeline.importanceResample(docs, weights).collect()
    assert(rows.nonEmpty)
    // independent JVM replica of the whole rate + keep computation
    val raw = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("tok")))
    val tokS = raw.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = tokS.values.sum
    val ratio = tokS.map { case (s, t) => s -> weights(s) * tot.toDouble / t.toDouble }
    val mxr = ratio.values.max
    def hex4(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x"
    }
    val expKept = raw.groupBy(_._2).map { case (s, ds) =>
      val cutoff = math.floor(ratio(s) / mxr * 65536).toLong
      s -> ds.filter(d => ("0" + hex4(d._1)) < f"$cutoff%05x")
    }
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(math.abs(r.getAs[Double]("rate") - ratio(s) / mxr) === 0.0)
      assert(r.getAs[Long]("n_kept") === expKept(s).length.toLong)
      assert(r.getAs[Long]("tok_kept") === expKept(s).map(_._3).sum)
      if (ratio(s) == mxr) // binding source: cutoff 65536 keeps every doc
        assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"))
    }
    // partitioning-invariant (pure per-row hash + bounded aggregates)
    val again = graft.operators.Pipeline
      .importanceResample(docs.repartition(7), weights).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // a source missing from the plan is excluded, visibly
    val partial = graft.operators.Pipeline
      .importanceResample(docs, weights - "src3").collect()
    assert(!partial.map(_.getAs[String]("source")).contains("src3"))
    assert(partial.length === rows.length - 1)
  }

  test("mixture_plan replays exactly in the JVM; budget conserved; both regimes exercised") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("source"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    val weights = (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap
    val rows = graft.operators.Pipeline.mixturePlan(docs, weights, 200000L).collect()
    assert(rows.length === 20)
    val tokS = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wsum = weights.values.sum
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val tw = weights(s) / wsum
      val tt = tw * 200000.0
      val ep = tt / tokS(s).toDouble
      assert(r.getAs[Double]("target_w") === tw)
      assert(r.getAs[Double]("target_tok") === tt)
      assert(r.getAs[Double]("epochs") === ep)
      assert(r.getAs[Double]("sample_rate") === math.min(1.0, ep))
      assert(r.getAs[Long]("n_passes") === math.ceil(ep).toLong)
    }
    // the plan allocates exactly the budget across sources
    assert(math.abs(rows.map(_.getAs[Double]("target_tok")).sum - 200000.0) < 1e-6)
    // the ramp exercises both the downsample and the replication regime
    assert(rows.exists(_.getAs[Double]("epochs") < 1.0))
    assert(rows.exists(_.getAs[Double]("epochs") > 1.0))
  }

  test("mixture_apply materializes exactly the JVM-replayed plan; copies are floor or floor+1") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    val weights = (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap
    val got = graft.operators.Pipeline.mixtureApply(docs, weights, 200000L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet
    // independent replay: epochs per source, then per-doc copy count
    val raw = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("tok")))
    val tokS = raw.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wsum = weights.values.sum
    def hex4(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x"
    }
    val want = raw.flatMap { case (id, s, _) =>
      val epochs = weights(s) / wsum * 200000.0 / tokS(s).toDouble
      val full = math.floor(epochs).toLong
      val cutoff = math.floor((epochs - math.floor(epochs)) * 65536).toLong
      val n = full + (if (("0" + hex4(id)) < f"$cutoff%05x") 1L else 0L)
      (0L until n).map(id -> _)
    }.toSet
    assert(got === want)
    assert(got.nonEmpty)
    // replication regime actually exercised: some doc has >1 copy and
    // some doc is sampled out entirely
    assert(got.exists(_._2 >= 1L))
    assert(raw.map(_._1).toSet.diff(got.map(_._1)).nonEmpty)
    // partitioning invariance
    val again = graft.operators.Pipeline
      .mixtureApply(docs.repartition(7), weights, 200000L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet
    assert(again === got)
  }

  test("native minhash band keys equal the xxhash64(slice) formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    val bands = 32
    val rows = 128 / bands
    val sig = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(
          array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)), 128).as("sig"))
      .filter(size(col("sig")) > 0)
    val native = sig.select(col("doc_id"),
        posexplode(graft.functions.MinHashBandKeys.minhashBandKeys(col("sig"), bands))
          .as(Seq("band", "bkey")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hof = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(native === hof)
  }

  test("decontaminate counts exactly the cross-split 5-gram overlaps") {
    // local ground truth over the same corpus
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val grams = docs.view.mapValues { t =>
      val toks = t.trim.split("\\s+")
      toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.toMap
    val df = grams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = grams.view.mapValues(_.filter(df(_) <= 128)).toMap
    val want = (for {
      (te, sTe) <- kept.toSeq if te % 2 == 0
      overlaps = kept.toSeq.filter { case (tr, sTr) => tr % 2 == 1 && sTr.intersect(sTe).nonEmpty }
      if overlaps.nonEmpty
    } yield te -> (overlaps.size.toLong,
      overlaps.map(_._2.intersect(sTe).size.toLong).sum)).toMap
    val got = Dedup.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("test_id") ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_shared_shingles"))).toMap
    assert(got === want)
  }

  test("simhash combination blocking keeps candidate volume ~linear in n") {
    import org.apache.spark.sql.functions._
    import graft.functions.SimHash64.simhash64
    import graft.functions.TextFunctions.shingles
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val vol = docs
      .select(simhash64(array_distinct(shingles(col("text"), 3))).as("sh"))
      .select(explode(Dedup.simhashBandKeys(col("sh"))).as("bb"))
      .groupBy(col("bb.band"), col("bb.bkey")).count()
      .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .collect()(0).getDouble(0).toLong
    // Σ_bucket C(n_b,2) across all 36 combination tables stays a small
    // multiple of n (8-bit bands would give Θ(n²/256) here)
    assert(vol <= 50 * n, s"candidate volume $vol for n=$n")
  }

  test("dedup_chunk: planted duplicate spans are counted exactly, shared-exchange skew-safe plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc 1 and 2 share their first 10-token chunk exactly; doc 2's
    // second (short) chunk repeats doc 3 entirely; doc 4 is unique
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$span tail tokens"),
      (3L, "tail tokens"),
      (4L, "entirely unrelated words that appear nowhere else at all"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"), r.getAs[Double]("dup_chunk_frac"))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))   // shared span dup, own tail unique
    assert(out(2L) === ((2L, 2L, 1.0)))   // both chunks seen elsewhere
    assert(out(3L) === ((1L, 1L, 1.0)))   // its whole text = doc 2's chunk
    assert(out(4L) === ((1L, 0L, 0.0)))
    // empty / whitespace-only docs have zero chunks (and so no row)
    val empties = Dedup.chunkAudit(Seq((9L, ""), (10L, "   "), (11L, "one")).toDF("doc_id", "text"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(empties === Set(11L))
    // corpus run: the per-(doc, chunk) aggregate feeds both the
    // frequency count and the join probe from ONE exchange (skew-safe
    // keyed-aggregate shape — no window over the hot chunk key).
    // Exchange reuse is an AQE runtime decision: execute, then assert
    // on the final adaptive plan.
    val df = Dedup.dedupChunk(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("ReusedExchange"), s"perDoc exchange must be shared:\n$plan")
    assert(!plan.contains("Window"), "frequency must be a keyed aggregate, not a window")
    val want = Tables.documents(spark, sf).select(col("text")).collect()
      .map(r => (r.getString(0).trim.split("\\s+").count(_.nonEmpty) + 9) / 10)
      .map(_.toLong).sum
    assert(rows.map(_.getAs[Long]("n_chunks")).sum === want)
    rows.foreach { r =>
      val f = r.getAs[Double]("dup_chunk_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("dedup_substr: stride-1 windows catch the unaligned span dedup_chunk provably misses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one 20-token span duplicated at DIFFERENT offsets (0 in doc 1,
    // 1 in doc 2): every 10-token chunk boundary disagrees between the
    // two docs, so chunk-aligned audit sees zero duplication — the
    // documented alignment gap; every stride-1 window sees the span at
    // both offsets.
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span ${(1 to 10).map(i => s"a$i").mkString(" ")}"),
      (2L, s"off $span ${(1 to 11).map(i => s"b$i").mkString(" ")}"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    // negative control: the chunk approximation misses the offset span
    val chunk = Dedup.chunkAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_chunks")).toMap
    assert(chunk(1L) === 0L, "chunk audit should miss the unaligned span (negative control)")
    assert(chunk(2L) === 0L)
    // stride-1 windows catch exactly the span window, at both offsets
    val sub = Dedup.substrAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    assert(sub(1L) === ((11L, 1L))) // 30 tokens → 11 windows, 1 dup
    assert(sub(2L) === ((13L, 1L))) // 32 tokens → 13 windows, 1 dup
    assert(sub(3L) === ((11L, 0L)))
    // docs shorter than w have no windows and therefore no row
    assert(Dedup.substrAudit(Seq((9L, "only three tokens")).toDF("doc_id", "text"))
      .count() === 0L)
    // corpus run keeps the chunkAudit plan shape: one (doc, window)
    // exchange shared by frequency and probe, keyed aggregate (no
    // window function) for the hot-key frequency
    val df = Dedup.dedupSubstr(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("ReusedExchange"), s"perDoc exchange must be shared:\n$plan")
    assert(!plan.contains("Window"), "frequency must be a keyed aggregate, not a window")
    rows.foreach { r =>
      val f = r.getAs[Double]("dup_window_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_windows") > 0L)
    }
  }

  test("chunk_docs sequences cover every token with exact overlap and rebuild the doc") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks100 = (1 to 100).map(i => s"w$i")
    val docs = Seq(
      (1L, toks100.mkString(" ")),
      (2L, (1 to 5).map(i => s"x$i").mkString(" ")), // shorter than seqLen
      (3L, (1 to 10).map(i => s"y$i").mkString(" "))) // exactly seqLen
      .toDF("doc_id", "text")
    val out = graft.operators.Pipeline.chunkSequences(docs, 10, 2).collect() // stride 8
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    val d1 = byDoc(1L).sortBy(_.getAs[Int]("seq_idx"))
    assert(d1.length === 13) // ceil((100-10)/8)+1
    assert(d1.last.getAs[Long]("n_seq_tokens") === 4L) // start 96 → 4 left
    // consecutive sequences share exactly the 2 overlap tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      val at = a.getAs[String]("seq_text").split(" ")
      val bt = b.getAs[String]("seq_text").split(" ")
      assert(at.takeRight(2).toSeq === bt.take(2).toSeq)
    }
    // dropping each later sequence's overlap prefix rebuilds the doc
    val rebuilt = d1.head.getAs[String]("seq_text").split(" ").toSeq ++
      d1.tail.toSeq.flatMap(_.getAs[String]("seq_text").split(" ").drop(2).toSeq)
    assert(rebuilt === toks100)
    // short and exact-length docs emit ONE sequence, text intact
    assert(byDoc(2L).length === 1)
    assert(byDoc(2L).head.getAs[Long]("n_seq_tokens") === 5L)
    assert(byDoc(2L).head.getAs[String]("seq_text") === (1 to 5).map(i => s"x$i").mkString(" "))
    assert(byDoc(3L).length === 1)
    assert(byDoc(3L).head.getAs[Long]("n_seq_tokens") === 10L)
    // misuse fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Pipeline.chunkSequences(docs, 10, 10)
    }
  }

  test("chunk_docs_bpe: BPE-budget sequences respect word bounds, rebuild, and flag overflow") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Bpe
    val t = Bpe.default
    def bpeCost(w: String): Int = Bpe.segment(w, t).length
    // real-ish words plus one long unmergeable word that alone
    // overflows a small budget
    val words1 = Seq("the", "and", "with", "that", "queen", "ingest",
      "xyzzy", "for", "thin", "wxqzkj", "the", "and") // mixed costs
    val big = "zqxjkwvzqxjkwv" // mostly unmergeable → cost ~ length
    assert(bpeCost(big) > 8)
    val docs = Seq(
      (1L, words1.mkString(" ")),
      (2L, s"the $big and"),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.operators.Pipeline.chunkSequencesBpe(docs, 8, 2, t).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // every sequence's n_seq_bpe_tokens is the true BPE count of its
    // words, and respects the budget unless it is a single-word
    // overflow (the needs-truncation-upstream signal)
    out.filter(_.getAs[Long]("doc_id") != 3L).foreach { r =>
      val ws = r.getAs[String]("seq_text").split(" ").toSeq
      assert(r.getAs[Long]("n_seq_words") === ws.length.toLong)
      assert(r.getAs[Long]("n_seq_bpe_tokens") === ws.map(bpeCost).sum.toLong)
      assert(r.getAs[Long]("n_seq_bpe_tokens") <= 8 || r.getAs[Long]("n_seq_words") === 1L,
        s"multi-word sequence over budget: $r")
    }
    // rebuild: concatenating each sequence minus its first
    // n_overlap_words words restores the doc exactly
    def rebuild(id: Long): Seq[String] = byDoc(id).sortBy(_.getAs[Int]("seq_idx")).toSeq
      .flatMap { r =>
        r.getAs[String]("seq_text").split(" ").filter(_.nonEmpty)
          .drop(r.getAs[Long]("n_overlap_words").toInt).toSeq
      }
    assert(rebuild(1L) === words1)
    assert(rebuild(2L) === Seq("the", big, "and"))
    // consecutive sequences genuinely share the declared overlap words
    byDoc(1L).sortBy(_.getAs[Int]("seq_idx")).sliding(2).foreach { case Array(a, b) =>
      val ov = b.getAs[Long]("n_overlap_words").toInt
      val at = a.getAs[String]("seq_text").split(" ")
      val bt = b.getAs[String]("seq_text").split(" ")
      assert(at.takeRight(ov).toSeq === bt.take(ov).toSeq)
    }
    // the oversized word forms its own overflowing sequence
    val over = byDoc(2L).filter(_.getAs[String]("seq_text") === big)
    assert(over.length === 1 && over.head.getAs[Long]("n_seq_bpe_tokens") > 8L)
    // empty doc → one empty sequence (whitespace-twin parity)
    assert(byDoc(3L).length === 1)
    assert(byDoc(3L).head.getAs[Long]("n_seq_bpe_tokens") === 0L)
  }

  test("pack_stats_bpe matches an independent replica in model-token units") {
    import org.apache.spark.sql.functions._
    import graft.functions.Bpe
    val t = Bpe.default
    // replica: per-doc BPE counts from segment(), then the same
    // integer packing arithmetic as the operator
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val toks = docs.map(d => d.trim.split("\\s+").filter(_.nonEmpty)
      .map(w => Bpe.segment(w, t).length.toLong).sum)
    val expect = toks.groupBy(tk => math.max(1L, 512L / math.max(tk, 1L)))
      .view.mapValues(g => (g.length.toLong, g.sum)).toMap
    val got = graft.operators.Pipeline.packStatsBpe(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    got.foreach { r =>
      val pb = r.getAs[Long]("per_bin")
      val (nDocs, tokens) = expect(pb)
      assert(r.getAs[Long]("n_docs") === nDocs, s"per_bin=$pb n_docs")
      assert(r.getAs[Long]("tokens") === tokens, s"per_bin=$pb tokens")
      val nBins = (nDocs + pb - 1) / pb
      assert(r.getAs[Long]("n_bins") === nBins)
      assert(math.abs(r.getAs[Double]("utilization") -
        tokens.toDouble / (nBins * 512).toDouble) < 1e-12)
    }
  }

  test("pack_render: bins respect capacity, every doc rendered once, rebuild in doc order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sep = "<|doc|>"
    val docs = (1L to 60L).map { i =>
      val n = (i % 7 + 1).toInt * 20 // 20..140 tokens
      (i, n.toLong, (1 to n).map(j => s"d${i}w$j").mkString(" "))
    }.toDF("doc_id", "tok", "text").repartition(4, col("doc_id"))
    val out = graft.operators.Pipeline.packRender(docs, 256, sep).collect()
    // every doc appears exactly once across all rendered bins
    val rendered = out.flatMap(_.getAs[String]("packed_text").split(java.util.regex.Pattern.quote(sep)))
      .map(_.trim).filter(_.nonEmpty)
    val firstWords = rendered.map(_.split(" ").head)
    assert(firstWords.sorted.toSeq === (1L to 60L).map(i => s"d${i}w1").sorted)
    out.foreach { r =>
      // capacity respected (cap 256 > max doc 140, so no oversize here)
      assert(r.getAs[Long]("n_tokens") <= 256L)
      assert(r.getAs[Long]("slack") === 256L - r.getAs[Long]("n_tokens"))
      // members render in doc_id order and rebuild their texts exactly
      val parts = r.getAs[String]("packed_text").split(java.util.regex.Pattern.quote(sep)).map(_.trim)
      assert(parts.length.toLong === r.getAs[Long]("n_docs"))
      val ids = parts.map(p => p.split(" ").head.drop(1).takeWhile(_ != 'w').toLong)
      assert(ids.sorted.toSeq === ids.toSeq, "members must render in doc_id order")
      assert(r.getAs[Long]("n_tokens") === parts.map(_.split(" ").length.toLong).sum)
    }
    // deterministic for a fixed partitioning
    val again = graft.operators.Pipeline.packRender(docs, 256, sep).collect()
    assert(again.map(_.toString).sorted.toSeq === out.map(_.toString).sorted.toSeq)
  }

  test("shuffle_shards: deterministic hash order, partition-layout-independent, contiguous positions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1L to 400L).toDF("doc_id")
    def runOn(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      graft.operators.Pipeline.shuffleShards(df, 8).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("pos")))
        .toSeq.sorted
    val a = runOn(docs)
    // same assignment under a completely different partition layout —
    // the reproducible-training-order contract
    assert(runOn(docs.repartition(13)) === a)
    // every doc exactly once, shards in range, positions contiguous
    // from 0 per shard
    assert(a.map(_._1) === (1L to 400L))
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    a.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted === (0L until g.length.toLong))
    }
    // within a shard, position order IS md5 order (the shuffle)
    val byShard = a.groupBy(_._2)
    byShard.values.foreach { g =>
      val inPos = g.sortBy(_._3).map(_._1)
      val byHash = g.map(_._1).sortBy(id =>
        java.security.MessageDigest.getInstance("MD5").digest(id.toString.getBytes)
          .map("%02x".format(_)).mkString)
      assert(inPos === byHash)
    }
    // and it genuinely reorders (not the identity permutation)
    assert(byShard.values.exists(g => g.sortBy(_._3).map(_._1) != g.map(_._1).sorted))
  }

  test("split_assign: deterministic disjoint 90/5/5 split, stable under re-partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    val out = graft.operators.Pipeline.splitAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
    assert(out.length === 2000)
    val frac = out.groupBy(_._2).view.mapValues(_.length / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, s"train frac ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.02)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.02)
    // stability: identical assignment on a different layout
    val again = graft.operators.Pipeline.splitAssign(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // misuse fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Pipeline.splitAssign(docs, trainFrac = 0.99, valFrac = 0.05)
    }
  }

  test("split_assign_grouped: near-dup components never straddle the split") {
    val rows = graft.operators.Pipeline.splitAssignGroupedRows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 500)
    // every group lands on exactly one side
    rows.groupBy(_._2).foreach { case (grp, members) =>
      assert(members.map(_._3).distinct.length === 1, s"group $grp straddles the split")
    }
    // groups ARE the near-dup components: members of a component share
    // a group key, so a doc and its near-copy can never leak across
    val comp = Dedup.dedupComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val grpOf = rows.map(r => r._1 -> r._2).toMap
    comp.foreach { case (doc, rep) => assert(grpOf(doc) === rep) }
    // the aggregate driver entry matches the per-doc rows
    val agg = graft.operators.Pipeline.splitAssignGrouped(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = rows.groupBy(_._3).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong)) }
    assert(agg === want)
  }

  test("dedup_substr_remove keeps the first occurrence and cuts merged overlapping spans") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // S25 = a 25-token duplicated run: doc 1 owns the canonical copy
    // (globally first by (doc_id, pos) → intact); doc 2 carries it at
    // offset 1, so its SIX duplicated window starts (1..6) must merge
    // into ONE 25-token cut, not disjoint windows.  Doc 3 repeats a
    // 20-token span within itself (canonical = the earlier pos).
    val s25 = (1 to 25).map(i => s"s$i").mkString(" ")
    val s20 = (1 to 20).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$s25 ${(1 to 5).map(i => s"a$i").mkString(" ")}"),
      (2L, s"off $s25 ${(1 to 6).map(i => s"b$i").mkString(" ")}"),
      (3L, s"$s20 $s20"),
      (4L, (1 to 25).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substrRemove(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L)._2 === 0L, "canonical copy stays intact")
    assert(out(1L)._3.startsWith("s1 s2"))
    assert(out(2L) === ((32L, 25L,
      "off " + (1 to 6).map(i => s"b$i").mkString(" "))))
    assert(out(3L) === ((40L, 20L, s20)))
    assert(out(4L) === ((25L, 0L, (1 to 25).map(i => s"u$i").mkString(" "))))
    // corpus run: the canonical pick keeps MAP-SIDE PARTIALS (the
    // linesRemoval trade — a shared raw occ exchange would forfeit
    // them and funnel a hot boilerplate window into one task), and no
    // window function appears anywhere
    val df = Dedup.dedupSubstrRemove(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("partial_min"), s"canonical pick must keep map-side partials:\n$plan")
    assert(!plan.contains("Window"), "canonical pick must be a keyed aggregate, not a window")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_removed") >= 0L)
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_tokens"))
    }
    // removal is consistent with the audit: a doc with zero duplicated
    // windows loses zero tokens
    val audited = Dedup.dedupSubstr(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows")).toMap
    rows.foreach { r =>
      if (audited.getOrElse(r.getAs[Long]("doc_id"), 0L) == 0L)
        assert(r.getAs[Long]("n_removed") === 0L)
    }
  }

  test("dedup_substr_remove: a canonical span overlapped by another run's mask survives verbatim") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // cross-run overlap: run Y (canonical in doc 1) reappears in doc 2
    // OVERLAPPING run X's canonical occurrence (X = y11..y20 z1..z10,
    // so doc 2 = y1..y20 z1..z10 hosts Y at pos 0 and X at pos 10);
    // doc 3 duplicates X.  Without the canonical exemption, Y's doc-2
    // mask [0,20) eats the first half of X's only full copy and the
    // cleaned corpus retains NO intact X anywhere — the round-7
    // approximation this rule change closes.
    val y = (1 to 20).map(i => s"y$i")
    val z = (1 to 10).map(i => s"z$i")
    val w5 = (1 to 5).map(i => s"w$i")
    val docs = Seq(
      (1L, y.mkString(" ")),                     // canonical Y
      (2L, (y ++ z).mkString(" ")),              // Y dup at 0, canonical X at 10
      (3L, (w5 ++ y.drop(10) ++ z).mkString(" "))) // X dup at 5
      .toDF("doc_id", "text")
    val out = Dedup.substrRemove(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((0L, y.mkString(" "))))
    // doc 2: only Y's non-exempt prefix [0,10) goes; X stays whole
    assert(out(2L) === ((10L, (y.drop(10) ++ z).mkString(" "))))
    // doc 3: its X occurrence is non-canonical → fully cut
    assert(out(3L) === ((20L, w5.mkString(" "))))
    // the invariant itself: every duplicated window still has a full
    // occurrence somewhere in the cleaned corpus
    val cleaned = out.values.map(_._2).toSeq
    Seq(y.mkString(" "), (y.drop(10) ++ z).mkString(" ")).foreach { run =>
      assert(cleaned.exists(_.contains(run)), s"run '$run' lost its last copy")
    }
  }

  test("dedup_lines removes corpus-frequent lines exactly and rebuilds surviving text in order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the 10-token boilerplate span occurs 3× corpus-wide (threshold);
    // the 'tail tokens' chunk only 2× (kept)
    val span = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$span tail tokens"),
      (3L, s"unique one two three four five six seven eight nine $span"),
      (4L, "tail tokens"),
      (5L, ""))
      .toDF("doc_id", "text")
    val out = Dedup.linesRemoval(docs, Dedup.chunkCol(col("text"), 10), 3, " ")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((2L, 1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    assert(out(2L) === ((2L, 1L, "tail tokens")))
    assert(out(3L) === ((2L, 1L,
      "unique one two three four five six seven eight nine")))
    assert(out(4L) === ((1L, 0L, "tail tokens")))
    assert(out(5L) === ((0L, 0L, "")))
    // corpus entry: decisions come back skinny, text never rides the
    // frequency exchange; the frequency count keeps its map-side
    // partials (hot-key safety) and the occ⋈freq probe stays a
    // skew-splittable SMJ, never a window over the line key
    val df = Dedup.dedupLines(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"frequency aggregate must combine map-side:\n$plan")
    assert(plan.contains("SortMergeJoin"), "occ-freq probe must be the merge-hinted SMJ")
    assert(!plan.contains("Window"), "line frequency must be a keyed aggregate, not a window")
    // conservation: clean_text token count = original − 10·full-removed
    // chunks (the final short chunk may hold fewer than 10 tokens)
    val kept = rows.map(r => r.getAs[String]("clean_text"))
      .map(t => if (t.trim.isEmpty) 0L else t.trim.split("\\s+").length.toLong).sum
    val orig = Tables.documents(spark, sf).select(col("text")).collect()
      .map(r => r.getString(0).trim.split("\\s+").count(_.nonEmpty).toLong).sum
    val removed = rows.map(_.getAs[Long]("n_removed")).sum
    assert(removed > 0, "sf corpus must contain >=3x boilerplate chunks")
    assert(kept >= orig - removed * 10 && kept < orig)
  }

  test("removeBoilerplateLines drops >=minOccurs newline-lines, preserves the rest verbatim") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep one\nBOILER LINE\nkeep two"),
      (2L, "BOILER LINE\nunique a"),
      (3L, "unique b\nBOILER LINE"),
      (4L, "no boiler here\nat all"))
      .toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(docs, minOccurs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((3L, 1L, "keep one\nkeep two")))
    assert(out(2L) === ((2L, 1L, "unique a")))
    assert(out(3L) === ((2L, 1L, "unique b")))
    assert(out(4L) === ((2L, 0L, "no boiler here\nat all")))
  }

  test("shingle DF cap bounds candidate volume under corpus-wide boilerplate") {
    import spark.implicits._
    // 60 docs that are pure boilerplate (one shared shingle — DF 60)
    // plus one planted near-dup pair with unique content.  Without the
    // cap the boilerplate shingle alone yields C(60,2)=1770 J=1.0
    // pairs; with DF cap 32 it is dropped from every set, so only the
    // planted pair survives.
    val boiler = (1L to 60L).map(i => (i, "the quick fox"))
    val planted = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1002L, "alpha beta gamma delta epsilon zeta eta theta"))
    val docs = (boiler ++ planted).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, 32).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(capped === Set((1001L, 1002L)))
    // sanity: an inert cap reproduces the uncapped explosion
    val uncapped = Dedup.ngramJaccardPairs(docs, 1000000).count()
    assert(uncapped === 60L * 59 / 2 + 1)
  }

  test("hot-shingle skew proof: one shingle in 50% of docs, per-key join input stays <= cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    // 2000 docs; half share ONE hot shingle (df = 1000, ~8x the
    // production cap of 128) with otherwise-unique content; two
    // planted near-dups hide among the hot half to show real dups
    // still surface WITH the boilerplate present.  This is the
    // engineered form of the 100 TB killer: without the cap the hot
    // key alone funnels C(1000,2) = 499500 candidates through the
    // join's hot task.
    val hot = (1L to 1000L).map(i => (i, s"aaa bbb ccc u${i}x u${i}y u${i}z"))
    val cold = (2001L to 3000L).map(i => (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f"))
    val planted = Seq(
      (5001L, "aaa bbb ccc same same same same words here"),
      (5002L, "aaa bbb ccc same same same same words here"))
    val docs = (hot ++ cold ++ planted).toDF("doc_id", "text")
    val cap = 128
    // the per-key bound the scaladoc claims, measured on the REAL
    // relation both join sides read: after the cap semi-join no
    // shingle carries more than `cap` rows, so per-key join work is
    // <= cap^2 and the hot key contributes NOTHING
    val perKey = Dedup.cappedShingles(docs, cap)
      .groupBy(col("shingle")).agg(count(lit(1)).as("n"))
    val maxKey = perKey.agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxKey <= cap, s"a shingle key entered the join with $maxKey > $cap rows")
    // candidate volume through the actual self-join path stays
    // corpus-linear: sum C(n_s, 2) over capped keys, vs 499500 from
    // the hot key alone uncapped
    val candidates = perKey.agg(sum(col("n") * (col("n") - 1))).collect()(0).getLong(0) / 2
    assert(candidates < 4L * 3002, s"candidate volume $candidates is not corpus-linear")
    // end-to-end: the planted pair is found, the hot shingle creates
    // no pair on its own
    val pairs = Dedup.ngramJaccardPairs(docs, cap).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs === Set((5001L, 5002L)))
  }

  test("dedup_keep_best keeps the largest member per component and conserves cluster mass") {
    val comps = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep")))
    val chars = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val byComp = comps.groupBy(_._2)
    val got = Dedup.dedupKeepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("comp") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("kept_doc"),
          r.getAs[Long]("kept_chars"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("chars_dropped")))
      .toMap
    assert(got.keySet === byComp.keySet)
    assert(got.nonEmpty)
    byComp.foreach { case (comp, members) =>
      val ids = members.map(_._1)
      val keep = ids.map(id => (id, chars(id))).minBy { case (id, c) => (-c, id) }
      val total = ids.map(chars).sum
      val (n, keptDoc, keptChars, tot, dropped) = got(comp)
      assert(n === ids.length.toLong, s"comp $comp")
      assert(keptDoc === keep._1, s"comp $comp")
      assert(keptChars === keep._2, s"comp $comp")
      assert(tot === total, s"comp $comp")
      assert(dropped === total - keep._2, s"comp $comp")
    }
    // every clustered doc is accounted for exactly once
    assert(got.values.map(_._1).sum === comps.length.toLong)
  }

  test("source_pair_overlap: conserves the pair graph under an unordered source rollup") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Dedup.sourcePairOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every near-dup pair lands in exactly one unordered source cell
    val nPairs = graft.operators.Dedup.dedupNgramJaccard(spark, sf).count()
    assert(rows.map(_._3).sum === nPairs)
    rows.foreach { case (a, b, n) =>
      assert(a <= b, s"unordered key violated: ($a, $b)")
      assert(n >= 1)
    }
    // the rollup key is unique (no split cells)
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }

  test("token_share_by_source equals the flag leaf's carried token counts, shares telescope") {
    import org.apache.spark.sql.functions.col
    val leaf = graft.operators.Pipeline.curationFlags(spark, sf)
      .select(col("source"), col("n_toks")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = leaf.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val total = leaf.map(_._2).sum
    val got = graft.operators.Pipeline.tokenShareBySource(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, (nd, nt)) =>
      assert(got(src) === ((nd, nt, nt * 1000000L / total)), src)
    }
    // ppm shares telescope to 1e6 within the floor-division slack
    val shareSum = got.values.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - got.size)
  }

  test("dup_cluster_sizes equals the component labels' size histogram plus singletons") {
    val comps = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep")))
    val want0 = comps.groupBy(_._2).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val singles = nDocs - comps.length
    val want = want0 + (1L -> (want0.getOrElse(1L, 0L) + singles))
    val got = Dedup.dupClusterSizes(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    got.foreach { case (size, (nc, nd)) => assert(nd === size * nc) }
    // conservation: every doc lands in exactly one cluster
    assert(got.values.map(_._2).sum === nDocs)
  }
}
