package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot
import graft.sources.Tables

/** End-to-end corpus cleaning: the composition a training-data
  * pipeline actually ships — near-dup cluster resolution keeps one
  * representative per cluster, a quality threshold drops low-signal
  * docs, and the survivors are the training corpus.
  *
  * Each stage is an already-verified operator ([[Dedup.dedupComponents]],
  * [[TextOps.textQuality]]); this query wires them with semi/anti
  * joins, so at 100 TB the corpus is scanned once per stage and the
  * join sides carry only doc ids.
  */
object Pipeline {

  def corpusClean(s: SparkSession, dir: String): DataFrame = {
    // docs that lost their dup cluster (everyone but the rep) — read
    // from the materialized component-label artifact (the sizes join
    // and presentation sort of the dedup_components query aren't needed
    // here)
    val nonReps = Dedup.nearDupComponentLabels(s, dir)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    // noPushdown on the two signal thresholds: without it the
    // optimizer pushes each predicate below the scan-widening
    // exchange, substituting the FULL signal computation into a
    // Filter at the parquet scan's effective width — single-task on a
    // one-row-group export (measured r20 at sf10: 37.7 s + 24.6 s
    // serial stages, task ≈ wall), and then recomputes the signal
    // above the exchange anyway.  The wrapper pins the filter where
    // it is written: above the signal projection, at cluster width,
    // one evaluation per row (see [[graft.functions.NoPushdown]]).
    val goodQuality = TextOps.textQuality(s, dir)
      .filter(graft.functions.NoPushdown.noPushdown(col("quality") >= 0.5))
      .select(col("doc_id"), col("quality"))
    // Gopher-style repetition gate: drop looping/boilerplate docs whose
    // duplicated-2-gram mass reaches 0.5.  Inert on this synthetic
    // corpus (max observed 0.27 at sf0.01) but the production filter a
    // real pipeline runs — one more zero-shuffle scan, doc-id-only
    // semi side.
    val lowRepetition = TextOps.textRepetition(s, dir)
      .filter(graft.functions.NoPushdown.noPushdown(col("dup_2gram_frac") < 0.5))
      .select(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .join(goodQuality, Seq("doc_id"))
      .join(lowRepetition, Seq("doc_id"), "left_semi")
      .join(nonReps, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-sampled corpus mixing: per-source keep rates derived
    * from the data (rate_s = √(tokens_s / max_tokens) — the α = 0.5
    * temperature that upweights small sources relative to proportional
    * sampling), applied as a deterministic per-doc md5-threshold keep.
    * This is the mixture-reweighting step between curation and
    * training: rates come from one tiny per-source aggregate (|sources|
    * rows) joined back BROADCAST onto a second narrow scan, and the
    * keep decision is pure per-row hashing — reproducible on any
    * engine and any partitioning, no corpus-sized shuffle anywhere.
    *
    * The hex-threshold compare pads both sides to 5 digits
    * ('0'+hash16 vs %05x of the cutoff) so a full-keep source
    * (cutoff = 65536 = '10000') orders correctly above every 16-bit
    * hash — string compare of equal-length hex IS the numeric compare,
    * and both engines format/compare identically.
    */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"))
    val perSrc = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_s"))
    val mx = perSrc.agg(max(col("tok_s")).as("mx"))
    val rates = perSrc.join(broadcast(mx))
      .withColumn("rate", sqrt(col("tok_s").cast("double") / col("mx").cast("double")))
      .withColumn("cutoff", floor(col("rate") * 65536).cast("long"))
    val kept = d.join(broadcast(rates.select(col("source"), col("cutoff"))), "source")
      .filter(concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4))
        < format_string("%05x", col("cutoff")))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.select(col("source"), col("n_docs"), col("tok_s"), col("rate"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tok_s"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Target-mixture resampling — [[sourceMix]] DERIVES a mixture from
    * the data (√ temperature); this APPLIES one the caller chose (the
    * DoReMi/Pile shape: domain weights come out of a separate
    * optimization or an editorial decision, and the pipeline's job is
    * to hit them).  Keep rates are scaled so the most-upweighted
    * source keeps everything — `rate_s = (w_s·T/tok_s) / max_t(...)`
    * — which is the unique downsampling-only solution whose kept
    * mixture is proportional to the targets with maximal data
    * retention (you cannot sample a source ABOVE 1.0 without
    * duplication, which is an epochs decision, not a filter).
    * Sources absent from the weight map are EXCLUDED — a mixture plan
    * defines the corpus, and a dropped source is visible as a missing
    * row in this audit.
    *
    * Same scale shape as [[sourceMix]]: one |sources|-row aggregate,
    * rates broadcast back onto a second narrow scan, keep = pure
    * per-row md5 threshold (the equal-width padded-hex compare), one
    * bounded-key aggregate — no corpus-sized shuffle.  The audit
    * reports achieved vs target share; they differ only by the
    * 16-bit cutoff quantization and per-source hash luck, both of
    * which vanish in relative terms as docs-per-source grows.
    *
    * Input: (doc_id, source, tok).  Output per source: docs/tokens
    * before, target weight, rate, docs/tokens kept, achieved token
    * share of the kept corpus.
    */
  def importanceResample(docs: DataFrame,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "importanceResample needs a non-empty all-positive weight map")
    val s = docs.sparkSession
    import s.implicits._
    val w = weights.toSeq.sortBy(_._1).toDF("source", "target_w")
    val perSrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_s"))
    val tot = perSrc.agg(sum(col("tok_s")).as("tot"))
    // ratio_s = w_s·T / tok_s (how far each source is below its
    // target); dividing by the max makes the binding source keep 1.0.
    // Expression order is pinned (w·T then ÷tok_s, ratio÷max, ·65536)
    // so any engine replays the identical IEEE sequence.
    val rel = perSrc.join(broadcast(w), "source")
      .join(broadcast(tot))
      .withColumn("ratio",
        col("target_w") * col("tot").cast("double") / col("tok_s").cast("double"))
    val mx = rel.agg(max(col("ratio")).as("mxr"))
    val rates = rel.join(broadcast(mx))
      .withColumn("rate", col("ratio") / col("mxr"))
      .withColumn("cutoff", floor(col("rate") * 65536).cast("long"))
    val kept = docs
      .join(broadcast(rates.select(col("source"), col("cutoff"))), "source")
      .filter(concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4))
        < format_string("%05x", col("cutoff")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tok_kept"))
    val keptTot = kept.agg(sum(col("tok_kept")).as("kt"))
    rates
      .select(col("source"), col("n_docs"), col("tok_s"), col("target_w"), col("rate"))
      .join(kept, Seq("source"), "left")
      .join(broadcast(keptTot))
      .select(col("source"), col("n_docs"), col("tok_s"), col("target_w"),
        col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tok_kept"), lit(0L)).as("tok_kept"),
        (coalesce(col("tok_kept"), lit(0L)).cast("double") / col("kt").cast("double"))
          .as("achieved_share"))
      .orderBy(col("source"))
  }

  /** Driver entry: resample `documents` to a linear-ramp target
    * mixture (src_i weighted i+1 — deliberately far from the corpus's
    * near-uniform natural mixture, so every rate is exercised from
    * ~1/20 up to the binding 1.0).
    */
  def importanceResampleDocs(s: SparkSession, dir: String): DataFrame =
    importanceResample(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok")),
      (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap)

  /** Mixture PLANNING table — the decision [[importanceResample]]
    * executes half of: given target domain weights and a total token
    * budget for the training run, report per source how many tokens
    * are wanted, what fraction of one pass that is (`epochs` — the
    * number a data-mixture meeting actually argues about), the
    * downsampling rate where epochs < 1, and the replication passes
    * where epochs > 1 (a bigger-than-natural share cannot be sampled
    * into existence — it is re-reads, with the diminishing-returns
    * cost that implies; surfacing it IS the point of the table).
    *
    * Pure arithmetic over the |sources|-row aggregate — one scan, one
    * bounded aggregate, one broadcast of a 1-row total.  IEEE order
    * pinned (w/Σw, ·T, ÷tok_s) for exact oracle replay.
    *
    * Input: (source, tok) rows + weights + budget.  Output per
    * source: tok_s, target_w (normalized), target_tok, epochs,
    * sample_rate = min(1, epochs), n_passes = ⌈epochs⌉.
    */
  def mixturePlan(docs: DataFrame, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0) && totalTokens > 0,
      "mixturePlan needs positive weights and a positive token budget")
    val s = docs.sparkSession
    import s.implicits._
    val wsum = weights.values.sum
    val w = weights.toSeq.sortBy(_._1).map { case (k, v) => (k, v / wsum) }
      .toDF("source", "target_w")
    val perSrc = docs.groupBy(col("source")).agg(sum(col("tok")).as("tok_s"))
    perSrc.join(broadcast(w), "source")
      .withColumn("target_tok", col("target_w") * lit(totalTokens.toDouble))
      .withColumn("epochs", col("target_tok") / col("tok_s").cast("double"))
      .select(col("source"), col("tok_s"), col("target_w"), col("target_tok"),
        col("epochs"),
        least(lit(1.0), col("epochs")).as("sample_rate"),
        ceil(col("epochs")).cast("long").as("n_passes"))
      .orderBy(col("source"))
  }

  /** Driver entry: plan the linear-ramp mixture of
    * [[importanceResampleDocs]] against a 200k-token budget — sized so
    * light-weighted sources plan a sub-pass sample while heavy ones
    * need multiple replication passes.
    */
  def mixturePlanDocs(s: SparkSession, dir: String): DataFrame =
    mixturePlan(
      Tables.documents(s, dir).select(col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok")),
      (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap, 200000L)

  /** Mixture MATERIALIZATION — executes the whole [[mixturePlan]],
    * both regimes: every doc of source s is emitted ⌊epochs_s⌋ times
    * (full replication passes), plus one more copy iff its 16-bit md5
    * prefix clears the FRACTIONAL pass's threshold (the
    * [[importanceResample]] idiom), so per source the expected output
    * token mass is tok_s·epochs = its target share exactly, and every
    * copy decision is a pure function of (doc_id, plan) —
    * reproducible on any engine, any partitioning, any run.  The
    * fractional pass reuses the SAME hash as full passes' docs (a doc
    * is either in the partial epoch or not — matching how a real run
    * truncates its last pass), and `copy_idx` distinguishes replicas
    * downstream (e.g. [[shuffleShards]] on (doc_id, copy_idx) spreads
    * them apart).
    *
    * Scale shape: the |sources|-row plan broadcasts onto one narrow
    * scan; copies are a map-side `posexplode(sequence)` bounded by
    * ⌈epochs⌉ ≤ n_passes per row — no corpus-sized shuffle, no RNG
    * state.  Output: (doc_id, source, copy_idx).
    */
  def mixtureApply(docs: DataFrame, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    val plan = mixturePlan(docs, weights, totalTokens)
      .select(col("source"), col("epochs"))
    val frac = col("epochs") - floor(col("epochs")).cast("double")
    val rates = plan
      .withColumn("full_copies", floor(col("epochs")))
      .withColumn("cutoff", floor(frac * 65536).cast("long"))
    docs
      .join(broadcast(rates.select(col("source"), col("full_copies"), col("cutoff"))),
        "source")
      .withColumn("n_copies",
        col("full_copies") +
          when(concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4))
            < format_string("%05x", col("cutoff")), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        posexplode(sequence(lit(0L), col("n_copies") - 1)).as(Seq("pos", "copy_idx")))
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  /** Driver entry: materialize the [[mixturePlanDocs]] plan (same ramp
    * weights, same 200k budget); doc-level copy list, oracle-exact.
    */
  def mixtureApplyDocs(s: SparkSession, dir: String): DataFrame =
    mixtureApply(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok")),
      (0 until 20).map(i => s"src$i" -> (i + 1).toDouble).toMap, 200000L)

  /** Deterministic corpus SHUFFLE + sharding — the example-ordering
    * step every training pipeline runs between curation and packing
    * (consecutive examples from one source/crawl correlate; training
    * wants them scattered).  Each doc's shuffle key is
    * md5(doc_id) — reproducible on any engine, any partitioning, any
    * run — its shard is the key's top 4 hex digits mod `shards`, and
    * its position within the shard is its key rank there, so the full
    * (shard, pos) order is a pure function of doc ids: re-running on
    * re-partitioned (or re-ingested) data yields the SAME training
    * order, which is what makes a loss curve reproducible.
    *
    * Scale shape: one exchange on the shard key, then a per-shard
    * sort + rank — a global shuffle IS a sort, so the sort is the
    * operator's honest cost, but it runs per shard (corpus/`shards`
    * rows each, `shards` sized so a shard fits a task's spill
    * budget) and ranks stream (row_number buffers nothing).  The
    * md5-ordering trick means no RNG state anywhere — the "shuffle"
    * is hash ordering, the standard deterministic-shuffle idiom.
    */
  def shuffleShards(docs: DataFrame, shards: Int): DataFrame = {
    require(shards > 0 && shards <= 256, s"need 0 < shards <= 256, got $shards")
    val key = md5(col("doc_id").cast("string"))
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    // hex digit → value via position in the digit alphabet: the one
    // hex→int idiom BOTH engines express identically (DuckDB has no
    // conv/strtol — SURVEY §5); the key's top byte picks the shard,
    // so doc order WITHIN a shard (by full key) is independent of the
    // shard count
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substring(skey, $i, 1)) - 1")
    docs
      .select(col("doc_id"), key.as("skey"))
      .withColumn("shard", ((nib(1) * 16 + nib(2)) % shards).cast("int"))
      .withColumn("pos", row_number().over(byShard).cast("long") - 1)
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Driver entry: 8 shards over `documents`. */
  def shuffleShardsDocs(s: SparkSession, dir: String): DataFrame =
    shuffleShards(Tables.documents(s, dir).select(col("doc_id")), 8)
      .orderBy(col("shard"), col("pos"))

  /** Deterministic train/validation/test split — held-out sets that
    * stay stable across runs, re-partitions and re-ingests because
    * membership is a pure per-doc hash threshold (the [[sourceMix]]
    * idiom: equal-width padded-hex compare, identical in Spark and
    * any SQL engine).  Fractions are in 16-bit units: a doc lands in
    * `train` if its 16-bit md5 prefix < 0.90·65536, `val` below
    * 0.95·65536, else `test`.  Per-doc assignment is map-side only;
    * the driver entry reports the per-source × split composition (the
    * leakage-audit view: a source skewed into test is a red flag) —
    * one bounded-key aggregate.
    */
  def splitAssign(docs: DataFrame,
      trainFrac: Double = 0.90, valFrac: Double = 0.05): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"need 0 < trainFrac, 0 <= valFrac, trainFrac+valFrac < 1; got $trainFrac/$valFrac")
    val h = concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4))
    val trainCut = format_string("%05x", lit(math.floor(trainFrac * 65536).toLong))
    val valCut = format_string("%05x", lit(math.floor((trainFrac + valFrac) * 65536).toLong))
    docs.withColumn("split",
      when(h < trainCut, "train").when(h < valCut, "val").otherwise("test"))
  }

  /** Leakage-guarded split: [[splitAssign]]'s hash threshold applied
    * to the near-dup COMPONENT representative instead of the doc id,
    * so a whole near-duplicate cluster always lands on ONE side of
    * the train/val/test cut.  This is the split a careful pipeline
    * actually needs: under per-doc splitting, a doc and its near-copy
    * routinely straddle train and test, silently leaking the test
    * set into training ("contamination by duplication" — the failure
    * decontaminate audits after the fact, prevented here by
    * construction).  Docs with no near-dup neighbor group as
    * themselves.  Per-doc cost beyond [[Dedup.dedupComponents]] is
    * one doc_id-keyed left join (the components side holds only
    * docs WITH neighbors — small relative to the corpus, AQE
    * broadcast at typical dup rates) and a map-side hash.
    */
  private[graft] def splitAssignGroupedRows(s: SparkSession, dir: String,
      trainFrac: Double = 0.90, valFrac: Double = 0.05): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val reps = Dedup.nearDupComponentLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("rep"))
    val keyed = docs.join(reps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("grp"))
    val h = concat(lit("0"), substring(md5(col("grp").cast("string")), 1, 4))
    val trainCut = format_string("%05x", lit(math.floor(trainFrac * 65536).toLong))
    val valCut = format_string("%05x", lit(math.floor((trainFrac + valFrac) * 65536).toLong))
    keyed.withColumn("split",
      when(h < trainCut, "train").when(h < valCut, "val").otherwise("test"))
  }

  /** Driver entry: per-split doc and group counts under the
    * group-keyed 90/5/5 cut. */
  def splitAssignGrouped(s: SparkSession, dir: String): DataFrame =
    splitAssignGroupedRows(s, dir)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("grp")).as("n_groups"))
      .orderBy(col("split"))

  /** Driver entry: 90/5/5 split composition by source. */
  def splitAssignDocs(s: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("source"), col("split"))

  /** Sequence-packing plan statistics: how efficiently the corpus fills
    * fixed-capacity training windows (cap = 512 tokens).  Docs are
    * classed by `per_bin` = ⌊cap / tokens⌋ (how many same-class docs
    * share one window under homogeneous next-fit); per class the bin
    * count is pure integer arithmetic, so the whole report is one scan
    * + a bounded-key aggregate — NO corpus-wide sort or row numbering
    * (a global first-fit assignment would need one; the padding-waste
    * numbers a pipeline actually plans with don't).  Oversized docs
    * (tokens > cap) land in per_bin = 1 with utilization > 1 — the
    * signal they need truncation/splitting upstream.
    */
  def packStats(s: SparkSession, dir: String): DataFrame =
    packStatsOver(Tables.documents(s, dir),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"), 512)

  /** [[packStats]] in MODEL-token units: the same windows-and-waste
    * report with per-doc cost = `bpe_token_count` under the bundled
    * merges — the number that actually bills against a context
    * window (a "512-token" window of whitespace tokens overfills once
    * subwords split).  BPE is an iterative rewrite system, not SQL →
    * rows-only driver oracle; the spec pins this frame against an
    * independently computed replica over segment().
    */
  def packStatsBpe(s: SparkSession, dir: String): DataFrame =
    packStatsOver(Tables.documents(s, dir),
      graft.functions.Bpe.bpeTokenCount(
        graft.functions.TextFunctions.tokens(col("text")),
        graft.functions.Bpe.default), 512)

  /** Shared packing-report tail over any per-doc token cost column
    * (the [[graft.operators.TextOps]] `tokenHistogramOver` shape).
    */
  private def packStatsOver(docs: DataFrame, tok: Column, cap: Int): DataFrame = {
    docs
      .select(tok.as("tok"))
      .select(col("tok"),
        greatest(lit(1L), floor(lit(cap) / greatest(col("tok"), lit(1L))).cast("long")).as("per_bin"))
      .groupBy(col("per_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
      .withColumn("n_bins",
        floor((col("n_docs") + col("per_bin") - 1) / col("per_bin")).cast("long"))
      .withColumn("utilization",
        col("tokens").cast("double") / (col("n_bins") * cap).cast("double"))
      .orderBy(col("per_bin"))
  }

  /** The actual doc→window assignment: next-fit packing WITHIN each
    * partition (packing is inherently sequential, so the honest
    * distributed form is per-partition streaming — ladder step (d),
    * the one place iterator order is the algorithm).  Bins never mix
    * partitions: bin_id = (partition << 32) | local counter, docs are
    * packed in doc_id order within the partition, and a bin is closed
    * when the next doc would overflow `cap` (a doc larger than cap
    * gets a bin alone).  Deterministic for a fixed partitioning;
    * repartition first if cross-run bin identity matters.
    * Input: (doc_id, tok); output: (doc_id, tok, bin_id).
    */
  def packNextFit(docs: DataFrame, cap: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"), col("tok").cast("long")).as[(Long, Long)]
      .sortWithinPartitions("doc_id")
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = 0L
        var used = 0L
        it.map { case (id, tok) =>
          if (used > 0 && used + tok > cap) { bin += 1; used = 0L }
          used += tok
          (id, tok, (pid << 32) | bin)
        }
      }.toDF("doc_id", "tok", "bin_id")
  }

  /** The packing story's MATERIALIZATION step — [[packStats]] reports,
    * [[packNextFit]] assigns, this RENDERS: one row per bin with the
    * member docs' text concatenated in doc_id order around a separator
    * token, plus the fill statistics a data loader checks (n_docs,
    * n_tokens, the capacity, slack).  Input: (doc_id, tok, text);
    * output: (bin_id, n_docs, n_tokens, slack, packed_text).
    *
    * Scale shape: the bin assignment rides [[packNextFit]]'s
    * per-partition stream; rendering is ONE exchange on bin_id whose
    * per-bin state is bounded by the capacity itself (a bin holds ≤cap
    * tokens of text by construction — the aggregate cannot
    * accumulate more than the training window it renders).  Text
    * order inside a bin is pinned by sort_array over (doc_id, text)
    * structs, so the rendered sequence is deterministic under any
    * merge order; bins never span partitions, so re-rendering a shard
    * touches only its partition.  Deterministic for a fixed input
    * partitioning (the [[packNextFit]] contract); the driver entry
    * hash-repartitions on doc_id first so the gate sees one canonical
    * layout.
    */
  def packRender(docs: DataFrame, cap: Int, sep: String = "<|doc|>"): DataFrame =
    packNextFit(docs.select(col("doc_id"), col("tok")), cap)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sort_array(collect_list(struct(col("doc_id"), col("text")))).as("members"))
      .select(col("bin_id"), col("n_docs"), col("n_tokens"),
        greatest(lit(cap.toLong) - col("n_tokens"), lit(0L)).as("slack"),
        array_join(expr("transform(members, m -> m.text)"), s" $sep ").as("packed_text"))

  /** Driver entry: 512-token next-fit bins over `documents`, rendered.
    * Hash-repartitioned on doc_id to 8 partitions so bin identity is a
    * pure function of the data (not the scan's split layout); ordered
    * by bin_id for a stable presentation.
    */
  def packRenderDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok"),
        col("text"))
      .repartition(8, col("doc_id"))
    packRender(d, 512).orderBy(col("bin_id"))
  }

  /** Text-file ingestion round-trip, 128-bit id edition — the driver
    * path for [[graft.sources.Formats.readTextLines128]] (its 64-bit
    * sibling is the ingest default; until this query only ScalaTest
    * ever exercised the two-lane id).  The corpus is materialized as
    * REAL one-doc-per-line text files (`partitionBy(source)` after a
    * by-source repartition, so each source is exactly one part file
    * and identical lines within a source share a file — the layout
    * [[graft.sources.Formats.readTextLines]] documents), read back
    * through the two-seed 128-bit id path, and audited per source:
    * line count, distinct 64-bit ids, distinct 128-bit id pairs.
    * Oracle-checkable because (file, line) distinctness ≡
    * (source, text) distinctness under this layout and xxhash64
    * collisions are negligible at test scale (~n²/2⁶⁵; the operator's
    * documented bound — a collision would surface as an
    * oracle-visible count drop).
    *
    * The one-file-per-source repartition is the DIAGNOSTIC's layout
    * choice, not the ingest path's: real ingestion reads files that
    * already exist, splittable and parallel per file.  The write is
    * a temp-dir side effect, overwritten per run.
    */
  def ingestText128(s: SparkSession, dir: String): DataFrame = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_text128_" + new java.io.File(dir).getName).getAbsolutePath
    Tables.documents(s, dir).select(col("source"), col("text"))
      .repartition(col("source"))
      .write.mode("overwrite").partitionBy("source").text(tmp)
    graft.sources.Formats.readTextLines128(s, tmp)
      .select(regexp_extract(col("src_file"), "source=([^/]+)/", 1).as("source"),
        col("doc_id"), col("doc_id2"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("doc_id")).as("n_id64"),
        countDistinct(col("doc_id"), col("doc_id2")).as("n_id128"))
      .orderBy(col("source"))
  }

  /** The curation funnel — per-stage document/token attrition across
    * the full cleaning ladder in ONE report: raw → exact dedup (keep
    * min doc_id per full-normalized-text fingerprint) → near-dup (keep
    * the smallest surviving member of each 3-gram-Jaccard component,
    * read from the materialized label artifact) → decontaminate (drop
    * eval-overlapping docs: the corpus's even/odd eval split, capped
    * 5-gram shingle match — [[Dedup.decontaminate]]'s exact relation)
    * → Gopher doc rules → C4 doc rules → (round 14) the SELECTION
    * stages: source_mix's √-temperature per-source keep (rates derived
    * from the cleaned survivors, the order a real pipeline selects in)
    * → the deterministic 0.90 train split — so the funnel runs raw →
    * clean → SELECTED, end to end.  This is the first dashboard a
    * corpus curator reads, and it exercises the LADDER'S COMPOSITION:
    * every count is an exact integer, so the whole funnel is
    * oracle-checked end-to-end, conservation included
    * (docs_in − docs_removed = docs_out, stage k's in = k−1's out).
    *
    * `removed_alone` is each filter's standalone removal count on the
    * RAW corpus — the number a curator compares against the cumulative
    * column to see overlap between filters, and the value that keeps
    * every stage's semantics gate-pinned even when an upstream stage
    * (Gopher on this synthetic corpus) empties the funnel: the
    * mixture/split hash-threshold machinery is exercised and
    * oracle-bound through the standalone columns at any funnel state.
    *
    * Scale shape: one corpus scan feeds the per-doc flag columns,
    * materialized once at a skinny eager checkpoint; the fp/component
    * windows shuffle skinny (id, key) rows; the selection rates are
    * two |sources|-row aggregates broadcast back; the stage algebra
    * is a single 8-row stack over one aggregate row — at 100 TB this
    * is strictly cheaper than running the eight stage queries
    * separately (shared scan, shared shingle artifacts).
    */
  /** The shared stage-1–6 flag pipeline under [[curationReport]] and
    * [[curationBySource]]: one corpus scan joined to the cleaning-stage
    * verdicts, k1–k5 survival flags MATERIALIZED once per corpus
    * snapshot through the [[graft.sources.Materialize]] seam (the same
    * discipline as the pair/edge substrates — before round 15 each
    * consumer rebuilt the leaf per CALL behind a session-lifetime
    * localCheckpoint, so a fresh session re-ran the fingerprint/
    * component windows once per consumer).  Both consumers now read
    * one plain FileScan of the skinny flag relation; flags are longs/
    * booleans/strings, so parquet read-back is bit-identical and both
    * oracles are unchanged by construction.
    */
  private[graft] def curationFlags(s: SparkSession, dir: String): DataFrame =
    graft.sources.Materialize.readOrBuildMaintained(s, "curation_flags",
      inputs = Seq(s"$dir/documents.parquet"),
      params = Seq("ver" -> "1"))(curationFlagsBuild(s, dir)) {
      (prevFlags, prevFiles, deltaFiles) =>
        curationFlagsDelta(s, dir, prevFlags, prevFiles, deltaFiles)
    } { (prevFlags, prevStats, removedFiles) =>
      curationFlagsDelete(s, dir, prevFlags, prevStats, removedFiles)
    }

  /** The flag leaf's column contract — full build and delta both end
    * on this exact order, so delta-built and full-built artifacts are
    * interchangeable to every consumer.
    */
  private val FlagCols = Seq("doc_id", "source", "n_toks", "fp", "comp",
    "decon", "g_keep", "c_keep", "k1", "k2", "a2", "k3", "k4", "k5", "h")

  /** The ROW-LOCAL flag columns — everything derivable from one doc's
    * own text (token count, fingerprint, Gopher/C4 keeps, the split
    * hash).  The delta computes these for APPENDED docs only; an old
    * doc's row-locals are immutable and carry from the prior artifact.
    */
  private def rowLocalFlags(docs: DataFrame): DataFrame = {
    val gk = TextOps.qualityGopherFlags(docs).select(col("doc_id"), col("keep").as("g_keep"))
    val ck = TextOps.qualityC4Flags(docs).select(col("doc_id"), col("keep").as("c_keep"))
    docs.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .join(gk, Seq("doc_id")).join(ck, Seq("doc_id"))
      .withColumn("h", concat(lit("0"), substring(md5(col("doc_id").cast("string")), 1, 4)))
  }

  /** Decon verdicts from the capped 5-gram index: test-side (even
    * doc_id) docs sharing ≥ 1 capped shingle with a train (odd) doc —
    * the exact verdict set of [[Dedup.decontaminate]] (same explode,
    * same cap, existence instead of counts), read from the
    * materialized index so the flag delta can maintain it without a
    * corpus re-scan.
    */
  private def deconFlagsFrom(idx5: DataFrame): DataFrame =
    idx5.filter(col("doc_id") % 2 === 0)
      .join(idx5.filter(col("doc_id") % 2 === 1).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("decon", lit(true))

  private def curationFlagsBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a full (re)build compacts: pay the 5-gram DF + capped-index
    // sidecars for the whole snapshot NOW (the eager-sidecar
    // discipline — the explode runs once and the first append's delta
    // then reads both as cache hits); the decon stage reads the index
    // FileScan, value-identical to the inline Dedup.decontaminate set
    val files = graft.sources.Materialize.listFiles(s, s"$dir/documents.parquet")
    Dedup.deconBaseDf(s, files)
    val decon = deconFlagsFrom(Dedup.deconIndexFiles(s, files))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
    val comp = Dedup.nearDupComponentLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    val base = rowLocalFlags(docs)
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .join(decon, Seq("doc_id"), "left")
      .withColumn("decon", coalesce(col("decon"), lit(false)))
    // flag columns materialize ONCE (parquet artifact, via the seam
    // above): the |sources|-row rate aggregates and the consumer
    // funnel/matrix aggregates all read this skinny leaf instead of
    // re-running the fp/comp windows per consumer — still one corpus
    // scan total
    base
      .withColumn("k1", col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .withColumn("k2", col("k1") && col("doc_id") ===
        min(when(col("k1"), col("doc_id"))).over(Window.partitionBy(col("comp"))))
      .withColumn("a2", col("doc_id") === col("comp"))
      .withColumn("k3", col("k2") && !col("decon"))
      .withColumn("k4", col("k3") && col("g_keep"))
      .withColumn("k5", col("k4") && col("c_keep"))
      .select(FlagCols.map(col): _*)
  }

  /** Append maintenance for the flag leaf (round 16) — previously the
    * last full-rebuild-per-snapshot substrate.  An append changes:
    *
    *  - the APPENDED docs' rows — row-local stages computed fresh;
    *  - `comp` — read from the (upstream delta-maintained) label
    *    artifact, joined corpus-wide exactly as the full build does;
    *  - `decon` — recomputed ONLY for the dirty evens: evens sharing a
    *    still-capped 5-gram with an appended ODD doc (new train
    *    evidence), evens holding a shingle the append pushed OVER the
    *    DF cap (lost evidence — under append, flips are under→over
    *    only), and the appended docs themselves — over the
    *    lazily-composed index (base FileScan ∪ appended explode,
    *    merged-DF cap: the [[Dedup]] pair-delta LSM shape);
    *  - `k1` — re-elected only inside fp groups the append touched;
    *  - `k2` — re-elected only inside comp groups holding an appended
    *    doc, a comp-changed doc, or a k1-changed doc;
    *  - `a2`/`k3..k5` — pure projections over the merged columns.
    *
    * Everything else carries from the prior artifact bit-identically.
    * Election re-runs are SUBSET windows (semi-join the touched group
    * keys, window the subset, union the untouched rows back) — no
    * corpus-wide fp/comp shuffle; the touched-key joins are un-hinted
    * so AQE sizes them from measurement (the knnCollisionHits
    * discipline, since MaxAppendFraction admits huge absolute appends
    * at large corpora).  Saved vs full: the corpus text re-scan
    * (tokenize + Gopher + C4 + fingerprint over every old doc), the
    * decon explode + bipartite join, and both corpus-wide election
    * windows; the floor is the artifact rewrite plus one linear pass
    * over the composed 5-gram index.
    *
    * Declines (→ full rebuild, which compacts): appended bytes past
    * [[Dedup.maxAppendFraction]]; the decon sidecars or the
    * base-aligned flags artifact missing.
    */
  private def curationFlagsDelta(s: SparkSession, dir: String, prevFlags: DataFrame,
      prevFiles: Seq[String], deltaFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val M = graft.sources.Materialize
    if (M.totalBytes(s, deltaFiles) >
        Dedup.maxAppendFraction(s) * M.totalBytes(s, prevFiles)) return null
    // alignment at the BASE snapshot (the one whose decon index
    // exists) — appends accumulate against one base until a full
    // rebuild compacts
    val prior = M.readPrior(s, "decon_index",
      Seq(s"$dir/documents.parquet"), Dedup.deconIdxParams)
    if (prior.isEmpty) return null
    val (baseIdx5, baseFiles) = prior.get
    val appended = ((prevFiles ++ deltaFiles).toSet -- baseFiles).toSeq.sorted
    if (appended.isEmpty) return null
    val baseFlags =
      if (baseFiles.toSet == prevFiles.toSet) prevFlags
      else M.readIfFresh(s, "curation_flags", baseFiles, Seq("ver" -> "1"))
        .getOrElse(return null)
    val appendedDocs = graft.sources.Scan.parquet(s, appended: _*)
      .select(col("doc_id"), col("text"), col("source"))
    // ---- decon maintenance over the composed capped index ----
    val appSh5 = Dedup.exploded5(appendedDocs)
    val totalDf5 = Dedup.deconBaseDf(s, baseFiles)
      .unionByName(appSh5.groupBy(col("shingle")).agg(count(lit(1)).as("df")))
      .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
    val keep5 = totalDf5.filter(col("df") <= Dedup.ShingleDfCap).select(col("shingle"))
    val composed5 = baseIdx5.unionByName(appSh5)
      .join(keep5, Seq("shingle"), "left_semi")
      .repartition(col("shingle"))
      .localCheckpoint(eager = false)
    val flipped = baseIdx5.select(col("shingle")).distinct()
      .join(keep5, Seq("shingle"), "left_anti")
    val appOddSh = appSh5.filter(col("doc_id") % 2 === 1)
      .join(keep5, Seq("shingle"), "left_semi")
      .select(col("shingle")).distinct()
    val dirtyDecon = composed5.filter(col("doc_id") % 2 === 0)
        .join(appOddSh, Seq("shingle"), "left_semi").select(col("doc_id"))
      .unionByName(baseIdx5.join(flipped, Seq("shingle"), "left_semi")
        .filter(col("doc_id") % 2 === 0).select(col("doc_id")))
      .unionByName(appendedDocs.select(col("doc_id")))
      .distinct()
      .localCheckpoint(eager = false)
    val deconNew = composed5.filter(col("doc_id") % 2 === 0)
      .join(dirtyDecon, Seq("doc_id"), "left_semi")
      .join(composed5.filter(col("doc_id") % 2 === 1).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("dnew", lit(true))
    // ---- assemble: carried row-locals + fresh rows, then comp ----
    val carried = baseFlags.select(col("doc_id"), col("source"), col("n_toks"),
      col("fp"), col("g_keep"), col("c_keep"), col("h"),
      col("comp").as("comp_old"), col("decon").as("decon_old"),
      col("k1").as("k1_old"), col("k2").as("k2_old"))
    val fresh = rowLocalFlags(appendedDocs)
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("fp"), col("g_keep"), col("c_keep"), col("h"),
        lit(null).cast("long").as("comp_old"),
        lit(null).cast("boolean").as("decon_old"),
        lit(null).cast("boolean").as("k1_old"),
        lit(null).cast("boolean").as("k2_old"))
    val labels = Dedup.nearDupComponentLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    val withComp = carried.unionByName(fresh)
      .join(labels, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val withDecon = withComp
      .join(dirtyDecon.withColumn("ddirty", lit(true)), Seq("doc_id"), "left")
      .join(deconNew, Seq("doc_id"), "left")
      .withColumn("decon", when(col("ddirty").isNotNull,
        coalesce(col("dnew"), lit(false)))
        .otherwise(coalesce(col("decon_old"), lit(false))))
      .drop("ddirty", "dnew")
      .localCheckpoint(eager = false)
    // ---- k1: re-elect only fp groups the append touched ----
    val touchedFps = fresh.select(col("fp")).distinct()
    val withK1 = withDecon.join(touchedFps, Seq("fp"), "left_semi")
      .withColumn("k1", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .unionByName(withDecon.join(touchedFps, Seq("fp"), "left_anti")
        .withColumn("k1", col("k1_old")))
      .localCheckpoint(eager = false)
    // ---- k2: re-elect comps holding any appended / comp-changed /
    // k1-changed doc ----
    val touchedComps = withK1.filter(col("comp_old").isNull ||
        col("comp") =!= col("comp_old") || col("k1_old").isNull ||
        col("k1") =!= col("k1_old"))
      .select(col("comp")).distinct()
    val withK2 = withK1.join(touchedComps, Seq("comp"), "left_semi")
      .withColumn("k2", col("k1") && col("doc_id") ===
        min(when(col("k1"), col("doc_id"))).over(Window.partitionBy(col("comp"))))
      .unionByName(withK1.join(touchedComps, Seq("comp"), "left_anti")
        .withColumn("k2", col("k2_old")))
    withK2
      .withColumn("a2", col("doc_id") === col("comp"))
      .withColumn("k3", col("k2") && !col("decon"))
      .withColumn("k4", col("k3") && col("g_keep"))
      .withColumn("k5", col("k4") && col("c_keep"))
      .select(FlagCols.map(col): _*)
  }

  /** Takedown maintenance for the flag leaf (round 17) — the symmetric
    * twin of [[curationFlagsDelta]], closing the last full-rebuild
    * mutation path (r16 left the leaf append-delta only, so a GDPR
    * takedown forced the ~98.6 s-at-sf10 full rebuild).  A delete
    * changes:
    *
    *  - removed docs' rows — dropped (survivor semi-join);
    *  - row-locals of survivors — immutable, carried bit-identically;
    *  - `comp` — re-joined corpus-wide from the upstream
    *    delete-maintained label artifact (a removed bridge doc can
    *    split components; `comp_old` is kept for dirty detection);
    *  - `decon` — recomputed ONLY for dirty evens, in BOTH flip
    *    directions: evidence LEAVES with a removed odd's shingles
    *    (true→false — postings from the base index; an over-cap
    *    shingle never carried evidence, so capped postings suffice),
    *    and evidence RETURNS when the removals drop a capped-out
    *    shingle's df back under [[Dedup.ShingleDfCap]] (false→true —
    *    under delete df only falls, so cap flips are re-admissions
    *    only, detected by base-vs-survivor df compare);
    *  - `k1` — re-elected only inside fp groups that LOST a member
    *    (the removed docs' fps — inheritance: the next-smallest id
    *    takes the election);
    *  - `k2` — re-elected inside comps that lost a member (the
    *    removed docs' PREV comp ids), changed label, or changed k1;
    *  - `a2`/`k3..k5` — pure projections, as everywhere.
    *
    * The delete REFRESHES the decon sidecars for the survivors (one
    * linear explode pass each — the knn eager-sidecar discipline):
    * they are this delete's exact evidence (survivor df for the
    * re-admission compare, survivor postings for the recompute) AND
    * the aligned base the NEXT maintenance step — including the MIXED
    * remove∘delta composition, whose delta leg looks the refreshed
    * index up via readPrior — hits as a cache read.  Saved vs full:
    * rowLocalFlags' four text passes (tokenize, fingerprint, Gopher,
    * C4) and both corpus-wide election windows; the floor is the two
    * sidecar explodes + the artifact rewrite.
    *
    * Declines (→ full rebuild, which compacts): removed bytes past
    * [[Dedup.maxAppendFraction]] of the prev corpus; base-aligned
    * sidecars missing; a removed file OUTSIDE the sidecars' base (an
    * un-compacted append — its text is gone and its shingles were
    * never materialized, so its evidence is unrecoverable; in
    * practice a takedown of recent epochs resolves as the emergent
    * cheapest-prior cache hit before ever reaching this builder).
    */
  private def curationFlagsDelete(s: SparkSession, dir: String, prevFlags: DataFrame,
      prevStats: Map[String, String], removedFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val M = graft.sources.Materialize
    val removedBytes = removedFiles.map(f => M.statLen(prevStats(f))).sum
    if (removedBytes >
        Dedup.maxAppendFraction(s) * prevStats.values.map(M.statLen).sum) return null
    // base-aligned sidecars valid for the PREV snapshot — removed
    // files included, their postings are the witness-loss dirty set
    val baseIdx = M.readWithin(s, "decon_index", prevStats, Dedup.deconIdxParams)
    val baseDfA = M.readWithin(s, "decon_df", prevStats, Dedup.deconDfParams)
    if (baseIdx.isEmpty || baseDfA.isEmpty) return null
    val (baseIdx5, baseFiles) = baseIdx.get
    if (baseDfA.get._2.toSet != baseFiles.toSet) return null // sidecars must share one base
    if (!removedFiles.forall(baseFiles.contains)) return null
    val survivors = (prevStats.keySet -- removedFiles).toSeq.sorted
    // appends retained since the base compaction (on disk, not removed
    // — removed ⊆ base was just checked): their shingle counts compose
    // the PREV snapshot's df for the re-admission compare, exactly the
    // delta's lazy-composition trick
    val appendsRetained = (prevStats.keySet -- baseFiles).toSeq.sorted
    // eager sidecar refresh for the survivors (see scaladoc)
    val survDf = Dedup.deconBaseDf(s, survivors)
    val survIdx = Dedup.deconIndexFiles(s, survivors)
    val survIds = graft.sources.Scan.parquet(s, survivors: _*).select(col("doc_id"))
    val removedIds = prevFlags.select(col("doc_id"))
      .join(survIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    // ---- decon dirty set: witness loss ∪ cap re-admission ----
    val removedOddSh = baseIdx5
      .join(removedIds.filter(col("doc_id") % 2 === 1), Seq("doc_id"), "left_semi")
      .select(col("shingle")).distinct()
    val prevDf =
      if (appendsRetained.isEmpty) baseDfA.get._1
      else baseDfA.get._1.unionByName(
        Dedup.exploded5(graft.sources.Scan.parquet(s, appendsRetained: _*)
            .select(col("doc_id"), col("text")))
          .groupBy(col("shingle")).agg(count(lit(1)).as("df")))
        .groupBy(col("shingle")).agg(sum(col("df")).as("df"))
    val readmitted = prevDf
      .filter(col("df") > Dedup.ShingleDfCap).select(col("shingle"))
      .join(survDf.filter(col("df") <= Dedup.ShingleDfCap).select(col("shingle")),
        Seq("shingle"), "left_semi")
    val dirtyEvens = survIdx.filter(col("doc_id") % 2 === 0)
      .join(removedOddSh.unionByName(readmitted).distinct(), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .localCheckpoint(eager = false)
    val deconNew = survIdx.filter(col("doc_id") % 2 === 0)
      .join(dirtyEvens, Seq("doc_id"), "left_semi")
      .join(survIdx.filter(col("doc_id") % 2 === 1).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("dnew", lit(true))
    // ---- assemble: survivor carry + fresh comp + surgical decon ----
    val carried = prevFlags.join(survIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("fp"), col("g_keep"), col("c_keep"), col("h"),
        col("comp").as("comp_old"), col("decon").as("decon_old"),
        col("k1").as("k1_old"), col("k2").as("k2_old"))
    val labels = Dedup.nearDupComponentLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    val withComp = carried
      .join(labels, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val withDecon = withComp
      .join(dirtyEvens.withColumn("ddirty", lit(true)), Seq("doc_id"), "left")
      .join(deconNew, Seq("doc_id"), "left")
      .withColumn("decon", when(col("ddirty").isNotNull,
        coalesce(col("dnew"), lit(false)))
        .otherwise(coalesce(col("decon_old"), lit(false))))
      .drop("ddirty", "dnew")
      .localCheckpoint(eager = false)
    // ---- k1: re-elect only fp groups that lost a member ----
    val touchedFps = prevFlags.join(removedIds, Seq("doc_id"), "left_semi")
      .select(col("fp")).distinct()
    val withK1 = withDecon.join(touchedFps, Seq("fp"), "left_semi")
      .withColumn("k1", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .unionByName(withDecon.join(touchedFps, Seq("fp"), "left_anti")
        .withColumn("k1", col("k1_old")))
      .localCheckpoint(eager = false)
    // ---- k2: comps that lost a member / changed label / changed k1 ----
    val removedComps = prevFlags.join(removedIds, Seq("doc_id"), "left_semi")
      .select(col("comp")).distinct()
    val touchedComps = withK1.filter(col("comp") =!= col("comp_old") ||
        col("k1") =!= col("k1_old"))
      .select(col("comp")).distinct()
      .unionByName(removedComps)
      .distinct()
    val withK2 = withK1.join(touchedComps, Seq("comp"), "left_semi")
      .withColumn("k2", col("k1") && col("doc_id") ===
        min(when(col("k1"), col("doc_id"))).over(Window.partitionBy(col("comp"))))
      .unionByName(withK1.join(touchedComps, Seq("comp"), "left_anti")
        .withColumn("k2", col("k2_old")))
    withK2
      .withColumn("a2", col("doc_id") === col("comp"))
      .withColumn("k3", col("k2") && !col("decon"))
      .withColumn("k4", col("k3") && col("g_keep"))
      .withColumn("k5", col("k4") && col("c_keep"))
      .select(FlagCols.map(col): _*)
  }

  /** Per-feed eval-contamination matrix — the decon verdict grouped by
    * source over the TEST side (even doc_ids): which feed's documents
    * overlap the eval split, and how badly (ppm).  The question a
    * curator asks before blaming a benchmark jump on a crawl.  Pure
    * FileScan consumer of the materialized flag leaf (the decon
    * column is maintained there through the round-16 delta — this
    * query pays one |sources|-row aggregate, never the 5-gram join);
    * ppm is long-lane floor division, oracle-EXACT.
    */
  def deconBySource(s: SparkSession, dir: String): DataFrame =
    curationFlags(s, dir)
      .filter(col("doc_id") % 2 === 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test_docs"),
        sum(when(col("decon"), 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("source"), col("n_test_docs"), col("n_contaminated"),
        expr("(n_contaminated * 1000000) div n_test_docs").as("contaminated_ppm"))
      .orderBy(col("source"))

  /** Per-feed token budget: each source's doc count, exact token
    * total and ppm share of the corpus — the raw-weight table a
    * mixture plan starts from (mixture_plan then √-tempers it).
    * Pure FileScan consumer of the maintained flag leaf (n_toks is a
    * carried row-local); one |sources|-key aggregate + a 1-row
    * broadcast total, never a text re-scan.
    */
  def tokenShareBySource(s: SparkSession, dir: String): DataFrame = {
    val bySrc = curationFlags(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .localCheckpoint(eager = false) // feeds the total AND the shares
    val tot = bySrc.agg(sum(col("n_tokens")).as("total_tokens"))
    bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 div total_tokens").as("token_share_ppm"))
      .orderBy(col("source"))
  }

  def curationReport(s: SparkSession, dir: String): DataFrame = {
    val flagged = curationFlags(s, dir)
    // stages 7–8, the SELECTION half of the pipeline: source_mix's
    // √-temperature keep (rates derived from the stage-6 SURVIVORS —
    // the order a real pipeline runs: select after cleaning) and the
    // deterministic train split.  The max-tokens divisor floors at 1
    // so an emptied funnel yields rate 0 in both engines (no 0/0
    // NaN); the standalone column applies the same machinery to the
    // RAW corpus — the overlap comparison every other stage reports.
    def cutoffs(keep: Column, name: String) = {
      val ts = flagged.groupBy(col("source"))
        .agg(sum(when(keep, col("n_toks")).otherwise(0L)).as("ts"))
      val mx = ts.agg(greatest(max(col("ts")), lit(1L)).as("mx"))
      ts.join(broadcast(mx))
        .select(col("source"),
          floor(sqrt(col("ts").cast("double") / col("mx").cast("double")) * 65536)
            .cast("long").as(name))
    }
    val trainCut = format_string("%05x", lit(58982L)) // floor(0.90 * 65536)
    val sel = flagged
      .join(broadcast(cutoffs(col("k5"), "cut6")), Seq("source"))
      .join(broadcast(cutoffs(lit(true), "cut6r")), Seq("source"))
      .withColumn("k6", col("k5") && col("h") < format_string("%05x", col("cut6")))
      .withColumn("a6", col("h") < format_string("%05x", col("cut6r")))
      .withColumn("a7", col("h") < trainCut)
      .withColumn("k7", col("k6") && col("a7"))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def tok(c: Column) = sum(when(c, col("n_toks")).otherwise(0L))
    sel.agg(
        count(lit(1)).as("n"), sum(col("n_toks")).as("t0"),
        cnt(col("k1")).as("o1"), tok(col("k1")).as("t1"),
        cnt(col("k2")).as("o2"), tok(col("k2")).as("t2"),
        cnt(col("k3")).as("o3"), tok(col("k3")).as("t3"),
        cnt(col("k4")).as("o4"), tok(col("k4")).as("t4"),
        cnt(col("k5")).as("o5"), tok(col("k5")).as("t5"),
        cnt(col("k6")).as("o6"), tok(col("k6")).as("t6"),
        cnt(col("k7")).as("o7"), tok(col("k7")).as("t7"),
        cnt(!col("a2")).as("r2a"), cnt(col("decon")).as("r3a"),
        cnt(!col("g_keep")).as("r4a"), cnt(!col("c_keep")).as("r5a"),
        cnt(!col("a6")).as("r6a"), cnt(!col("a7")).as("r7a"))
      .select(expr(
        """stack(8,
          |1, 'raw',           n,  CAST(0 AS BIGINT), n,  CAST(0 AS BIGINT), t0,
          |2, 'exact_dedup',   n,  n - o1,  o1, n - o1, t1,
          |3, 'near_dup',      o1, o1 - o2, o2, r2a, t2,
          |4, 'decontaminate', o2, o2 - o3, o3, r3a, t3,
          |5, 'gopher',        o3, o3 - o4, o4, r4a, t4,
          |6, 'c4',            o4, o4 - o5, o5, r5a, t5,
          |7, 'source_mix',    o5, o5 - o6, o6, r6a, t6,
          |8, 'split_train',   o6, o6 - o7, o7, r7a, t7)
          |AS (stage_idx, stage, docs_in, docs_removed, docs_out, removed_alone, tokens_out)""".stripMargin))
      .orderBy(col("stage_idx"))
  }

  /** Per-SOURCE curation matrix — [[curationReport]]'s cleaning funnel
    * (stages 1–6: exact, near-dup, decontaminate, Gopher, C4) broken
    * out by feed: one row per source with its survivor count at every
    * stage plus raw/surviving token mass.  The question this answers
    * is the one the global funnel can't: WHICH feed is the boilerplate
    * mill / the contaminated one / the one C4 guts — the
    * keep-or-drop-the-crawl decision input.  The global selection
    * stages (source_mix cutoffs, train split) are deliberately out of
    * scope: they are cross-source POLICY relative to the global
    * maximum, not per-feed hygiene.
    *
    * Scale shape: one corpus scan builds [[curationFlags]]'s skinny
    * flag leaf (eager checkpoint, fingerprint/component windows run
    * once per call), then ONE |sources|-row keyed aggregate with
    * map-side partials.  Output is |sources| rows.
    */
  def curationBySource(s: SparkSession, dir: String): DataFrame = {
    val flagged = curationFlags(s, dir)
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    flagged.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("toks_raw"),
        cnt(col("k1")).as("o_exact"),
        cnt(col("k2")).as("o_neardup"),
        cnt(col("k3")).as("o_decon"),
        cnt(col("k4")).as("o_gopher"),
        cnt(col("k5")).as("o_c4"),
        sum(when(col("k5"), col("n_toks")).otherwise(0L)).as("toks_c4"))
      .orderBy(col("source"))
  }

  /** Partition-pruning exercised THROUGH the gate: write the events
    * table Hive-partitioned by (day, event_type) — the 100 TB lake
    * layout — then read ONE day × one event type back and report what
    * the scan actually touched.  `parts_selected`/`files_selected`
    * come from the executed plan's [[org.apache.spark.sql.execution.FileSourceScanLike]]
    * selected partitions (planning-time pruning truth, NOT
    * input_file_name() which only sees files that produced surviving
    * rows), so a pruning regression — a filter that stops reaching the
    * scan as a PartitionFilter — changes the value and FAILS the
    * oracle compare instead of only a spec.  The oracle can predict
    * the file counts exactly because the writer repartitions on the
    * partition columns first: each (day, event_type) combo lands in
    * exactly one task ⇒ one file per partition directory, so
    * files == partitions == COUNT(DISTINCT day, event_type).
    *
    * The write is the diagnostic's temp-dir side effect (the
    * ingest_text128 precedent), overwritten per run; the LAYOUT is the
    * product surface ([[graft.sources.Layout.writePartitioned]]).
    */
  def layoutPrune(s: SparkSession, dir: String): DataFrame = {
    val day = "2024-01-15"
    val etype = "purchase"
    // write the layout once per corpus snapshot, SIGNATURE-KEYED and
    // atomically published (the Materialize idiom): the directory name
    // carries the signature, so existence == freshness — no
    // check-then-overwrite window — and concurrent sessions (or two
    // corpora sharing a basename) can never serve each other a stale
    // or half-written layout; the QUERY under measurement is the
    // pruned read, not a per-run rewrite of 150 partition directories
    val sig = graft.sources.Materialize.signature(s, Seq(s"$dir/events.parquet"),
      Seq("layout" -> "day,event_type", "ver" -> "1"))
    val root = new java.io.File("target/graft_layout").getAbsoluteFile
    val dest = new java.io.File(root, s"events_day_etype-${sig.take(16)}")
    if (!dest.isDirectory) {
      root.mkdirs()
      val tmp = new java.io.File(root,
        s".${dest.getName}.tmp-${java.util.UUID.randomUUID}")
      val events = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      graft.sources.Layout.writePartitioned(
        events.repartition(col("day"), col("event_type")),
        tmp.getAbsolutePath, "day", "event_type")
      if (!tmp.renameTo(dest)) {
        // a concurrent identical build won the rename; its bytes carry
        // the same signature-keyed name
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        require(dest.isDirectory, s"layout publish race left no layout at $dest")
      }
    }
    val pruned = graft.sources.Scan.parquet(s, dest.getAbsolutePath)
      .filter(col("day") === day && col("event_type") === etype)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanLike => f
    }.getOrElse(throw new IllegalStateException("layout_prune: no file scan in plan"))
    val parts = scan.selectedPartitions
    val partsSelected = parts.partitionCount.toLong
    val filesSelected = parts.toPartitionArray.length.toLong
    val filesTotal = scan.relation.location.inputFiles.length.toLong
    val rows = pruned.count()
    import s.implicits._
    Seq((day, etype, rows, partsSelected, filesSelected, filesTotal))
      .toDF("day", "event_type", "rows_read", "parts_selected",
        "files_selected", "files_total")
  }

  /** Column-profile audit — the pre-flight validation every pipeline
    * run starts with (and the post-run regression check it ends
    * with): per column, row/null/distinct counts and min/max, in one
    * long-format relation a diff tool can compare across ingests.
    * min/max are computed in the column's NATIVE type (so numerics
    * order numerically, not "100" < "99") and cast to string only for
    * presentation.
    *
    * Scale shape: ONE scan.  The multi-column exact distincts expand
    * each row ×|cols| map-side (Spark's Expand) and shuffle each
    * column's distinct values — that shuffle is the honest cost of
    * EXACT distinct counts, which is what a validation gate wants
    * (an approx profile belongs to `agg_approx`'s sketch family).
    * Everything else aggregates with map-side partials into
    * |cols| output rows.
    */
  def colProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "colProfile needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nn").as("n_null"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_v"), col(s"${c}__mx").as("max_v"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Driver entry: profile every `documents` column (text included —
    * its distinct count IS the exact-dup audit).
    */
  def colProfileDocs(s: SparkSession, dir: String): DataFrame =
    colProfile(Tables.documents(s, dir),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  /** Training-sequence chunking over `documents`: seqLen = 64,
    * overlap = 16 — see [[chunkSequences]].
    */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    chunkSequences(Tables.documents(s, dir).select(col("doc_id"), col("text")), 64, 16)
      .orderBy(col("doc_id"), col("seq_idx"))

  /** Split each document into ≤`seqLen`-token training sequences with
    * `overlap` tokens of carried context (stride = seqLen − overlap) —
    * the example-preparation stage between cleaning and packing
    * ([[packNextFit]] bins what this emits).  A doc yields
    * ⌈max(n−seqLen, 0)/stride⌉ + 1 sequences (the last possibly
    * short); consecutive sequences share exactly `overlap` tokens, so
    * concatenating each sequence minus its first `overlap` tokens
    * rebuilds the doc (spec-pinned).  Pure map-side HOF over the token
    * array — zero shuffle at any corpus size beyond the presentation
    * sort.
    */
  def chunkSequences(docs: DataFrame, seqLen: Int, overlap: Int): DataFrame = {
    require(seqLen > 0 && overlap >= 0 && overlap < seqLen,
      s"need 0 <= overlap < seqLen, got seqLen=$seqLen overlap=$overlap")
    val stride = seqLen - overlap
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val nSeq = when(col("n") <= seqLen, lit(1))
      .otherwise(ceil((col("n") - seqLen) / lit(stride.toDouble)).cast("int") + 1)
    docs
      .select(col("doc_id"), toks.as("tk"), size(toks).as("n"))
      .select(col("doc_id"), col("n"),
        posexplode(transform(sequence(lit(0), nSeq - 1),
          i => array_join(slice(col("tk"), i * stride + 1, lit(seqLen)), " ")))
          .as(Seq("seq_idx", "seq_text")))
      .select(col("doc_id"), col("seq_idx"),
        least(lit(seqLen), col("n") - col("seq_idx") * stride).cast("long").as("n_seq_tokens"),
        col("seq_text"))
  }

  /** Driver entry: BPE-budget chunking over `documents` — 64 MODEL
    * tokens per sequence, 8 words of carried overlap (the whitespace
    * twin [[chunkDocs]] carries 16 words against a 64-WORD budget;
    * under subword inflation a 64-BPE-token budget holds fewer words,
    * so the carry shrinks proportionally).
    */
  def chunkDocsBpe(s: SparkSession, dir: String): DataFrame =
    chunkSequencesBpe(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      64, 8, graft.functions.Bpe.default)
      .orderBy(col("doc_id"), col("seq_idx"))

  /** [[chunkSequences]] in MODEL-token units — see
    * [[graft.functions.BpeChunkSeqs]] for the exact semantics
    * (whole-word boundaries, BPE-token budget, word-count overlap,
    * per-sequence n_overlap_words making the rebuild invariant
    * checkable).  Still one zero-shuffle map-side pass.
    */
  def chunkSequencesBpe(docs: DataFrame, seqLenBpe: Int, overlapWords: Int,
      table: graft.functions.BpeTable): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.Bpe.bpeChunkSeqs(
        graft.functions.TextFunctions.tokens(col("text")),
        table, seqLenBpe, overlapWords).as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("seq_idx", "c")))
      .select(col("doc_id"), col("seq_idx"),
        col("c.n_words").as("n_seq_words"),
        col("c.n_overlap").as("n_overlap_words"),
        col("c.n_bpe").as("n_seq_bpe_tokens"),
        col("c.text").as("seq_text"))

  /** Feature frame for the linear quality classifier: per doc a
    * 6-dim bounded vector of cheap map-side signals (bias, stopword
    * ratio, punctuation ratio, capped length, distinct-token ratio,
    * capped avg token length) and the WEAK label — whether the
    * [[TextOps.textQuality]] composite score clears 0.6.  All
    * features are exact int/int IEEE ratios of counts ⇒ the frame
    * is bit-deterministic on any layout.
    */
  private[graft] def qualityFeatures(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{punctRatio, stopwordRatio, tokens}
    val stopR = stopwordRatio(col("text"))
    val punctR = punctRatio(col("text"))
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val score = stopR * lit(0.4) + (lit(1.0) - punctR) * lit(0.3) +
      when(length(col("text")) >= 100, lit(0.3)).otherwise(lit(0.0))
    docs.select(
      col("doc_id"),
      when(score >= 0.6, lit(1.0)).otherwise(lit(0.0)).as("y"),
      array(
        lit(1.0),
        stopR,
        punctR,
        least(length(col("text")).cast("double"), lit(1000.0)) / lit(1000.0),
        size(array_distinct(toks)).cast("double") / nTok,
        least(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok,
          lit(16.0)) / lit(16.0)).as("x"))
  }

  /** Distributed logistic-regression TRAINING for a quality
    * classifier — the fastText-style distillation workflow every
    * large corpus pipeline runs: an expensive teacher labels docs
    * (here the textQuality composite gate), a linear student learns
    * to reproduce the verdict from cheap map-side features, and the
    * student then scores the full corpus at scan speed.
    *
    * Full-batch gradient descent, the [[Similarity.kmeansTrain]]
    * determinism discipline: each iteration is ONE distributed pass —
    * per row the margin w·x (sequential-fold dot), σ(margin), then
    * the per-dimension gradient terms (σ(p)−y)·x_j AND the log-loss
    * term explode into a (j)-keyed aggregate of DECIMAL(38,18) sums
    * (exact ⇒ order-insensitive ⇒ the trained weights are
    * bit-identical on any partitioning — double sums would make the
    * model depend on shuffle arrival order).  Driver state = the
    * (dim+1) sums per iteration; the feature frame is checkpointed
    * once and released in a finally.
    *
    * Returns (weights, per-iteration mean log-loss trace).
    */
  private[graft] def qualityLrTrain(docs: DataFrame, iters: Int = 30,
      lr: Double = 4.0): (Array[Double], Array[Double]) = {
    require(iters >= 1 && iters <= 1024, s"qualityLrTrain: iters=$iters outside [1, 1024]")
    val feats = qualityFeatures(docs).localCheckpoint(eager = true)
    // driver-loop actions under AQE pay one job round-trip PER STAGE;
    // every iteration here is a (dim+1)-key aggregate whose exchange
    // ships only map-side partials, so a 1-partition reduce is exact
    // at any corpus size and AQE has nothing to adapt — scope both off
    // for the loop (graft.GraftSession.boundedAgg scaladoc has the
    // full argument; values are partitioning-independent decimal sums
    // either way)
    try graft.GraftSession.boundedAgg(docs.sparkSession) {
      val n = feats.count()
      require(n > 0, "qualityLrTrain: empty corpus")
      val dim = 6
      val w = new Array[Double](dim)
      val losses = new Array[Double](iters)
      for (it <- 0 until iters) {
        val margin = dot(col("x"), typedLit(w.toSeq))
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        // ε-clamped log-loss rides the same exploded aggregate as the
        // gradient (sentinel index j = dim): one pass per iteration
        val lossTerm = -(col("y") * log(greatest(p, lit(1e-12))) +
          (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12))))
        val sums = feats
          .select(posexplode(concat(
            transform(col("x"), xj => ((p - col("y")) * xj).cast("decimal(38,18)")),
            array(lossTerm.cast("decimal(38,18)")))).as(Seq("j", "t")))
          .groupBy(col("j")).agg(sum(col("t")).as("s"))
          .collect().map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
        losses(it) = sums(dim) / n
        var j = 0
        while (j < dim) { w(j) -= lr * sums(j) / n; j += 1 }
      }
      (w, losses)
    } finally { feats.unpersist(); () }
  }

  /** Driver entry: train on the corpus, then score it — (doc_id,
    * label, p_keep, pred).  12 iterations: measured accuracy is
    * IDENTICAL at 8/12/16/30 iters on both bundled SFs (0.904 at
    * sf0.001, 0.926 at sf0.01 — the decision boundary stabilizes
    * immediately on this separable teacher; more iterations only
    * polish calibration, at one full corpus pass each).  The model
    * is trained state upstream ⇒ rows-only oracle; the spec pins
    * layout-independence of the trained weights, a decreasing loss
    * trace, and that the student actually reproduces its teacher
    * (accuracy bound).
    */
  def qualityLr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (w, _) = qualityLrTrain(docs, iters = 12)
    val p = lit(1.0) / (lit(1.0) + exp(-dot(col("x"), typedLit(w.toSeq))))
    qualityFeatures(docs)
      .select(col("doc_id"), col("y").cast("int").as("label"),
        round(p, 6).as("p_keep"), (p >= 0.5).cast("int").as("pred"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_lr" -> (qualityLr _),
    "chunk_docs" -> (chunkDocs _),
    "chunk_docs_bpe" -> (chunkDocsBpe _),
    "pack_stats_bpe" -> (packStatsBpe _),
    "corpus_clean" -> (corpusClean _),
    "source_mix" -> (sourceMix _),
    "importance_resample" -> (importanceResampleDocs _),
    "col_profile" -> (colProfileDocs _),
    "mixture_plan" -> (mixturePlanDocs _),
    "mixture_apply" -> (mixtureApplyDocs _),
    "shuffle_shards" -> (shuffleShardsDocs _),
    "split_assign" -> (splitAssignDocs _),
    "split_assign_grouped" -> (splitAssignGrouped _),
    "pack_render" -> (packRenderDocs _),
    "ingest_text128" -> (ingestText128 _),
    "layout_prune" -> (layoutPrune _),
    "curation_report" -> (curationReport _),
    "curation_by_source" -> (curationBySource _),
    "decon_by_source" -> (deconBySource _),
    "token_share_by_source" -> (tokenShareBySource _),
    "pack_stats" -> (packStats _))

  def oracleSql: Map[String, String] = Map(
    // the flag leaf's n_toks is the whitespace token count — replayed
    // as the curation CTE's exact expression; shares are ppm floor
    // division in the BIGINT lane
    "token_share_by_source" ->
      """WITH d AS (SELECT source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        |  FROM documents),
        |b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |      CAST(SUM(tok) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM b)
        |SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens * 1000000 // total_tokens AS BIGINT) AS token_share_ppm
        |FROM b, t ORDER BY source""".stripMargin,
    // (file, line) distinctness ≡ (source, text) distinctness under
    // the one-file-per-source layout; 64- and 128-bit lanes both
    // resolve to distinct texts absent hash collisions (~n²/2⁶⁵)
    "ingest_text128" ->
      """SELECT source, COUNT(*) AS n_lines,
        |  COUNT(DISTINCT text) AS n_id64,
        |  COUNT(DISTINCT text) AS n_id128
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the funnel composes the already-proven stage oracles (exact-dedup
    // fingerprint, the recursive near-dup CC, decontaminate's capped
    // 5-gram overlap, the Gopher and C4 rule sets) into one 6-row
    // attrition report; every value is an exact integer
    // the curation_report CTE chain through fl3 (stages 1-6), grouped
    // by source instead of stacked into the global funnel
    // the curation oracle's 5-gram decon CTE, grouped by source over
    // the even (test) side — contamination ppm is long-lane floor div
    "decon_by_source" ->
      """WITH t AS (SELECT doc_id, source,
        |  string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |dsh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 5
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
        |          for i in generate_series(1, len(tk)-4)]
        |    ELSE [] END) AS shingle FROM t),
        |dsh AS (SELECT * FROM dsh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |dec AS (SELECT DISTINCT te.doc_id FROM dsh te JOIN dsh tr
        |        ON te.shingle = tr.shingle AND te.doc_id % 2 = 0 AND tr.doc_id % 2 = 1)
        |SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_test_docs,
        |  CAST(SUM(CASE WHEN dec.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  CAST(SUM(CASE WHEN dec.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS contaminated_ppm
        |FROM t LEFT JOIN dec ON t.doc_id = dec.doc_id
        |WHERE t.doc_id % 2 = 0
        |GROUP BY t.source ORDER BY t.source""".stripMargin,
    "curation_by_source" ->
      """WITH RECURSIVE t AS (SELECT doc_id, text, source,
        |  string_split_regex(trim(text), '\s+') AS tk,
        |  string_split(text, chr(10)) AS lines,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
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
        |comp0 AS (SELECT id, LEAST(id, MIN(reach)) AS comp FROM r GROUP BY id),
        |dsh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 5
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
        |          for i in generate_series(1, len(tk)-4)]
        |    ELSE [] END) AS shingle FROM t),
        |dsh AS (SELECT * FROM dsh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |dec AS (SELECT DISTINCT te.doc_id FROM dsh te JOIN dsh tr
        |        ON te.shingle = tr.shingle AND te.doc_id % 2 = 0 AND tr.doc_id % 2 = 1),
        |g AS (SELECT doc_id,
        |  (CAST(len(tk) AS BIGINT) BETWEEN 50 AND 100000
        |   AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE) / len(tk) BETWEEN 3 AND 10
        |   AND CAST((len(text) - len(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) / len(tk) <= 0.1
        |   AND CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(lines) <= 0.9
        |   AND CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS DOUBLE) / len(lines) <= 0.3
        |   AND CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(tk) >= 0.8
        |   AND len(list_filter(['the','be','to','of','and','that','have','with'], w -> list_contains(tk, w))) >= 2) AS g_keep
        |  FROM t),
        |c AS (SELECT doc_id,
        |  (NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
        |   AND len(regexp_extract_all(COALESCE(array_to_string(list_filter(lines, l ->
        |         regexp_matches(rtrim(l), '[.!?"]$')
        |         AND len(string_split_regex(trim(l), '\s+')) >= 5
        |         AND NOT contains(lower(l), 'javascript')), ' '), ''), '[.!?]')) >= 3) AS c_keep
        |  FROM t),
        |base AS (SELECT t.doc_id, t.source, CAST(len(tk) AS BIGINT) AS n_toks, md5(nt) AS fp,
        |  COALESCE(comp0.comp, t.doc_id) AS comp,
        |  t.doc_id IN (SELECT doc_id FROM dec) AS decon,
        |  g.g_keep, c.c_keep
        |  FROM t LEFT JOIN comp0 ON t.doc_id = comp0.id
        |  JOIN g ON t.doc_id = g.doc_id JOIN c ON t.doc_id = c.doc_id),
        |fl AS (SELECT *,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS k1
        |  FROM base),
        |fl2 AS (SELECT *,
        |  k1 AND doc_id = MIN(CASE WHEN k1 THEN doc_id END) OVER (PARTITION BY comp) AS k2
        |  FROM fl),
        |fl3 AS (SELECT *, k2 AND NOT decon AS k3,
        |  k2 AND NOT decon AND g_keep AS k4,
        |  k2 AND NOT decon AND g_keep AND c_keep AS k5 FROM fl2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS toks_raw,
        |  CAST(SUM(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS o_exact,
        |  CAST(SUM(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS o_neardup,
        |  CAST(SUM(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS o_decon,
        |  CAST(SUM(CASE WHEN k4 THEN 1 ELSE 0 END) AS BIGINT) AS o_gopher,
        |  CAST(SUM(CASE WHEN k5 THEN 1 ELSE 0 END) AS BIGINT) AS o_c4,
        |  CAST(SUM(CASE WHEN k5 THEN n_toks ELSE 0 END) AS BIGINT) AS toks_c4
        |FROM fl3 GROUP BY source ORDER BY source""".stripMargin,
    "curation_report" ->
      """WITH RECURSIVE t AS (SELECT doc_id, text, source,
        |  string_split_regex(trim(text), '\s+') AS tk,
        |  string_split(text, chr(10)) AS lines,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
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
        |comp0 AS (SELECT id, LEAST(id, MIN(reach)) AS comp FROM r GROUP BY id),
        |dsh0 AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 5
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
        |          for i in generate_series(1, len(tk)-4)]
        |    ELSE [] END) AS shingle FROM t),
        |dsh AS (SELECT * FROM dsh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 128),
        |dec AS (SELECT DISTINCT te.doc_id FROM dsh te JOIN dsh tr
        |        ON te.shingle = tr.shingle AND te.doc_id % 2 = 0 AND tr.doc_id % 2 = 1),
        |g AS (SELECT doc_id,
        |  (CAST(len(tk) AS BIGINT) BETWEEN 50 AND 100000
        |   AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE) / len(tk) BETWEEN 3 AND 10
        |   AND CAST((len(text) - len(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) / len(tk) <= 0.1
        |   AND CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(lines) <= 0.9
        |   AND CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS DOUBLE) / len(lines) <= 0.3
        |   AND CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(tk) >= 0.8
        |   AND len(list_filter(['the','be','to','of','and','that','have','with'], w -> list_contains(tk, w))) >= 2) AS g_keep
        |  FROM t),
        |c AS (SELECT doc_id,
        |  (NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
        |   AND len(regexp_extract_all(COALESCE(array_to_string(list_filter(lines, l ->
        |         regexp_matches(rtrim(l), '[.!?"]$')
        |         AND len(string_split_regex(trim(l), '\s+')) >= 5
        |         AND NOT contains(lower(l), 'javascript')), ' '), ''), '[.!?]')) >= 3) AS c_keep
        |  FROM t),
        |base AS (SELECT t.doc_id, t.source, CAST(len(tk) AS BIGINT) AS n_toks, md5(nt) AS fp,
        |  COALESCE(comp0.comp, t.doc_id) AS comp,
        |  t.doc_id IN (SELECT doc_id FROM dec) AS decon,
        |  g.g_keep, c.c_keep
        |  FROM t LEFT JOIN comp0 ON t.doc_id = comp0.id
        |  JOIN g ON t.doc_id = g.doc_id JOIN c ON t.doc_id = c.doc_id),
        |fl AS (SELECT *,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS k1,
        |  doc_id = comp AS a2
        |  FROM base),
        |fl2 AS (SELECT *,
        |  k1 AND doc_id = MIN(CASE WHEN k1 THEN doc_id END) OVER (PARTITION BY comp) AS k2
        |  FROM fl),
        |fl3 AS (SELECT *, k2 AND NOT decon AS k3,
        |  k2 AND NOT decon AND g_keep AS k4,
        |  k2 AND NOT decon AND g_keep AND c_keep AS k5 FROM fl2),
        |mix AS (SELECT source,
        |  CAST(SUM(CASE WHEN k5 THEN n_toks ELSE 0 END) AS BIGINT) AS ts,
        |  CAST(SUM(n_toks) AS BIGINT) AS tsr FROM fl3 GROUP BY source),
        |mxx AS (SELECT GREATEST(MAX(ts), 1) AS m5, GREATEST(MAX(tsr), 1) AS mr FROM mix),
        |cut AS (SELECT source,
        |  CAST(floor(sqrt(CAST(ts AS DOUBLE) / CAST(m5 AS DOUBLE)) * 65536) AS BIGINT) AS cut6,
        |  CAST(floor(sqrt(CAST(tsr AS DOUBLE) / CAST(mr AS DOUBLE)) * 65536) AS BIGINT) AS cut6r
        |  FROM mix, mxx),
        |fl4 AS (SELECT fl3.*, cut6, cut6r,
        |  '0' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |  FROM fl3 JOIN cut USING (source)),
        |fl5 AS (SELECT *,
        |  k5 AND h < printf('%05x', cut6) AS k6,
        |  h < printf('%05x', cut6r) AS a6,
        |  h < printf('%05x', 58982) AS a7 FROM fl4),
        |fl6 AS (SELECT *, k6 AND a7 AS k7 FROM fl5),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_toks) AS BIGINT) AS t0,
        |  CAST(SUM(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS o1, CAST(SUM(CASE WHEN k1 THEN n_toks ELSE 0 END) AS BIGINT) AS t1,
        |  CAST(SUM(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS o2, CAST(SUM(CASE WHEN k2 THEN n_toks ELSE 0 END) AS BIGINT) AS t2,
        |  CAST(SUM(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS o3, CAST(SUM(CASE WHEN k3 THEN n_toks ELSE 0 END) AS BIGINT) AS t3,
        |  CAST(SUM(CASE WHEN k4 THEN 1 ELSE 0 END) AS BIGINT) AS o4, CAST(SUM(CASE WHEN k4 THEN n_toks ELSE 0 END) AS BIGINT) AS t4,
        |  CAST(SUM(CASE WHEN k5 THEN 1 ELSE 0 END) AS BIGINT) AS o5, CAST(SUM(CASE WHEN k5 THEN n_toks ELSE 0 END) AS BIGINT) AS t5,
        |  CAST(SUM(CASE WHEN k6 THEN 1 ELSE 0 END) AS BIGINT) AS o6, CAST(SUM(CASE WHEN k6 THEN n_toks ELSE 0 END) AS BIGINT) AS t6,
        |  CAST(SUM(CASE WHEN k7 THEN 1 ELSE 0 END) AS BIGINT) AS o7, CAST(SUM(CASE WHEN k7 THEN n_toks ELSE 0 END) AS BIGINT) AS t7,
        |  CAST(SUM(CASE WHEN NOT a2 THEN 1 ELSE 0 END) AS BIGINT) AS r2a,
        |  CAST(SUM(CASE WHEN decon THEN 1 ELSE 0 END) AS BIGINT) AS r3a,
        |  CAST(SUM(CASE WHEN NOT g_keep THEN 1 ELSE 0 END) AS BIGINT) AS r4a,
        |  CAST(SUM(CASE WHEN NOT c_keep THEN 1 ELSE 0 END) AS BIGINT) AS r5a,
        |  CAST(SUM(CASE WHEN NOT a6 THEN 1 ELSE 0 END) AS BIGINT) AS r6a,
        |  CAST(SUM(CASE WHEN NOT a7 THEN 1 ELSE 0 END) AS BIGINT) AS r7a
        |  FROM fl6)
        |SELECT s.* FROM a, LATERAL (VALUES
        |  (1, 'raw',           n,  CAST(0 AS BIGINT), n,  CAST(0 AS BIGINT), t0),
        |  (2, 'exact_dedup',   n,  n - o1,  o1, n - o1, t1),
        |  (3, 'near_dup',      o1, o1 - o2, o2, r2a, t2),
        |  (4, 'decontaminate', o2, o2 - o3, o3, r3a, t3),
        |  (5, 'gopher',        o3, o3 - o4, o4, r4a, t4),
        |  (6, 'c4',            o4, o4 - o5, o5, r5a, t5),
        |  (7, 'source_mix',    o5, o5 - o6, o6, r6a, t6),
        |  (8, 'split_train',   o6, o6 - o7, o7, r7a, t7))
        |  s(stage_idx, stage, docs_in, docs_removed, docs_out, removed_alone, tokens_out)
        |ORDER BY stage_idx""".stripMargin,
    // the engine reports what its pruned scan TOUCHED (selected
    // partitions of the executed plan); the oracle predicts those
    // counts from the data because the layout is one file per
    // (day, event_type) directory — an unpruned scan reads 150 files
    // and mismatches the oracle's 1
    "layout_prune" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events),
        |f AS (SELECT * FROM e WHERE day = '2024-01-15' AND event_type = 'purchase')
        |SELECT '2024-01-15' AS day, 'purchase' AS event_type,
        |  CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS rows_read,
        |  CAST((SELECT COUNT(DISTINCT day || '/' || event_type) FROM f) AS BIGINT) AS parts_selected,
        |  CAST((SELECT COUNT(DISTINCT day || '/' || event_type) FROM f) AS BIGINT) AS files_selected,
        |  CAST((SELECT COUNT(DISTINCT day || '/' || event_type) FROM e) AS BIGINT) AS files_total""".stripMargin,
    // the instr-alphabet nibble math mirrors the engine exactly
    // (DuckDB has no conv/strtol — SURVEY §5)
    "shuffle_shards" ->
      """WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |s AS (SELECT doc_id, skey,
        |  CAST((16*(instr('0123456789abcdef', substr(skey,1,1))-1)
        |        + instr('0123456789abcdef', substr(skey,2,1))-1) % 8 AS INTEGER) AS shard FROM k)
        |SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "split_assign" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok,
        |  '0' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h FROM documents),
        |a AS (SELECT source,
        |  CASE WHEN h < printf('%05x', 58982) THEN 'train'
        |       WHEN h < printf('%05x', 62259) THEN 'val'
        |       ELSE 'test' END AS split, tok FROM d)
        |SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
        |FROM a GROUP BY source, split ORDER BY source, split""".stripMargin,
    // the dedup_components CTE verbatim, then the split_assign hash
    // threshold applied to the group key instead of the doc id
    "split_assign_grouped" ->
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
        |comp AS (SELECT id AS doc_id, LEAST(id, MIN(reach)) AS rep FROM r GROUP BY id),
        |g AS (SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS grp
        |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |a AS (SELECT grp,
        |  CASE WHEN '0' || substring(md5(CAST(grp AS VARCHAR)), 1, 4) < printf('%05x', 58982) THEN 'train'
        |       WHEN '0' || substring(md5(CAST(grp AS VARCHAR)), 1, 4) < printf('%05x', 62259) THEN 'val'
        |       ELSE 'test' END AS split FROM g)
        |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT grp) AS n_groups
        |FROM a GROUP BY split ORDER BY split""".stripMargin,
    // stride = 64 − 16 = 48; tk[a:b] is an inclusive slice, so
    // (i·48+1)..(i·48+64) is exactly the engine's 64-token window
    "chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |p AS (SELECT doc_id, tk, len(tk) AS n,
        |  CAST(CASE WHEN len(tk) <= 64 THEN 1
        |       ELSE ceil((len(tk) - 64) / 48.0) + 1 END AS BIGINT) AS ns FROM t),
        |s AS (SELECT doc_id, tk, n, unnest(generate_series(0, ns - 1)) AS seq_idx FROM p)
        |SELECT doc_id, CAST(seq_idx AS INTEGER) AS seq_idx,
        |  CAST(LEAST(64, n - seq_idx * 48) AS BIGINT) AS n_seq_tokens,
        |  array_to_string(tk[(seq_idx*48 + 1):(seq_idx*48 + 64)], ' ') AS seq_text
        |FROM s ORDER BY doc_id, seq_idx""".stripMargin,
    "pack_stats" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok FROM documents),
        |b AS (SELECT GREATEST(1, CAST(floor(512 / GREATEST(tok, 1)) AS BIGINT)) AS per_bin, tok FROM t),
        |g AS (SELECT per_bin, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens FROM b GROUP BY per_bin),
        |n AS (SELECT *, CAST(floor((n_docs + per_bin - 1) / per_bin) AS BIGINT) AS n_bins FROM g)
        |SELECT per_bin, n_docs, tokens, n_bins,
        |  CAST(tokens AS DOUBLE) / CAST(n_bins * 512 AS DOUBLE) AS utilization
        |FROM n ORDER BY per_bin""".stripMargin,
    // per-column branches as UNION ALL (DuckDB re-scans per branch;
    // the engine's single-scan Expand is the point of the operator);
    // min/max in native type, cast to VARCHAR for presentation
    "col_profile" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
           |FROM documents""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // the plan replay (identical CTE chain to mixture_plan), then per
    // doc: ⌊epochs⌋ full copies + one fractional-pass copy behind the
    // 16-bit md5 threshold; copies enumerate via generate_series
    "mixture_apply" ->
      s"""WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok FROM documents),
        |w(source, wt) AS (VALUES ${(0 until 20).map(i => s"('src$i', ${i + 1})").mkString(", ")}),
        |sw AS (SELECT CAST(SUM(wt) AS BIGINT) AS s FROM w),
        |s AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS tok_s FROM d GROUP BY source),
        |p AS (SELECT s.source, tok_s,
        |  CAST(wt AS DOUBLE) / CAST(sw.s AS DOUBLE) AS target_w
        |  FROM s JOIN w ON s.source = w.source, sw),
        |q AS (SELECT *, target_w * CAST(200000 AS DOUBLE) AS target_tok FROM p),
        |r AS (SELECT *, target_tok / CAST(tok_s AS DOUBLE) AS epochs FROM q),
        |c AS (SELECT source, CAST(floor(epochs) AS BIGINT) AS full_copies,
        |  CAST(floor((epochs - floor(epochs)) * 65536) AS BIGINT) AS cutoff FROM r),
        |k AS (SELECT doc_id, d.source,
        |  full_copies + CASE WHEN '0' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |    < printf('%05x', cutoff) THEN 1 ELSE 0 END AS n_copies
        |  FROM d JOIN c ON d.source = c.source)
        |SELECT doc_id, source, unnest(generate_series(0, n_copies - 1)) AS copy_idx
        |FROM k WHERE n_copies > 0
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // integer-valued weights keep the Σw normalization exact in any
    // summation order; IEEE order mirrors the engine: w/Σw, ·T, ÷tok_s
    "mixture_plan" ->
      s"""WITH d AS (SELECT source,
        |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok FROM documents),
        |w(source, wt) AS (VALUES ${(0 until 20).map(i => s"('src$i', ${i + 1})").mkString(", ")}),
        |sw AS (SELECT CAST(SUM(wt) AS BIGINT) AS s FROM w),
        |s AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS tok_s FROM d GROUP BY source),
        |p AS (SELECT s.source, tok_s,
        |  CAST(wt AS DOUBLE) / CAST(sw.s AS DOUBLE) AS target_w
        |  FROM s JOIN w ON s.source = w.source, sw),
        |q AS (SELECT *, target_w * CAST(200000 AS DOUBLE) AS target_tok FROM p),
        |r AS (SELECT *, target_tok / CAST(tok_s AS DOUBLE) AS epochs FROM q)
        |SELECT source, tok_s, target_w, target_tok, epochs,
        |  LEAST(CAST(1 AS DOUBLE), epochs) AS sample_rate,
        |  CAST(ceil(epochs) AS BIGINT) AS n_passes
        |FROM r ORDER BY source""".stripMargin,
    // weights as INTEGER literals cast to DOUBLE (a bare `1.0` is
    // DECIMAL in DuckDB — SURVEY §5); expression order mirrors the
    // engine exactly: (w·T)/tok_s, ratio/max, ·65536, floor
    "importance_resample" ->
      s"""WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok FROM documents),
        |w(source, wt) AS (VALUES ${(0 until 20).map(i => s"('src$i', ${i + 1})").mkString(", ")}),
        |s AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tok_s
        |      FROM d GROUP BY source),
        |t AS (SELECT CAST(SUM(tok_s) AS BIGINT) AS tot FROM s),
        |r0 AS (SELECT s.source, n_docs, tok_s, CAST(wt AS DOUBLE) AS target_w,
        |  CAST(wt AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(tok_s AS DOUBLE) AS ratio
        |  FROM s JOIN w ON s.source = w.source, t),
        |m AS (SELECT MAX(ratio) AS mxr FROM r0),
        |r AS (SELECT *, ratio / mxr AS rate,
        |  CAST(floor(ratio / mxr * 65536) AS BIGINT) AS cutoff FROM r0, m),
        |k AS (SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(tok) AS BIGINT) AS tok_kept
        |      FROM d JOIN r ON d.source = r.source
        |      WHERE '0' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < printf('%05x', cutoff)
        |      GROUP BY d.source),
        |kt AS (SELECT CAST(SUM(tok_kept) AS BIGINT) AS kt FROM k)
        |SELECT r.source, n_docs, tok_s, target_w, rate,
        |  COALESCE(n_kept, 0) AS n_kept, COALESCE(tok_kept, 0) AS tok_kept,
        |  CAST(COALESCE(tok_kept, 0) AS DOUBLE) / CAST(kt AS DOUBLE) AS achieved_share
        |FROM r LEFT JOIN k ON r.source = k.source, kt
        |ORDER BY r.source""".stripMargin,
    "source_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok FROM documents),
        |s AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tok_s
        |      FROM d GROUP BY source),
        |m AS (SELECT MAX(tok_s) AS mx FROM s),
        |r AS (SELECT source, n_docs, tok_s,
        |  sqrt(CAST(tok_s AS DOUBLE) / CAST(mx AS DOUBLE)) AS rate,
        |  CAST(floor(sqrt(CAST(tok_s AS DOUBLE) / CAST(mx AS DOUBLE)) * 65536) AS BIGINT) AS cutoff
        |  FROM s, m),
        |k AS (SELECT d.source, COUNT(*) AS n_kept
        |      FROM d JOIN r ON d.source = r.source
        |      WHERE '0' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < printf('%05x', cutoff)
        |      GROUP BY d.source)
        |SELECT r.source, n_docs, tok_s, rate, COALESCE(n_kept, 0) AS n_kept
        |FROM r LEFT JOIN k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,
    "corpus_clean" ->
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
        |nonrep AS (SELECT id AS doc_id FROM (
        |  SELECT id, LEAST(id, MIN(reach)) AS rep FROM r GROUP BY id) WHERE id <> rep),
        |tq AS (SELECT doc_id, n_chars, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |q AS (SELECT doc_id, n_chars,
        |  len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for'], x))) / len(toks) * 0.4
        |  + (1.0 - CASE WHEN len(text) > 0
        |      THEN (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) / len(text)
        |      ELSE 0.0 END) * 0.3
        |  + (CASE WHEN n_chars >= 100 THEN 0.3 ELSE 0.0 END) AS quality
        |  FROM tq),
        |g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN [toks[i] || ' ' || toks[i+1] for i in generate_series(1, len(toks)-1)]
        |    ELSE [] END) AS gram FROM tq),
        |gc2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
        |rep AS (SELECT doc_id, CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup2,
        |        CAST(SUM(c) AS BIGINT) AS total2 FROM gc2 GROUP BY doc_id),
        |badrep AS (SELECT doc_id FROM rep
        |           WHERE (CASE WHEN total2 > 0 THEN dup2 / total2 ELSE 0.0 END) >= 0.5)
        |SELECT doc_id, n_chars, quality
        |FROM q
        |WHERE quality >= 0.5 AND doc_id NOT IN (SELECT doc_id FROM nonrep)
        |  AND doc_id NOT IN (SELECT doc_id FROM badrep)
        |ORDER BY doc_id""".stripMargin)
}
