package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over `documents` — the per-document metrics a
  * training-data pipeline filters on.  Everything is narrow (no shuffle
  * at all except final presentation sort): at 100 TB these run as a
  * single scan-project stage at input bandwidth.
  */
object TextOps {

  /** Token/char statistics per document: whitespace tokens plus a
    * BPE-style pre-tokenization count (word runs + single punctuation,
    * the split shape subword tokenizers start from).
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).cast("long").as("n_tokens_bpe"),
      length(col("text")).cast("long").as("n_chars_calc"),
      (length(regexp_replace(col("text"), " ", "")) / size(toks)).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: stopword ratio, punctuation ratio, length bucket,
    * and a combined score.  The score formula is plain IEEE arithmetic
    * over exact int/int ratios, so it reproduces bit-for-bit.
    */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val stopR = stopwordRatio(col("text"))
    val punctR = punctRatio(col("text"))
    val bucket = when(col("n_chars") < 100, "short")
      .when(col("n_chars") < 300, "medium").otherwise("long")
    val score = stopR * lit(0.4) + (lit(1.0) - punctR) * lit(0.3) +
      when(col("n_chars") >= 100, lit(0.3)).otherwise(lit(0.0))
    Tables.documents(s, dir).select(
      col("doc_id"), stopR.as("stop_ratio"), punctR.as("punct_ratio"),
      bucket.as("len_bucket"), score.as("quality"))
      .orderBy(col("doc_id"))
  }

  /** The published Gopher/MassiveText quality-filter rule set (Rae et
    * al. 2021, §A1.1 — the public heuristics most LLM corpus pipelines
    * start from), per document: word-count bounds, mean word length,
    * symbol-to-word ratio (# and … are the OCR/boilerplate tells),
    * bullet-start and ellipsis-end line fractions, alphabetic-word
    * fraction, and the ≥2-of-8 stop-word containment rule; `keep` is
    * the conjunction.  Every ratio is one int/int IEEE division over
    * exact counts ⇒ oracle-exact; the per-doc flags are what a corpus
    * curator audits BEFORE dropping (rule-attributed loss, not a
    * black-box filter), which is why the flags are the output rather
    * than the filtered corpus.  Scan-only — no shuffle before the
    * presentation sort.
    */
  def qualityGopher(s: SparkSession, dir: String): DataFrame =
    qualityGopherFlags(Tables.documents(s, dir))

  /** Rule core over any (doc_id, text) frame — parameterized so the
    * spec can plant one-rule-violating fixtures. */
  private[graft] def qualityGopherFlags(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("lines", split(col("text"), "\n"))
    val nw = size(col("toks")).cast("long")
    val meanWl = length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") / nw
    val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
    val nEll = size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))
    val symRatio = (nHash + nEll).cast("double") / nw
    val nLines = size(col("lines"))
    val bulletFrac = expr(
      "size(filter(lines, l -> startswith(ltrim(l), '-') OR startswith(ltrim(l), '*') OR startswith(ltrim(l), '•')))")
      .cast("double") / nLines
    val ellLineFrac = expr("size(filter(lines, l -> endswith(rtrim(l), '...')))")
      .cast("double") / nLines
    val alphaFrac = expr("size(filter(toks, x -> x rlike '[A-Za-z]'))")
      .cast("double") / nw
    val stopHits = expr(
      "size(filter(array('the','be','to','of','and','that','have','with'), w -> array_contains(toks, w)))")
      .cast("long")
    val keep = nw >= 50 && nw <= 100000 &&
      meanWl >= 3 && meanWl <= 10 && symRatio <= 0.1 &&
      bulletFrac <= 0.9 && ellLineFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
    d.select(col("doc_id"), nw.as("n_words"), meanWl.as("mean_word_len"),
      symRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellLineFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("n_stop_hits"), keep.as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The C4 line-level cleaning rules (Raffel et al. 2020, §2.2 — the
    * other canonical published filter next to [[qualityGopher]]'s
    * doc-level set): a line survives iff it ends in terminal
    * punctuation, has ≥ 5 words, and doesn't mention javascript; the
    * document survives iff it has no curly brace, no "lorem ipsum",
    * and ≥ 3 sentences among its surviving lines.  Flags per doc, not
    * a filtered corpus — same audit-before-drop rationale as
    * quality_gopher.  All counts are exact ints ⇒ oracle-exact;
    * scan-only.  The synthetic test corpus is unpunctuated single-line
    * text, so the driver rows exercise the all-lines-dropped path
    * (honest: that IS what C4 does to such text); each rule's positive
    * path is pinned by the planted-fixture spec.
    */
  def qualityC4(s: SparkSession, dir: String): DataFrame =
    qualityC4Flags(Tables.documents(s, dir))

  /** Rule core over any (doc_id, text) frame — parameterized for the
    * planted-fixture spec. */
  private[graft] def qualityC4Flags(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("kept", expr(
        """filter(lines, l -> rtrim(l) rlike '[.!?"]$'
          |  AND size(split(trim(l), '\\s+')) >= 5
          |  AND NOT contains(lower(l), 'javascript'))""".stripMargin))
    val nLines = size(col("lines")).cast("long")
    val nKept = size(col("kept")).cast("long")
    val nKeptWords = expr(
      "aggregate(kept, 0L, (acc, l) -> acc + size(split(trim(l), '\\\\s+')))").cast("long")
    val nSent = size(regexp_extract_all(
      array_join(col("kept"), " "), lit("[.!?]"), lit(0))).cast("long")
    val hasBrace = col("text").contains("{")
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val keep = !hasBrace && !hasLorem && nSent >= 3
    d.select(col("doc_id"), nLines.as("n_lines"), nKept.as("n_kept_lines"),
      nKeptWords.as("n_kept_words"), nSent.as("n_sentences"),
      hasBrace.as("has_brace"), hasLorem.as("has_lorem"), keep.as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint (md5 of normalized text) — the dedup key. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Distinct / total 3-gram shingle counts per document. */
  def textShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(col("text"), 3)
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(array_distinct(sh)).cast("long").as("n_shingles"),
      size(sh).cast("long").as("n_total"))
      .orderBy(col("doc_id"))
  }

  /** Stopword-profile language guesser.  Scores each candidate language
    * by its marker-token hit ratio and takes the deterministic argmax
    * (score, then language code).  Heuristic → rows-only oracle; the
    * ScalaTest spec pins determinism and output coverage.
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    langIdOn(Tables.documents(s, dir))

  /** The stop-word language profiles and their argmax scorer — shared
    * by [[langId]] (per-doc verdicts) and [[langBySource]] (the
    * per-feed mix).  Ties break by the struct's (score, lang)
    * comparison, identical on both engines.
    */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "une"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo", "you", "ta"))

  private def langBest(text: Column): Column = {
    val toks = tokens(text)
    array_max(array(LangProfiles.map { case (lang, words) =>
      struct(
        (graft.functions.CountInSet.countInSet(toks, words) / size(toks)).as("score"),
        lit(lang).as("lang"))
    }: _*))
  }

  private[graft] def langIdOn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      langBest(col("text")).getField("lang").as("lang_pred"),
      langBest(col("text")).getField("score").as("lang_score"),
      col("lang").as("lang_label"))
      .orderBy(col("doc_id"))

  /** Per-feed language mix: the [[langId]] verdict aggregated to a
    * (source, predicted language) matrix with exact ppm shares — the
    * "which crawl feed is drifting non-English" dashboard a curator
    * reads before adjusting mixture weights.
    *
    * Scale shape: one scan-project (the scorer is a codegen'd array
    * argmax riding the scan), one map-side-combined
    * |sources|×|langs|-key aggregate, the |sources|-row totals
    * broadcast back.  Shares are ppm integer division — exact.
    */
  def langBySource(s: SparkSession, dir: String): DataFrame = {
    val byCell = Tables.documents(s, dir)
      .select(col("source"), langBest(col("text")).getField("lang").as("lang_pred"))
      .groupBy(col("source"), col("lang_pred")).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(eager = false) // shared by the per-source totals
    val bySrc = byCell.groupBy(col("source")).agg(sum(col("n_docs")).as("n_src"))
    byCell.join(broadcast(bySrc), Seq("source"))
      .select(col("source"), col("lang_pred"), col("n_docs"),
        expr("n_docs * 1000000 div n_src").as("share_ppm"))
      .orderBy(col("source"), col("lang_pred"))
  }

  /** Character-n-gram language profiles (the TextCat family's public
    * method, reduced to an oracle-exact scorer): per language, the
    * most frequent character n-grams from published frequency lists —
    * trigrams for the Latin and Cyrillic languages, single Han
    * characters for Chinese (character identity IS the signal there).
    * Shared by [[langIdNgram]] and its spec.
    */
  private[operators] val CharNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch", "ich", "nde", "die", "und", "che"),
    "en" -> Seq("the", " th", "he ", "and", "ing", "ion", " of", "ed "),
    "es" -> Seq(" de", "os ", " la", "ión", "es ", "ent", "que", " co"),
    "fr" -> Seq("es ", " de", "ent", "le ", " le", "ait", "que", "eur"),
    "ru" -> Seq(" и ", "ого", "ать", "ост", "ени", "ние", "ств", "при"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  /** Charset-robust language guesser: character-n-gram profile scoring
    * (TextCat's public method) next to the stopword profile of
    * [[langId]].  The stopword profile is blind outside Latin scripts
    * — no marker token ever matches, every score is 0 and the argmax
    * degenerates to the tie-break — while character n-grams see every
    * script.  Score = Σ_g occurrences(g) / char_length, where
    * occurrences comes from the exact length-difference-of-replace
    * identity — an integer quotient both engines compute bit-equal, so
    * the struct argmax (score, then language code) stays ORACLE-EXACT
    * like lang_id's.  Per-row codegen'd string work, no shuffle: the
    * 100 TB shape is a projection.
    */
  def langIdNgram(s: SparkSession, dir: String): DataFrame =
    langIdNgramOn(Tables.documents(s, dir))

  private[graft] def langIdNgramOn(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    // exact occurrence count via the length-difference-of-replace
    // identity (plain substring replace, not regex — codegen'd and
    // byte-identical across engines); greatest(len, 1) keeps the
    // empty-text row at score 0 instead of engine-divergent 0/0
    def occurrences(g: String): Column =
      (length(t) - length(replace(t, lit(g), lit("")))) / lit(g.length)
    val scored: Column = array(CharNgramProfiles.map { case (lang, grams) =>
      struct(
        (grams.map(occurrences).reduce(_ + _) / greatest(length(t), lit(1))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    docs.select(
      col("doc_id"),
      array_max(scored).getField("lang").as("lang_pred"),
      array_max(scored).getField("score").as("lang_score"),
      col("lang").as("lang_label"))
      .orderBy(col("doc_id"))
  }

  /** Rabin–Karp rolling-hash fingerprint of the normalized text (the
    * shift-tolerant chunk-identity hash; 2⁶⁴ polynomial → rows-only
    * oracle, pinned by a determinism/uniqueness spec).
    */
  def textRollhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.RollingHash64.rollingHash64(normText(col("text"))).as("rh"))
      .orderBy(col("doc_id"))

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03): hash every [[WinnowK]]-token gram ([[graft.functions
    * .WindowHashes]], the dedup_substr hash), then keep each
    * [[WinnowW]]-window's minimum (rightmost on ties) via the native
    * O(n) [[graft.functions.WinnowSelect]] expression.  The selected
    * (pos, fp) set is the standard partial-copy detector: any shared
    * run of WinnowW + WinnowK − 1 tokens between two documents is
    * GUARANTEED a shared fingerprint, at an expected 2/(WinnowW+1)
    * density (~4.4× fewer rows than every gram here) — the
    * cheap-to-index middle ground between shingle-set Jaccard
    * (order-blind) and full ExactSubstr (every window).
    *
    * Scale shape: the whole pipeline is ONE pruned scan → codegen
    * projection (token hashes, window hashes, deque selection all
    * map-side) → explode → presentation sort; nothing shuffles but
    * the emitted fingerprints themselves.  Oracle-EXACT: DuckDB
    * replays both polynomials in HUGEINT mod-2⁶⁴ arithmetic and the
    * rightmost-tie window minimum as min(struct(fp, −pos)).
    */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.WinnowSelect.winnowSelect(
          graft.functions.WindowHashes.windowHashes(tokens(col("text")), WinnowK),
          WinnowW)).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
      .orderBy(col("doc_id"), col("pos"))

  /** Gram size (tokens per hashed window) for [[winnowFingerprint]]. */
  private[graft] val WinnowK = 4
  /** Selection-window size (grams per minimum) for [[winnowFingerprint]]. */
  private[graft] val WinnowW = 8

  /** Per-document unigram concentration: the Simpson/Herfindahl index
    * Σp² over the doc's token distribution and its inverse, the
    * "effective vocabulary size" — the diversity twin of
    * [[textRepetition]]'s duplicate-mass signals (spam that loops a
    * few phrases concentrates to Σp² → 1; healthy prose spreads to
    * → 1/n_distinct).  The native [[graft.functions.TokenDiversity]]
    * expression keeps Σcnt² as an EXACT long in one scan-local hash
    * pass (no corpus-wide (doc, term) shuffle), so the two derived
    * doubles are single divisions of exact integers —
    * IEEE-identical cross-engine ⇒ oracle-EXACT.
    */
  def tokenDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.TokenDiversity.tokenDiversity(tokens(col("text"))).as("d"))
      .select(col("doc_id"), col("d.n_tokens").as("n_tokens"),
        col("d.n_distinct").as("n_distinct"), col("d.sum_sq").as("sum_sq"))
      .withColumn("simpson",
        col("sum_sq").cast("double") / (col("n_tokens") * col("n_tokens")).cast("double"))
      .withColumn("eff_vocab",
        (col("n_tokens") * col("n_tokens")).cast("double") / col("sum_sq").cast("double"))
      .orderBy(col("doc_id"))

  /** Vocabulary coverage curve: the fraction of all token OCCURRENCES
    * covered by the top-V most frequent terms, for V ∈ {10, 100,
    * 1000} — the out-of-vocabulary rate a V-entry vocabulary would
    * pay on this corpus (the first question when sizing a tokenizer
    * or a stopword list).  Ranking order is the TOTAL (count desc,
    * term), so the boundary at each V is engine-deterministic.
    *
    * Scale shape: token counts collapse map-side into one
    * (term)-keyed aggregate, checkpointed once; each V is then a
    * TakeOrderedAndProject (top-V rows only, map-side partial — no
    * global sort, no corpus-wide window/row_number, which would
    * funnel the whole vocabulary through one task) feeding a 1-row
    * sum.  Driver state = 3 scalar rows.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true)
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val perV = Seq(10, 100, 1000).map { v =>
      counts.orderBy(col("cnt").desc, col("term")).limit(v)
        .agg(sum(col("cnt")).as("covered_tokens"))
        .select(lit(v).as("v"), col("covered_tokens"))
    }.reduce(_ unionAll _)
    perV.crossJoin(total)
      .select(col("v"), col("covered_tokens"), col("total_tokens"),
        (col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("coverage"))
      .orderBy(col("v"))
  }

  /** Global top-20 terms by document frequency — the corpus-vocabulary
    * probe (stopword discovery, boilerplate detection).  Explode
    * distinct tokens per doc → keyed count with map-side partial
    * aggregation → TakeOrderedAndProject: at 100 TB the shuffle
    * carries one row per distinct (partition, term), and only 20 rows
    * reach the driver.
    */
  def topTerms(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(20)

  /** Corpus-relative quality score: mean corpus term frequency of a
    * doc's tokens plus its out-of-vocabulary ratio against the top-1000
    * vocabulary — the unigram-LM quality filter shape (gibberish = low
    * commonness + high OOV) without a `log`, so every number is an
    * exact-int IEEE quotient and reproduces bit-for-bit across engines.
    *
    * Two passes: a global vocab aggregate (top-1000 with a total
    * tie-break — same TakeOrdered shape as [[topTerms]]), broadcast to
    * a per-token left join, re-aggregated per doc.  At 100 TB the
    * vocab is O(1) state and the scoring pass is one scan + one
    * doc-keyed aggregation.
    */
  def textCommonness(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(1000)
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(
        (sum(coalesce(col("tf"), lit(0L))).cast("double") / count(lit(1))).as("avg_tf"),
        (sum(when(col("tf").isNull, 1L).otherwise(0L)).cast("double") / count(lit(1))).as("oov_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Top-20 adjacent character pairs by corpus count — the statistic
    * BPE training computes for its first merge.  The explode is pure
    * map-side CPU; only the ~|alphabet|² distinct pair keys cross the
    * shuffle (partial aggregation combines per partition), so at
    * 100 TB this runs at scan bandwidth with an O(1) shuffle.
    */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(graft.functions.CharPairs.charPairs(col("text"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Gopher-style repetition signals per document: duplicate-token
    * mass, most-frequent-2-gram mass, and duplicated-2-gram mass — the
    * filters every production training pipeline runs to drop
    * boilerplate/looping text.  (The corpus has no newlines, so the
    * duplicate-LINE fraction appears at token granularity.)
    *
    * All three fractions are exact-int IEEE quotients from ONE native
    * expression pass per row ([[graft.functions.RepetitionStats]]) —
    * a pure scan-project with zero shuffle: per-doc statistics need no
    * cross-document data, so a corpus-wide `groupBy(doc_id, gram)`
    * would shuffle the whole token stream for nothing.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val r = graft.functions.RepetitionStats.repetitionStats(tokens(col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"), r.as("r"))
      .select(col("doc_id"),
        (lit(1.0) - col("r.n_distinct") / col("r.n_tokens")).as("dup_token_frac"),
        when(col("r.total_2grams") > 0, col("r.top_2gram") / col("r.total_2grams"))
          .otherwise(0.0).as("top_2gram_frac"),
        when(col("r.total_2grams") > 0, col("r.dup_2grams") / col("r.total_2grams"))
          .otherwise(0.0).as("dup_2gram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Within-document duplicate-LINE signals (Gopher's dup-line-frac and
    * dup-line-char-frac) over a caller-supplied line split: the
    * fraction of lines that are repeats of an earlier line, and the
    * fraction of line characters sitting in repeated lines.  Pure
    * per-row HOF arithmetic (exact int/int IEEE quotients) — zero
    * shuffle at any corpus size.
    *
    * The synthetic corpus has no newlines — its line-granularity
    * duplication signal appears at token granularity in
    * [[textRepetition]] and at chunk granularity in
    * [[graft.operators.Dedup.dedupChunk]] (both all-zero-free), so
    * this stays a library operator for real-line corpora
    * (`lineRepetition(split(col("text"), "\n"))`), spec-pinned on
    * planted multi-line docs rather than shipped as a degenerate
    * all-zero driver entry.
    */
  def lineRepetition(lines: Column): Column = {
    val n = size(lines)
    val dis = array_distinct(lines)
    val per = transform(dis, l =>
      struct(size(filter(lines, x => x === l)).as("cnt"), length(l).as("len")))
    val totalChars = aggregate(lines, lit(0L), (acc, x) => acc + length(x))
    val dupChars = aggregate(per, lit(0L), (acc, s) =>
      acc + when(s.getField("cnt") > 1,
        s.getField("cnt").cast("long") * s.getField("len")).otherwise(0L))
    struct(
      when(n > 0, lit(1.0) - size(dis).cast("double") / n)
        .otherwise(0.0).as("dup_line_frac"),
      when(totalChars > 0, dupChars.cast("double") / totalChars)
        .otherwise(0.0).as("dup_line_char_frac"))
  }

  /** Top-3 most distinctive terms per document by a log-free TF-IDF
    * (tf · N / df — same ranking intent as tf·log(N/df) without the
    * transcendental, so every score is an exact-int IEEE quotient the
    * oracle replays bit-for-bit) — the inverted-index weighting
    * primitive behind retrieval and keyword extraction.
    *
    * One (doc, term) aggregate feeds BOTH the tf side and the df
    * aggregate (merge-hinted join → the exchange is reused, same
    * pattern as dedup_chunk); N broadcasts as a 1-row aggregate; the
    * per-doc top-3 window shuffles the bounded distinct-pair frame on
    * doc_id.
    */
  def topTfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = pairs.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = pairs.hint("merge").join(dfreq.hint("merge"), "term")
      .join(broadcast(n))
      .select(col("doc_id"), col("term"),
        ((col("tf") * col("n_docs")).cast("double") / col("dfc")).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** PII-scrub patterns: email-shaped tokens and digit runs.  Kept
    * RE2-safe (no backreferences/lookaround) so the identical pattern
    * runs on Spark's java.util.regex and RE2-based engines (the
    * oracle) with the same match semantics.  Real deployments extend
    * the alternation (phone formats, IP literals, ID schemes) — the
    * plan shape is invariant in the pattern.
    */
  private[graft] val PiiPattern =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]+"

  /** PII scrubbing: redact email-shaped tokens and digit runs from a
    * free-text column, keeping a per-row redaction count — the privacy
    * pass a training-data pipeline runs before anything else sees the
    * text, with the "how much PII per shard" audit riding along for
    * free.  Pure scan-project (the regex engine is the whole cost):
    * zero shuffle at any corpus size beyond the presentation sort.
    * Runs over `events.props`, the synthetic corpus' only column with
    * digit content.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        regexp_count(col("props"), lit(PiiPattern)).cast("long").as("n_redactions"),
        regexp_replace(col("props"), PiiPattern, "<PII>").as("clean"))
      .filter(col("n_redactions") > 0)
      .orderBy(col("event_id"))

  /** Corpus token-length histogram with cumulative token share — the
    * curation statistic behind length filters and sequence-packing
    * decisions ("what fraction of training tokens live in docs shorter
    * than X").  One narrow scan → 32-token-wide bucket keys (bounded
    * key space, map-side partials collapse each partition to one row
    * per bucket) → the running share is a window over the
    * POST-aggregate frame (tens of rows at any corpus size), so nothing
    * corpus-sized is ever sorted.
    */
  def tokenHistogram(s: SparkSession, dir: String): DataFrame =
    tokenHistogramOver(Tables.documents(s, dir), size(tokens(col("text"))).cast("long"))

  /** [[tokenHistogram]] under a REAL BPE vocabulary: the per-doc count
    * is Σ over whitespace words of |BPE segmentation| using the bundled
    * merge table ([[graft.functions.Bpe.default]]; swap in a model's
    * own merges via [[graft.functions.Bpe.loadMergesFile]]) — so
    * length-filter and packing decisions are stated in the unit that
    * actually bills against a model's context window, not a whitespace
    * proxy.  Same scan shape: the merge loop is per-row native-
    * expression CPU, the aggregate keys stay the bounded bucket space.
    * BPE is an iterative rewrite system — not SQL-expressible → rows-
    * only oracle; the spec pins exact segmentations against an
    * independent replica of the merge loop.
    */
  def tokenHistogramBpe(s: SparkSession, dir: String): DataFrame =
    tokenHistogramOver(Tables.documents(s, dir),
      graft.functions.Bpe.bpeTokenCount(tokens(col("text")), graft.functions.Bpe.default))

  /** Shared histogram tail: 32-wide buckets of a per-doc token count,
    * cumulative token share over the POST-aggregate frame (tens of
    * rows at any corpus size — see [[tokenHistogram]]'s scale note).
    */
  private def tokenHistogramOver(docs: DataFrame, tok: Column): DataFrame = {
    val h = docs
      .select((floor(tok / lit(32)) * 32).cast("long").as("bucket"), tok.as("tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    h.select(col("bucket"), col("n_docs"), col("tokens"),
      (sum(col("tokens")).over(wCum).cast("double") /
        sum(col("tokens")).over(wAll).cast("double")).as("cum_share"))
      .orderBy(col("bucket"))
  }

  /** Corpus-trained bigram-LM quality score — the CCNet-style language-
    * model filter: train bigram statistics ON the corpus itself, score
    * each doc by its add-1-smoothed bigram cross-entropy
    * bits = −(1/N_d)·Σ n(w₁,w₂)·log₂((C(w₁,w₂)+1)/(C(w₁·)+V)).
    * Low bits ⇒ the doc is made of corpus-typical word transitions
    * (boilerplate reads LOW); high bits ⇒ rare/noisy transitions —
    * the tails on BOTH ends are what a curation pass inspects.
    *
    * Scale shape: doc-level bigram TYPE counts first (one aggregate —
    * repeated bigrams inside a doc collapse map-side), then corpus
    * C(w₁,w₂)/C(w₁·) as keyed aggregates over those type rows;
    * scoring joins are linear in type rows and a hot bigram ("of
    * the") is ONE row on each count side, so the SMJ probe streams.
    * V (distinct left words) is a 1-row broadcast.  FLOAT DISCIPLINE:
    * a per-doc Σ of doubles is shuffle-order-dependent, so each doc's
    * contributions fold LEFT-TO-RIGHT over a sort_array'd (w₁,w₂)
    * list — bit-identical on any partitioning (spec pins this against
    * an independent Scala replica, exact ==).  Not SQL-oracle-able
    * (log₂ across engines differs in the last bit) → rows-only.
    * Docs with <2 tokens have no bigram and score NULL with
    * n_bigrams = 0 (kept, not dropped — a filter needs the row).
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val occ = base
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      // LAZY checkpoint: four consumers (C₂, C₁, V's base, the probe)
      // would each re-run the scan→tokenize→zip→aggregate pipeline —
      // AQE declines to reuse these exchanges (consumer-specific
      // pruning breaks canonical equality), so the type rows
      // materialize ONCE on first action instead; lazy, so building
      // the plan stays action-free (the [[Similarity]] per-call
      // localCheckpoint precedent, at type-row not corpus width)
      .localCheckpoint(eager = false)
    val c2 = occ.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("c2"))
    val c1 = occ.groupBy(col("w1")).agg(sum(col("n")).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    // log₂ via ln(x)/ln(2) with ln = Math.log on both the engine and
    // the spec replica — same libm, bit-identical
    val contrib = col("n") *
      (log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")) /
        log(lit(2.0)))
    val perDoc = occ
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(broadcast(v))
      .select(col("doc_id"), col("w1"), col("w2"), col("n"), contrib.as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        sort_array(collect_list(struct(col("w1"), col("w2"), col("contrib")))).as("cs"))
      .select(col("doc_id"), col("n_bigrams"),
        (-expr("aggregate(cs, 0D, (acc, x) -> acc + x.contrib)") /
          col("n_bigrams").cast("double")).as("bits_per_bigram"))
    base.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("bits_per_bigram"))
  }

  /** Driver entry: bigram-LM scores over `documents`. */
  def lmScoreDocs(s: SparkSession, dir: String): DataFrame =
    lmScore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Canonical-form audit over `documents` — length, md5 fingerprint
    * and a changed flag per doc under [[graft.functions.NormalizeText]]
    * (NFC + control-strip + space-collapse; the transform every text
    * pipeline runs before hashing so encoding artifacts can't split
    * one document into several hash identities).  Pure scan-project,
    * zero shuffle beyond the presentation sort; the md5 pins the
    * normalized BYTES cross-engine, not just the length.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val norm = graft.functions.NormalizeText.normalizeText(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), norm.as("norm"), col("text"))
      .select(col("doc_id"),
        length(col("norm")).cast("long").as("n_norm"),
        md5(col("norm")).as("fp"),
        (col("norm") =!= col("text")).as("changed"))
      .orderBy(col("doc_id"))
  }

  /** BM25-shaped keyword retrieval: rank documents against a query
    * term set with the Robertson/Sparck-Jones term-frequency
    * saturation and length normalization (k1 = 1.2, b = 0.75) — the
    * retrieval primitive behind corpus search, RAG candidate
    * generation, and "find me training docs about X" curation pulls.
    *
    * LOG-FREE + INTEGER-SUMMED for oracle exactness: standard BM25's
    * idf = ln((N−df+0.5)/(df+0.5)) is transcendental and differs
    * across engines in the last ulp (the measured [[lmScoreDocs]]
    * problem), so the idf here is the RATIO itself, un-logged —
    * a strictly monotone transform of each term's weight, preserving
    * single-term orderings while weighting rare terms more
    * aggressively than the log form (documented semantics, not an
    * approximation bug).  Every remaining op is IEEE +,*,/ — each
    * correctly rounded, so with BOTH engines evaluating the same
    * expression tree the per-term contribution is bit-identical —
    * and each contribution is floored to an e9-scaled INTEGER before
    * the per-doc sum, so the sum is exact in any order (the
    * contribution-sum trick [[lmScoreDocs]] couldn't use because log
    * itself already diverged).  Ranking is total: (score desc,
    * doc_id), so the top-k cut is deterministic.
    *
    * Scale shape: the query set is ≤ nTerms rows (broadcast); tf rows
    * exist only for (doc, matched-term) — the corpus-wide work is one
    * df aggregate (map-side partials over per-doc distinct terms,
    * the [[topTerms]] shape) + one matched-token aggregate.  Nothing
    * corpus-sized crosses unaggregated.
    */
  def keywordTopK(docs: DataFrame, queryTerms: DataFrame, k: Int): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val dl = t.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val stats = t.agg(count(lit(1)).as("n_docs"),
      sum(size(col("tk")).cast("long")).as("n_tokens"))
    val tf = t.select(col("doc_id"), explode(col("tk")).as("term"))
      .join(broadcast(queryTerms), "term")
      .groupBy(col("doc_id"), col("term"), col("df"))
      .agg(count(lit(1)).as("tf"))
    // expression tree mirrored token-for-token in the oracle SQL —
    // every node a correctly-rounded IEEE double op, so the floor'd
    // e9 integer is engine-independent
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("n_tokens").cast("double") / col("n_docs").cast("double")))))
    tf.join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"), floor(idf * tfn * lit(1e9)).as("c_e9"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_e9")).as("score_e9"))
      .orderBy(col("score_e9").desc, col("doc_id"))
      .limit(k)
  }

  /** Driver entry: the query set derives deterministically from the
    * corpus itself — the `nTerms` highest-document-frequency terms of
    * length ≥ 6 (df desc, term asc: a total order both engines
    * replay), standing in for a user query the synthetic corpus can't
    * ship.  `df` rides the query frame so scoring needs no second
    * corpus pass.
    */
  def keywordTopkEntry(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val qt = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(length(col("term")) >= 6)
      .orderBy(col("df").desc, col("term")).limit(4)
    keywordTopK(docs, qt, 20)
  }

  /** Compression-ratio quality profile: deflate_len(text)/byte_len per
    * doc ([[graft.functions.DeflateLen]] — the MassiveText/RefinedWeb
    * curation signal: templated spam compresses far below prose,
    * random noise barely compresses), histogrammed per source in
    * tenth-wide buckets.  Both TAILS of the histogram are what a
    * curation pass inspects, and a per-source shift is an ingest
    * regression flag (a crawler suddenly emitting boilerplate moves a
    * whole source's mass down-bucket).
    *
    * Pure scan-project into a bounded-key aggregate (|sources|×12
    * keys, map-side partials): input-bandwidth at any corpus size.
    * Per-bucket min/max ratios ride along (exact int/int IEEE
    * quotients; order-free aggregates, so no sum-order caveat).
    * Deflate isn't SQL-expressible → rows-only; the spec pins the
    * expression against an independent JVM replay.
    */
  def compressionRatio(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), octet_length(col("text")).cast("long").as("raw"),
        graft.functions.DeflateLen.deflateLen(col("text")).as("defl"))
      .filter(col("raw") > 0)
      .select(col("source"),
        (col("defl").cast("double") / col("raw").cast("double")).as("ratio"))
      // deflate overhead can push tiny/incompressible docs past 1.0;
      // keep them visible in two over-unity buckets instead of
      // clamping into the 0.9s
      .select(col("source"), least(floor(col("ratio") * 10), lit(11L)).as("bucket"),
        col("ratio"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ratio")).as("min_ratio"), max(col("ratio")).as("max_ratio"))
      .orderBy(col("source"), col("bucket"))

  /** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016's
    * learn-BPE loop): [[bpePairs]] computes the statistic behind the
    * FIRST merge; this runs the whole greedy loop — per round, count
    * adjacent symbol pairs over the corpus segmentation and merge the
    * most frequent pair — producing the merges table the
    * [[graft.functions.Bpe]] apply-side machinery (`bpe_segment` /
    * `bpe_token_count` / chunkers) consumes.  Trains on the corpus
    * it will tokenize — the on-corpus tokenizer-fitting step of a
    * training-data pipeline.
    *
    * Scale shape: the corpus collapses ONCE to its word HISTOGRAM
    * (types × counts — the classic learn-BPE working set; vocab-sized,
    * not corpus-sized, and checkpointed so rounds never rescan text).
    * Each round is one map-side pass over the histogram — the native
    * [[graft.functions.BpeSegment]] replays merges-so-far per word
    * type, adjacent pairs explode count-weighted — into a bounded
    * (pair)-keyed aggregate with map-side partials, and ONE (count,
    * pair) argmax row reaches the driver (TakeOrderedAndProject).
    * Driver state = the merges list itself.  Re-segmenting from
    * scratch per round trades O(rounds) recompute for zero
    * distributed state — the standard trade at modest merge counts;
    * a production 50k-merge train would checkpoint segmentations
    * every few hundred rounds instead.
    *
    * DETERMINISM: counts are exact long sums; argmax order (count
    * desc, left, right) is total — the learned table is identical on
    * any partitioning.  Training stops early when no pair repeats
    * (count < 2: merging a singleton pair cannot compress anything).
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"bpeTrain: nMerges=$nMerges outside [1, 4096] (each merge is a corpus pass)")
    val words = docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    // NOT AQE-scoped (unlike the LR/Lloyd trainer loops): the per-round
    // pair aggregate's key space is vocabulary-proportional, so its
    // honest reduce width is corpus-adaptive — exactly what AQE's
    // coalescing provides.  Measured r20: AQE-off here traded 25 jobs
    // for ~770 near-empty reduce tasks and lost.
    try {
      var done = false
      while (!done && merges.length < nMerges) {
        val table = new graft.functions.BpeTable(
          merges.map(m => (m._1, m._2)).toArray)
        val top = words
          .select(col("cnt"), graft.functions.Bpe.bpeSegment(col("w"), table).as("s"))
          .filter(size(col("s")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i+1] AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < 2) done = true
        else merges += ((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
      }
      merges.toSeq
    } finally {
      // release the checkpointed histogram blocks (the triangleCounts
      // discipline) — without this every train call leaks its blocks
      // for the session's lifetime
      words.unpersist()
    }
  }

  /** Driver entry: 24 merges learned from the corpus — (rank, left,
    * right, pair_count).  Iterative rewrite system ⇒ rows-only oracle;
    * the spec pins an independent sequential replica trainer and a
    * hand-computable planted corpus.
    */
  def bpeTrainEntry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeTrain(Tables.documents(s, dir), 24).zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Heavy-hitter terms via the Space-Saving sketch
    * ([[graft.functions.SpaceSavingAgg]]) — the bounded-memory twin of
    * the exact `top_terms` path: 256 counters per partial, merged
    * map-side, so the term UNIVERSE never shuffles (at 100 TB the
    * exact path's (term)-keyed exchange carries the whole vocabulary;
    * this carries `capacity` structs per task).  Rows-only by design
    * (a sketch has no SQL image); the ScalaTest oracle pins the
    * `est − err ≤ true ≤ est` envelope and the N/capacity tracking
    * guarantee against exact counts.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .agg(graft.functions.SpaceSavingAgg.spaceSaving(col("term"), 256, 32).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.term").as("term"), col("h.est").as("est"),
        col("h.err").as("err"))
      .orderBy(desc("est"), col("err"), col("term"))

  /** Sentence segmentation stats — the sequence-length profile a
    * packing/chunking pass reads before sizing context windows:
    * sentences split on terminal-punctuation runs `[.!?]+`, words per
    * sentence by the corpus whitespace convention.  avg is one exact
    * int/int IEEE division.
    *
    * Semantics parity: Spark `split` and DuckDB `string_split_regex`
    * both keep trailing empty segments, so the trim→non-empty filter
    * yields identical sentence lists; docs with NO sentence (empty/
    * punctuation-only text) are excluded on both sides.
    *
    * Scale shape: pure scan-project — segmentation, per-sentence word
    * counts, and the per-doc fold all run inside one codegen stage
    * via higher-order array functions; zero shuffles, zero explodes
    * (the wc array never leaves the row).
    */
  def sentenceStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("sents", expr(
        "filter(transform(split(text, '[.!?]+'), x -> trim(x)), x -> x != '')"))
      .filter(size(col("sents")) > 0)
      .withColumn("wc", expr("transform(sents, x -> size(split(x, '\\\\s+')))"))
      .select(col("doc_id"),
        size(col("sents")).cast("long").as("n_sentences"),
        expr("aggregate(wc, 0L, (a, x) -> a + x)").as("n_words"),
        expr("array_max(wc)").cast("long").as("max_sentence_words"),
        (expr("aggregate(wc, 0L, (a, x) -> a + x)").cast("double") /
          size(col("sents")).cast("double")).as("avg_sentence_words"))
      .orderBy(col("doc_id"))

  /** Collocation mining: the top word bigrams by LIFT (observed
    * bigram count over its independence expectation) at a minimum
    * support — the phrase/multi-word-expression detector ("new york",
    * "machine learning") a tokenizer-vocabulary or stop-phrase pass
    * reads.  Lift is PMI without the log: c_ab·N / (c_a·c_b) over the
    * bigram table's own left/right marginals — exact-integer IEEE
    * quotients (the log-free top_tfidf discipline), so ranking and
    * values are oracle-EXACT; the support floor is what keeps hapax
    * pairs (lift → N) out, the standard collocation guard.
    *
    * Scale shape: bigram TYPE counts collapse map-side (hot pairs are
    * one row each); marginals are keyed aggregates over the skinny
    * type table; N broadcasts; the cut is TakeOrderedAndProject under
    * the total (lift desc, a, b) order.  [[Analytics.basketPairs]] is
    * the same contingency algebra on co-purchase baskets.
    */
  def collocations(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(s, dir)
      .select(tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("b"))
      .groupBy(col("b.w1").as("a"), col("b.w2").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(eager = false) // three consumers: marginals ×2 + probe
    val la = bi.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val rb = bi.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    val tot = bi.agg(sum(col("n_ab")).as("n"))
    bi.filter(col("n_ab") >= 5)
      .join(la, Seq("a")).join(rb, Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n_ab"),
        ((col("n_ab") * col("n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(desc("lift"), col("a"), col("b"))
      .limit(20)
  }

  /** Mergeable distinct-vocabulary sketches — the materialized-view
    * story for COUNT DISTINCT at 100 TB: per source a DataSketches
    * HLL sketch of the token vocabulary (Spark's native
    * `hll_sketch_agg`, lgK = 12 ⇒ ~1.6 % RSE at 4 KB of state), plus
    * an `(all)` row whose estimate comes from UNIONING the per-source
    * sketches — never rescanning.  Register-wise max makes HLL union
    * EXACTLY the sketch of the union multiset, so merge ≡ recompute
    * holds for the sketch itself (spec-pinned as bit-equal
    * estimates), the same algebra [[Analytics.aggIncremental]] pins
    * for scalar aggregates.  Per-source sketches are what a pipeline
    * PERSISTS: tomorrow's delta sketch unions in for free.
    *
    * Scale shape: the only corpus-sized work is the token explode
    * into source-keyed sketch partials (map-side merged, 4 KB each);
    * everything downstream is |sources| rows.  Sketch ⇒ rows-only;
    * the spec pins the 5 % envelope against exact distincts and the
    * union-equals-direct property.
    */
  def distinctSketch(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"))
      .agg(expr("hll_sketch_agg(term, 12)").as("sk"))
      .localCheckpoint(eager = false) // per-source rows + the union row
    per.select(col("source"),
        expr("hll_sketch_estimate(sk)").as("est_distinct"))
      .unionAll(per.agg(expr("hll_union_agg(sk)").as("u"))
        .select(lit("(all)").as("source"),
          expr("hll_sketch_estimate(u)").as("est_distinct")))
      .orderBy(col("source"))
  }

  /** Per-feed readability profile — the Flesch-style reading-ease
    * score a curation pipeline uses to separate prose feeds from
    * boilerplate/code-heavy ones before mixing.  Per source: document
    * and token counts plus words-per-sentence, syllables-per-word
    * (vowel-group proxy — the standard dictionary-free approximation)
    * and the composed score 206.835 − 1.015·wps − 84.6·spw.
    *
    * Exactness: all three counters are explicit-class regex run
    * counts ([^ \t\n\r]+ words, [.!?]+ sentence ends, vowel groups) —
    * explicit classes because Java's \S and RE2's \S disagree on
    * vertical tab; counts are exact longs, and the two ratios + score
    * are the same IEEE expression tree on both engines (literals
    * correctly round to identical doubles).  Non-Latin text scores 0
    * syllables — deterministic, and exactly why the per-SOURCE view
    * is read next to [[langBySource]].
    *
    * Scale shape: scan-project (regex counts are map-side) into a
    * ≤|sources|-key aggregate; nothing corpus-sized shuffles.
    */
  def readabilityBySource(s: SparkSession, dir: String): DataFrame = {
    val wps = col("n_words").cast("double") /
      greatest(col("n_sentences"), lit(1L))
    val spw = col("n_syllables").cast("double") /
      greatest(col("n_words"), lit(1L))
    Tables.documents(s, dir)
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit("[^ \\t\\n\\r]+"), lit(0)))
          .cast("long").as("w"),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long").as("sn"),
        size(regexp_extract_all(col("text"), lit("[aeiouyAEIOUY]+"), lit(0)))
          .cast("long").as("sy"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sn")).as("n_sentences"), sum(col("sy")).as("n_syllables"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        wps.as("words_per_sentence"), spw.as("syllables_per_word"),
        (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("flesch"))
      .orderBy(col("source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "readability_by_source" -> (readabilityBySource _),
    "distinct_sketch" -> (distinctSketch _),
    "collocations" -> (collocations _),
    "sentence_stats" -> (sentenceStats _),
    "heavy_hitters" -> (heavyHitters _),
    "bpe_train" -> (bpeTrainEntry _),
    "compression_ratio" -> (compressionRatio _),
    "keyword_topk" -> (keywordTopkEntry _),
    "text_normalize" -> (textNormalize _),
    "lm_score" -> (lmScoreDocs _),
    "pii_scrub" -> (piiScrub _),
    "token_histogram" -> (tokenHistogram _),
    "token_histogram_bpe" -> (tokenHistogramBpe _),
    "top_tfidf_terms" -> (topTfidfTerms _),
    "text_repetition" -> (textRepetition _),
    "text_stats" -> (textStats _),
    "text_quality" -> (textQuality _),
    "quality_gopher" -> (qualityGopher _),
    "quality_c4" -> (qualityC4 _),
    "text_fingerprint" -> (textFingerprint _),
    "text_shingles" -> (textShingles _),
    "text_rollhash" -> (textRollhash _),
    "winnow_fingerprint" -> (winnowFingerprint _),
    "vocab_coverage" -> (vocabCoverage _),
    "token_diversity" -> (tokenDiversity _),
    "lang_id" -> (langId _),
    "lang_by_source" -> (langBySource _),
    "lang_id_ngram" -> (langIdNgram _),
    "top_terms" -> (topTerms _),
    "text_commonness" -> (textCommonness _),
    "bpe_pairs" -> (bpePairs _))

  def oracleSql: Map[String, String] = Map(
    // explicit regex classes (Java \S vs RE2 \S disagree on \x0B);
    // counts exact longs, ratios/score one shared IEEE expression tree
    "readability_by_source" ->
      """WITH d AS (SELECT source,
        |  len(regexp_extract_all(text, '[^ \t\n\r]+')) AS w,
        |  len(regexp_extract_all(text, '[.!?]+')) AS sn,
        |  len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS sy
        |  FROM documents),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_words,
        |  CAST(SUM(sn) AS BIGINT) AS n_sentences,
        |  CAST(SUM(sy) AS BIGINT) AS n_syllables
        |  FROM d GROUP BY source)
        |SELECT source, n_docs, n_words, n_sentences, n_syllables,
        |  CAST(n_words AS DOUBLE) / GREATEST(n_sentences, 1) AS words_per_sentence,
        |  CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1) AS syllables_per_word,
        |  206.835 - 1.015 * (CAST(n_words AS DOUBLE) / GREATEST(n_sentences, 1))
        |          - 84.6 * (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1)) AS flesch
        |FROM g ORDER BY source""".stripMargin,
    // GENERATED from the same CharNgramProfiles constant the engine
    // reads, so profile and oracle can never diverge; the
    // length-difference-of-replace occurrence count and the struct
    // argmax are exact in both engines (see lang_id's note)
    "lang_id_ngram" -> {
      val cands = CharNgramProfiles.map { case (lang, grams) =>
        val total = grams.map(g =>
          s"(length(t) - length(replace(t, '$g', ''))) / ${g.length}").mkString(" + ")
        s"{'score': ($total) / greatest(length(t), 1), 'lang': '$lang'}"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang AS lang_label, lower(text) AS t FROM documents),
         |s AS (SELECT doc_id, lang_label, [
         |  $cands
         |  ] AS cand FROM t)
         |SELECT doc_id, list_max(cand).lang AS lang_pred,
         |  list_max(cand).score AS lang_score, lang_label
         |FROM s ORDER BY doc_id""".stripMargin
    },
    // exact integer counts throughout; the keep conjunction replays
    // the same comparisons
    "quality_c4" ->
      """WITH t AS (SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(rtrim(l), '[.!?"]$')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |r AS (SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  COALESCE(CAST(list_sum(list_transform(kept, l ->
        |    len(string_split_regex(trim(l), '\s+')))) AS BIGINT), 0) AS n_kept_words,
        |  CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, ' '), ''), '[.!?]')) AS BIGINT) AS n_sentences,
        |  contains(text, '{') AS has_brace,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem
        | FROM t)
        |SELECT doc_id, n_lines, n_kept_lines, n_kept_words, n_sentences,
        |  has_brace, has_lorem,
        |  NOT has_brace AND NOT has_lorem AND n_sentences >= 3 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    // every ratio is one int/int IEEE division over exact counts; the
    // keep conjunction replays the same comparisons
    "quality_gopher" ->
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |r AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE) / len(toks) AS mean_word_len,
        |  CAST((len(text) - len(replace(text, '#', ''))) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) / len(toks) AS symbol_ratio,
        |  CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(lines) AS bullet_frac,
        |  CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS DOUBLE) / len(lines) AS ellipsis_frac,
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'], w -> list_contains(toks, w))) AS BIGINT) AS n_stop_hits
        | FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, n_stop_hits,
        |  n_words >= 50 AND n_words <= 100000 AND mean_word_len >= 3
        |    AND mean_word_len <= 10 AND symbol_ratio <= 0.1
        |    AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8 AND n_stop_hits >= 2 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "collocations" ->
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS tk
        |           FROM documents),
        |bg0 AS (SELECT unnest(CASE WHEN len(tk) >= 2
        |    THEN [tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk)-1)]
        |    ELSE [] END) AS pair FROM t),
        |bg AS (SELECT split_part(pair, ' ', 1) AS a,
        |              split_part(pair, ' ', 2) AS b FROM bg0),
        |bi AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
        |la AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM bi GROUP BY 1),
        |rb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM bi GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM bi)
        |SELECT a, b, n_ab,
        |  CAST(n_ab * n AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS lift
        |FROM bi JOIN la USING (a) JOIN rb USING (b) CROSS JOIN tot
        |WHERE n_ab >= 5
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,
    "sentence_stats" ->
      """WITH s0 AS (SELECT doc_id,
        |  list_filter(list_transform(string_split_regex(text, '[.!?]+'),
        |    x -> trim(x)), x -> x <> '') AS sents FROM documents),
        |w AS (SELECT doc_id, len(sents) AS ns,
        |  list_transform(sents, x -> len(string_split_regex(x, '\s+'))) AS wc
        |  FROM s0 WHERE len(sents) > 0)
        |SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences,
        |  CAST(list_sum(wc) AS BIGINT) AS n_words,
        |  CAST(list_max(wc) AS BIGINT) AS max_sentence_words,
        |  CAST(list_sum(wc) AS DOUBLE) / CAST(ns AS DOUBLE)
        |    AS avg_sentence_words
        |FROM w ORDER BY doc_id""".stripMargin,
    // idf ratio + tf saturation mirrored as the SAME double expression
    // tree (explicit DOUBLE casts keep DuckDB's decimal literals and
    // HUGEINT sums out of the arithmetic); contributions floor to e9
    // integers before the order-insensitive integer sum
    "keyword_topk" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(tk)) AS BIGINT) AS n_tokens FROM t),
        |tok AS (SELECT doc_id, unnest(tk) AS term FROM t),
        |dfr AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |qt AS (SELECT term, df FROM dfr WHERE length(term) >= 6
        |       ORDER BY df DESC, term LIMIT 4),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok JOIN qt USING (term)
        |       GROUP BY doc_id, term),
        |sc AS (SELECT tf.doc_id, CAST(floor(
        |    ((CAST(n.n_docs - qt.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |     / (CAST(qt.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
        |    * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |       / (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |           (CAST(dl.dl AS DOUBLE)
        |            / (CAST(n.n_tokens AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))))
        |    * CAST(1e9 AS DOUBLE)) AS BIGINT) AS c_e9
        |  FROM tf JOIN qt USING (term) JOIN dl USING (doc_id) CROSS JOIN n)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
        |  CAST(SUM(c_e9) AS BIGINT) AS score_e9
        |FROM sc GROUP BY doc_id
        |ORDER BY score_e9 DESC, doc_id LIMIT 20""".stripMargin,
    // DuckDB's nfc_normalize (utf8proc) and the engine's
    // java.text.Normalizer both implement UAX #15 NFC; the regexp
    // chain replays steps 2-3 of the native one-pass form.
    // Unicode-VERSION coupling: the two engines ship different Unicode
    // table snapshots, and a codepoint assigned (or given a new
    // decomposition) between their versions can normalize differently,
    // flaking the md5 fingerprint.  The oracle therefore stands on the
    // synthetic corpus being ASCII-plus-stable-BMP (combining accents,
    // NBSP, fullwidth forms — stable since Unicode 3.x); richer
    // corpora should use the engine-side spec (NormalizeText
    // idempotence/reference tests) rather than this cross-engine hash
    "text_normalize" ->
      """WITH n AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_norm,
        |  md5(norm) AS fp, norm <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,
    "pii_scrub" ->
      """WITH p AS (SELECT event_id,
        |  CAST(len(regexp_extract_all(props,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]+')) AS BIGINT) AS n_redactions,
        |  regexp_replace(props,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]+', '<PII>', 'g') AS clean
        |FROM events)
        |SELECT event_id, n_redactions, clean FROM p
        |WHERE n_redactions > 0 ORDER BY event_id""".stripMargin,
    "token_histogram" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok FROM documents),
        |h AS (SELECT CAST(floor(tok / 32) * 32 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens FROM t GROUP BY 1)
        |SELECT bucket, n_docs, tokens,
        |  CAST(SUM(tokens) OVER (ORDER BY bucket) AS DOUBLE)
        |    / CAST(SUM(tokens) OVER () AS DOUBLE) AS cum_share
        |FROM h ORDER BY bucket""".stripMargin,
    "top_tfidf_terms" ->
      """WITH p0 AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |pairs AS (SELECT doc_id, term, COUNT(*) AS tf FROM p0 GROUP BY doc_id, term),
        |d AS (SELECT term, COUNT(*) AS dfc FROM pairs GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, CAST(tf * n_docs AS DOUBLE) / dfc AS tfidf
        |       FROM pairs JOIN d USING (term) CROSS JOIN n)
        |SELECT doc_id, rk, term, tfidf FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk FROM sc)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // exact replay: 2-grams = space-joined adjacent tokens; every
    // fraction is an int/int (or 1.0 minus one) IEEE quotient, so the
    // doubles are bit-identical
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN [toks[i] || ' ' || toks[i+1] for i in generate_series(1, len(toks)-1)]
        |    ELSE [] END) AS gram FROM t),
        |gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total2, MAX(c) AS top2,
        |        CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup2
        |        FROM gc GROUP BY doc_id)
        |SELECT t.doc_id,
        |  1.0 - len(list_distinct(toks)) / len(toks) AS dup_token_frac,
        |  CASE WHEN total2 > 0 THEN top2 / total2 ELSE 0.0 END AS top_2gram_frac,
        |  CASE WHEN total2 > 0 THEN dup2 / total2 ELSE 0.0 END AS dup_2gram_frac
        |FROM t LEFT JOIN agg USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens_bpe,
        |  CAST(len(text) AS BIGINT) AS n_chars_calc,
        |  len(replace(text, ' ', '')) / len(toks) AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |  len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for'], x))) / len(toks) AS stop_ratio,
        |  CASE WHEN len(text) > 0
        |    THEN (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) / len(text)
        |    ELSE 0.0 END AS punct_ratio
        |FROM t)
        |SELECT doc_id, stop_ratio, punct_ratio,
        |  CASE WHEN n_chars < 100 THEN 'short' WHEN n_chars < 300 THEN 'medium' ELSE 'long' END AS len_bucket,
        |  stop_ratio * 0.4 + (1.0 - punct_ratio) * 0.3 +
        |    (CASE WHEN n_chars >= 100 THEN 0.3 ELSE 0.0 END) AS quality
        |FROM r ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the Rabin–Karp polynomial (h·P + b mod 2⁶⁴) replayed in HUGEINT
    // modular arithmetic, then mapped to signed 64-bit — bit-exact vs
    // the native expression (ASCII corpus: ascii() = the UTF-8 byte)
    "text_rollhash" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |b AS (SELECT doc_id, list_prepend(CAST(0 AS HUGEINT),
        |    list_transform(range(1, length(nt)+1), i -> CAST(ascii(substr(nt, CAST(i AS INT), 1)) AS HUGEINT))) AS bs
        |  FROM n),
        |h AS (SELECT doc_id, list_reduce(bs,
        |    (acc, x) -> (acc * 1000000007 + x) % CAST('18446744073709551616' AS HUGEINT)) AS hu FROM b)
        |SELECT doc_id, CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
        |  THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS rh
        |FROM h ORDER BY doc_id""".stripMargin,
    // both polynomials replayed in HUGEINT mod-2⁶⁴: per-token byte
    // hashes (P = 1e9+7), then the 4-gram combine under Q split as
    // Qh·2³² + Ql (2654435769·2³² + 2135587861) because acc·Q would
    // overflow HUGEINT; the rightmost-tie window minimum is
    // min(struct(h, −pos)) over 8 ROWS — struct compare is
    // field-lexicographic in both engines, and DISTINCT equals the
    // selection-change emit because the selected position is
    // monotone in the window end
    "winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |th AS (SELECT doc_id, list_transform(tk, s -> list_reduce(
        |    list_prepend(CAST(0 AS HUGEINT), [CAST(ascii(substr(s, CAST(i AS INT), 1)) AS HUGEINT)
        |      for i in generate_series(1, length(s))]),
        |    (acc, x) -> (acc * 1000000007 + x) % CAST('18446744073709551616' AS HUGEINT))) AS hs
        |  FROM t WHERE len(tk) >= 4),
        |g AS (SELECT doc_id, unnest(generate_series(0, len(hs) - 4)) AS pos,
        |        unnest([list_reduce(list_prepend(CAST(0 AS HUGEINT), hs[i:i+3]),
        |          (acc, x) -> ((acc * 2135587861
        |            + ((acc * 2654435769) % 4294967296) * 4294967296) + x)
        |            % CAST('18446744073709551616' AS HUGEINT))
        |          for i in generate_series(1, len(hs) - 3)]) AS hu
        |      FROM th),
        |sgn AS (SELECT doc_id, pos, CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
        |          THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS h
        |        FROM g),
        |sel AS (SELECT doc_id, min(struct_pack(h := h, np := -pos))
        |          OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS m, pos
        |        FROM sgn)
        |SELECT DISTINCT doc_id, -m['np'] AS pos, m['h'] AS fp
        |FROM sel WHERE pos >= 7
        |ORDER BY doc_id, pos""".stripMargin,
    // the top-V boundary replayed as a row_number over the SAME total
    // (cnt desc, term) order; both sides divide exact BIGINTs cast to
    // DOUBLE, so coverage is IEEE-identical
    "vocab_coverage" ->
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |tok AS (SELECT unnest(tk) AS term FROM t),
        |c AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM c),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rk FROM c),
        |vs(v) AS (VALUES (10), (100), (1000)),
        |cov AS (SELECT v, CAST(SUM(CASE WHEN rk <= v THEN cnt ELSE 0 END) AS BIGINT)
        |          AS covered_tokens FROM r, vs GROUP BY v)
        |SELECT v, covered_tokens, total_tokens,
        |  CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS coverage
        |FROM cov, tot ORDER BY v""".stripMargin,
    // Σcnt² kept exact in BIGINT on both sides; the two doubles are
    // single divisions of exact integers — IEEE-identical
    "token_diversity" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (SELECT doc_id, term, COUNT(*) AS cnt
        |      FROM (SELECT doc_id, unnest(tk) AS term FROM t) GROUP BY doc_id, term),
        |a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS nd,
        |        CAST(SUM(cnt * cnt) AS BIGINT) AS ss FROM c GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens, nd AS n_distinct, ss AS sum_sq,
        |  CAST(ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS simpson,
        |  CAST(n * n AS DOUBLE) / CAST(ss AS DOUBLE) AS eff_vocab
        |FROM a ORDER BY doc_id""".stripMargin,
    // argmax over (score, lang) structs: both engines compare structs
    // field-lexicographically and the scores are exact int/int IEEE
    // quotients, so the prediction is engine-identical
    "lang_by_source" ->
      """WITH t AS (SELECT source,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (SELECT source, list_max([
        |  {'score': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) / len(toks), 'lang': 'de'},
        |  {'score': len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x))) / len(toks), 'lang': 'en'},
        |  {'score': len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los','es','un'], x))) / len(toks), 'lang': 'es'},
        |  {'score': len(list_filter(toks, x -> list_contains(['le','la','de','et','les','des','est','une'], x))) / len(toks), 'lang': 'fr'},
        |  {'score': len(list_filter(toks, x -> list_contains(['de','shi','bu','le','ren','wo','you','ta'], x))) / len(toks), 'lang': 'zh'}
        |  ]).lang AS lang_pred FROM t),
        |c AS (SELECT source, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
        |      FROM s GROUP BY 1, 2),
        |n AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_src FROM c GROUP BY 1)
        |SELECT c.source, lang_pred, n_docs,
        |  CAST(n_docs * 1000000 // n_src AS BIGINT) AS share_ppm
        |FROM c JOIN n USING (source) ORDER BY source, lang_pred""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS lang_label,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, lang_label, [
        |  {'score': len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) / len(toks), 'lang': 'de'},
        |  {'score': len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','on'], x))) / len(toks), 'lang': 'en'},
        |  {'score': len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los','es','un'], x))) / len(toks), 'lang': 'es'},
        |  {'score': len(list_filter(toks, x -> list_contains(['le','la','de','et','les','des','est','une'], x))) / len(toks), 'lang': 'fr'},
        |  {'score': len(list_filter(toks, x -> list_contains(['de','shi','bu','le','ren','wo','you','ta'], x))) / len(toks), 'lang': 'zh'}
        |  ] AS cand FROM t)
        |SELECT doc_id, list_max(cand).lang AS lang_pred,
        |  list_max(cand).score AS lang_score, lang_label
        |FROM s ORDER BY doc_id""".stripMargin,
    "top_terms" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
        |  FROM documents)
        |SELECT term, COUNT(*) AS df FROM t GROUP BY term
        |ORDER BY df DESC, term LIMIT 20""".stripMargin,
    "bpe_pairs" ->
      """WITH p AS (SELECT unnest([substr(text, CAST(i AS INT), 2)
        |    for i in generate_series(1, length(text) - 1)]) AS pair
        |  FROM documents WHERE length(text) >= 2)
        |SELECT pair, COUNT(*) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "text_commonness" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |vocab AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
        |          ORDER BY tf DESC, term LIMIT 1000)
        |SELECT doc_id,
        |  CAST(SUM(COALESCE(tf, 0)) AS DOUBLE) / COUNT(*) AS avg_tf,
        |  CAST(SUM(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_ratio
        |FROM toks LEFT JOIN vocab USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_shingles" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id,
        |  CASE WHEN len(tk) >= 3
        |    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)]
        |    ELSE [] END AS sh
        |  FROM t)
        |SELECT doc_id, CAST(len(list_distinct(sh)) AS BIGINT) AS n_shingles,
        |  CAST(len(sh) AS BIGINT) AS n_total
        |FROM s ORDER BY doc_id""".stripMargin)
}
