package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Advanced-analytics operators the OLAP suite in [[Relational]] does
  * not cover: skyline (pareto-front) extraction, exact distributed
  * equi-depth histograms, blocked fuzzy entity matching, and robust
  * (median/MAD) statistics — each built so the corpus-sized work stays
  * in keyed map-side aggregates and only bounded-cardinality frames
  * ever meet a global window.
  *
  * FLOAT DISCIPLINE: prices enter as `CAST(floor(x * 100) AS BIGINT)`
  * cents (one correctly-rounded IEEE multiply + floor, bit-identical on
  * any engine — see [[Temporal]]); medians/MADs are computed by COUNTING
  * over integer value histograms, so every output is an integer ratio
  * with a power-of-two denominator — exact as a double.
  */
object Analytics {

  private def cents(c: Column) = floor(c * lit(100)).cast("long")

  /** Pareto front (skyline) of `part`: minimize price, maximize size —
    * "the cheapest part at every quality level", the multi-objective
    * shape (price/quality, latency/accuracy, size/recall) that SQL
    * expresses only as a quadratic NOT EXISTS.
    *
    * Scale design — the quadratic dominance test never runs: a point
    * (c, s) is on the front iff s is the max size AT its price level
    * and no CHEAPER level reaches size ≥ s.  So: (1) collapse the
    * corpus map-side to the per-price staircase `smax(c) = max size`
    * (bounded by the PRICE DOMAIN, not row count); (2) one running-max
    * window over the sorted staircase keeps the levels whose smax
    * strictly exceeds every cheaper level's; (3) broadcast the
    * surviving levels back and keep the rows that sit exactly on them.
    * The only non-keyed step is the window over the staircase —
    * |distinct prices| rows (at 100 TB: bounded by the domain, or
    * replace with a two-phase per-partition-max + broadcast-prefix if
    * the domain itself is huge).  Ties: equal (cents, size) points are
    * mutually non-dominating; all are kept — the oracle's NOT EXISTS
    * with two strictness arms agrees.
    */
  def paretoFront(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(s, dir).select(
      col("p_partkey"), col("p_name"),
      cents(col("p_retailprice")).as("cents"), col("p_size"))
    val stair = pts.groupBy(col("cents")).agg(max(col("p_size")).as("smax"))
    val w = Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, -1)
    val frontLevels = stair
      .withColumn("prev", max(col("smax")).over(w))
      .filter(col("prev").isNull || col("prev") < col("smax"))
      .select(col("cents"), col("smax"))
    pts.join(broadcast(frontLevels), Seq("cents"))
      .filter(col("p_size") === col("smax"))
      .select(col("p_partkey"), col("p_name"), col("cents"), col("p_size"))
      .orderBy(col("cents"), col("p_partkey"))
  }

  /** Exact equi-depth histogram of lineitem price: NTILE(16) over the
    * total order (cents, orderkey, linenumber) WITHOUT a corpus-wide
    * row_number — the optimizer-statistics / quantile-sketch-free
    * histogram build.
    *
    * Distributed-ntile design: the global rank of a row decomposes as
    * `rank = cum(cents) + rank-within-value`, where `cum` is the
    * running row count over the SORTED DISTINCT VALUES (a frame of
    * |distinct prices| rows — the only global window) and the
    * within-value rank is an ordinary per-price partition window (the
    * shuffle key is the price value, map-side combinable).  NTILE's
    * first-(n mod k)-tiles-get-one-extra assignment is then a pure
    * integer expression of that rank.  This is the TeraSort shape:
    * range statistics small, per-row work keyed — a direct
    * `row_number() OVER (ORDER BY …)` would funnel the corpus through
    * ONE task.
    */
  def equidepthHist(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val li = Tables.lineitem(s, dir).select(
      cents(col("l_extendedprice")).as("cents"),
      col("l_orderkey"), col("l_linenumber"))
    val vc = li.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = vc.select(col("cents"),
      coalesce(sum(col("cnt")).over(wCum), lit(0L)).as("lo"))
    val tot = li.agg(count(lit(1)).as("n"))
    val wIn = Window.partitionBy(col("cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    li.join(cum, Seq("cents"))
      .withColumn("pos", col("lo") + row_number().over(wIn) - lit(1))
      .crossJoin(broadcast(tot))
      .select(col("cents"), col("pos"),
        expr("n div " + k).as("base"), (col("n") % k).as("big"))
      .withColumn("tile",
        when(col("pos") < col("big") * (col("base") + 1),
          expr("pos div (base + 1)"))
          .otherwise(col("big") + expr("(pos - big * (base + 1)) div base"))
          .cast("int") + lit(1))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("tile"))
  }

  /** Revenue-concentration report over per-customer order revenue: the
    * exact Gini coefficient plus top-1% / top-10% revenue shares — the
    * "how skewed is this corpus/customer base" number read before
    * choosing mixture weights or salting strategy.
    *
    * Exactness: with customers ranked 1..n ascending by revenue, Gini
    * = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx).  The rank-weighted sum
    * decomposes over the DISTINCT-value staircase: a value v with
    * count c and `lo` smaller-valued customers contributes
    * v·(c·lo + c(c+1)/2) — tie-order-invariant, so no per-customer
    * tie-break and no corpus-wide row_number exist at all.  All sums
    * are decimal(38,0) (≡ HUGEINT) integers; the final Gini is ONE
    * double division of two exactly-computed integers, and the top-k
    * shares are pure integer arithmetic (ppm integer division).
    *
    * Scale shape: per-customer revenue is a keyed map-side aggregate;
    * the staircase window runs over |distinct revenue cents| rows
    * (the [[equidepthHist]] TeraSort argument: range stats small,
    * per-row work keyed — swap in two-phase range partitioning if the
    * value domain itself outgrows a task).  Output: one row.
    */
  def giniTopshare(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rev = Tables.orders(s, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("v"))
      .groupBy(col("o_custkey")).agg(sum(col("v")).as("rev"))
    val vc = rev.groupBy(col("rev")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("rev")).rowsBetween(Window.unboundedPreceding, -1)
    // LAZY checkpoint: the staircase feeds the moment aggregate AND
    // the top-share aggregate (and `agg` feeds two consumers below) —
    // without it the orders scan + revenue aggregate + cumulative
    // window execute up to 3× for a one-row result
    val stair = vc
      .withColumn("lo", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("tri", expr("(cnt * (cnt + 1)) div 2"))
      .localCheckpoint(eager = false)
    val agg = stair.agg(
      sum(col("cnt")).as("n"),
      sum((col("rev").cast(dec) * col("cnt").cast(dec)).cast(dec)).as("t"),
      sum((col("rev").cast(dec) *
        (col("cnt").cast(dec) * col("lo").cast(dec) + col("tri").cast(dec))
          .cast(dec)).cast(dec)).as("w"))
      .localCheckpoint(eager = false) // read by tops' n AND the output row
    // top-k take per value group: customers ranked above n-k; a group
    // spanning the cut contributes hi-(n-k) of its c members
    def topSum(kExpr: Column): Column = {
      val cut = col("n") - kExpr
      sum((col("rev").cast(dec) *
        greatest(lit(0L), least(col("cnt"), col("lo") + col("cnt") - cut))
          .cast(dec)).cast(dec))
    }
    val tops = stair.crossJoin(broadcast(agg.select(col("n"))))
      .agg(topSum(expr("n div 100")).as("s1"),
        topSum(expr("n div 10")).as("s10"))
    agg.crossJoin(broadcast(tops))
      .select(col("n").as("n_customers"),
        col("t").cast("long").as("total_cents"),
        ((lit(2).cast(dec) * col("w") -
          (col("n") + 1).cast(dec) * col("t")).cast("double") /
          (col("n").cast(dec) * col("t")).cast("double")).as("gini"),
        // ppm in the long lane (the skew_report top_share_ppm idiom):
        // floor division, exact while Σcents·1e6 < 2⁶³ — beyond that,
        // swap for two-step decimal floor-div
        expr("CAST(s1 AS BIGINT) * 1000000 div CAST(t AS BIGINT)")
          .as("top1_share_ppm"),
        expr("CAST(s10 AS BIGINT) * 1000000 div CAST(t AS BIGINT)")
          .as("top10_share_ppm"))
  }

  /** Leading-digit (Benford) audit of order totals — the fraud /
    * synthetic-data screen: the distribution of first significant
    * digits, as counts and ppm shares.  The op emits the OBSERVED
    * distribution only, all-integer (digit via string head — exact on
    * both engines; ppm by long floor division): comparing against the
    * log₁₀(1+1/d) reference is the CONSUMER's judgment call, and log
    * is not cross-engine hash-stable anyway (the event_spike rule:
    * keep the oracle lane integer, push judgment to the spec, which
    * pins the exact replay AND the chi²-vs-Benford statistic).
    *
    * Scale shape: scan-project to one digit char, 9-row keyed
    * aggregate with map-side partials, 1-row broadcast total.
    */
  def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(s, dir)
      .select(cents(col("o_totalprice")).as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .localCheckpoint(eager = false) // total + output share one scan
    val tot = d.agg(sum(col("n_obs")).as("n"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000000 div n").as("share_ppm"))
      .orderBy(col("digit"))
  }

  /** Blocked fuzzy entity matching over part names — the entity-
    * resolution CANDIDATE-GENERATION audit: block on the head noun,
    * compare names pairwise within each block with edit distance, and
    * report per block how blocking performed (candidate pairs, exact
    * matches, near matches) — the numbers that size an ER pipeline
    * before anyone runs one.
    *
    * Scale shape: the pair join is keyed on the BLOCK, never all-pairs
    * corpus-wide — the entire point of blocking; the output is one row
    * per block.  Within-block volume is quadratic in block size, which
    * is the knob the caller owns (pick blocking keys so blocks fit a
    * task; the same discipline as [[Dedup]]'s ShingleDfCap).
    * `levenshtein` is a codegen'd built-in on both engines with the
    * textbook unit-cost definition, so counts are oracle-exact.
    */
  def entityMatch(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(
      col("p_partkey").as("k"), col("p_name").as("n"),
      split(col("p_name"), " ").getItem(1).as("blk"))
    val a = p.select(col("blk"), col("k").as("ka"), col("n").as("na"))
    val b = p.select(col("blk"), col("k").as("kb"), col("n").as("nb"))
    val pairs = a.join(b, Seq("blk")).filter(col("ka") < col("kb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")))
    val nParts = p.groupBy(col("blk")).agg(count(lit(1)).as("n_parts"))
    pairs.groupBy(col("blk"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("dist") > 0 && col("dist") <= 2, 1L).otherwise(0L))
          .as("n_fuzzy"))
      .join(nParts, Seq("blk"))
      .select(col("blk"), col("n_parts"), col("n_pairs"), col("n_exact"),
        col("n_fuzzy"))
      .orderBy(col("blk"))
  }

  /** Robust per-source length statistics: median and MAD (median
    * absolute deviation) of `n_chars`, plus the count of docs outside
    * median ± 3·MAD — the outlier gate that, unlike mean/σ (see
    * `event_spike`), a handful of giant documents cannot drag.
    *
    * Exactness without sorting rows: both medians come from COUNTING
    * over the per-(source, value) histogram — cumulative counts over
    * the sorted DISTINCT values (bounded by the length domain) pick
    * the lower/upper middle elements, and all comparisons stay in
    * integers scaled ×2/×4 (`med2 = lower+upper`, `mad4`, outlier iff
    * `4·|2x−med2| > 3·mad4`), so the emitted doubles are integer
    * ratios with power-of-two denominators — bit-exact on any engine.
    * Spark's `percentile()` would buffer every row of a group in one
    * task; the histogram form is the 100 TB way (the value domain,
    * not the row count, bounds the window).
    */
  def qualityMad(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: collapse to the per-(source, value) histogram;
    // medians, deviations and the outlier count are all HISTOGRAM
    // algebra from here (weighted counting — the deviation "pass" is a
    // recount of the same histogram, never a second scan).  The lazy
    // localCheckpoint truncates lineage so all three consumers read the
    // materialized (domain-bounded) histogram instead of re-scanning —
    // the lm_score discipline (plan-spec-pinned).
    val vc = Tables.documents(s, dir)
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)

    /** weighted median×2 per source of histogram (source, valCol, cnt). */
    def med2Of(h: DataFrame, valCol: String): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = h.withColumn("hi", sum(col("cnt")).over(w))
      val tot = h.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
      cum.join(tot, Seq("source"))
        .groupBy(col("source"), col("n"))
        .agg(
          // lower/upper middle (1-based positions ⌊(n+1)/2⌋ and ⌊n/2⌋+1):
          // the min value whose cumulative count reaches the position
          min(when(col("hi") >= expr("(n + 1) div 2"), col(valCol))).as("lo_med"),
          min(when(col("hi") >= expr("(n + 2) div 2"), col(valCol))).as("up_med"))
        .select(col("source"), col("n"),
          (col("lo_med") + col("up_med")).as("med2"))
    }

    val m = med2Of(vc, "n_chars")
    val devH = vc.join(broadcast(m.select(col("source"), col("med2"))), Seq("source"))
      .groupBy(col("source"), abs(lit(2) * col("n_chars") - col("med2")).as("dd"))
      .agg(sum(col("cnt")).as("cnt"))
    val mm = med2Of(devH, "dd").select(col("source"), col("med2").as("mad4"))
    vc.join(broadcast(m.select(col("source"), col("med2"))), Seq("source"))
      .join(broadcast(mm), Seq("source"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_docs"),
        (max(col("med2")) / lit(2.0)).as("med_chars"),
        (max(col("mad4")) / lit(4.0)).as("mad_chars"),
        sum(when(lit(4) * abs(lit(2) * col("n_chars") - col("med2")) >
          lit(3) * col("mad4"), col("cnt")).otherwise(0L)).as("n_outliers"))
      .orderBy(col("source"))
  }

  /** Distribution-position windows: percent_rank and cume_dist of
    * order value within each priority class — the "where does this row
    * sit in its cohort's distribution" normalization (feature scaling,
    * per-segment percentile filters) that rank alone doesn't give.
    *
    * Oracle-exact BECAUSE both functions are integer-derived ratios —
    * `(rank−1)/(n−1)` and `peers_cum/n` — one correctly-rounded IEEE
    * divide of two longs, bit-identical on any engine (no running
    * double accumulation anywhere).  Ties share rank/cume values, so
    * no tie-break is needed inside the window; the presentation sort
    * carries the key.  Scale: one hash exchange on the cohort key,
    * per-cohort sorted-run scan — the standard single-shuffle window.
    */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_orderpriority").as("prio"),
      cents(col("o_totalprice")).as("cents"))
    val w = Window.partitionBy(col("prio")).orderBy(col("cents"))
    o.select(col("o_orderkey"), col("prio"), col("cents"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("prio"), col("cents"), col("o_orderkey"))
  }

  /** Sketched quantiles: per-source n_chars percentiles via Spark's
    * native KLL-style `percentile_approx` at accuracy 1000 — the
    * 100 TB path next to [[qualityMad]]'s exact counting form: the
    * sketch is O(accuracy·log n) per partial, merges map-side, and
    * never materializes a value histogram.  Rows-only by design (the
    * sketch's picked element depends on its compaction schedule, not
    * on a SQL-expressible formula); the ScalaTest oracle pins the
    * guarantee that matters: every reported q sits within rank
    * p·n ± n/accuracy of the exact sorted order.
    */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(percentile_approx(col("n_chars"),
        array(ps.map(lit): _*), lit(1000)).as("qs"))
      .select(col("source"), posexplode(col("qs")).as(Seq("i", "q_chars")))
      .select(col("source"),
        element_at(array(ps.map(lit): _*), col("i") + 1).as("p"),
        col("q_chars"))
      .orderBy(col("source"), col("p"))
  }

  /** Pairwise Pearson correlations over the lineitem numerics — the
    * feature-correlation screen — ORACLE-EXACT, which `corr()` never
    * is (its running double accumulation is order-dependent): every
    * moment (Σx, Σx², Σxy) is an order-insensitive DECIMAL(38,0) sum
    * of ×100-scaled integers, and each correlation is then ONE fixed
    * double expression tree over those exact sums (each cast, multiply,
    * subtract, sqrt and divide correctly rounded ⇒ bit-identical on
    * any engine replaying the same tree — the event_spike discipline
    * applied to second moments).
    *
    * Scale shape: a single map-side-combinable aggregate row (15
    * moments), then a 6-row literal unpivot — nothing but partials
    * ever moves.  DECIMAL(38,0) holds Σxy up to ~10³⁸: at 100 TB
    * (~10¹² rows × 10¹⁴ max product) it is still exact.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val vars = Seq("qty", "price", "disc", "tax")
    val li = Tables.lineitem(s, dir).select(
      cents(col("l_quantity")).as("qty"),
      cents(col("l_extendedprice")).as("price"),
      cents(col("l_discount")).as("disc"),
      cents(col("l_tax")).as("tax"))
    val dec = "decimal(38,0)"
    val moments =
      Seq(count(lit(1)).as("n")) ++
        vars.map(v => sum(col(v).cast(dec)).as(s"s_$v")) ++
        vars.map(v => sum((col(v).cast(dec) * col(v).cast(dec)).cast(dec)).as(s"ss_$v")) ++
        vars.combinations(2).map { case Seq(a, b) =>
          sum((col(a).cast(dec) * col(b).cast(dec)).cast(dec)).as(s"sp_${a}_$b")
        }.toSeq
    val agg = li.agg(moments.head, moments.tail: _*)
    def corrCol(a: String, b: String): Column = {
      val n = col("n").cast("double")
      val sx = col(s"s_$a").cast("double")
      val sy = col(s"s_$b").cast("double")
      val num = n * col(s"sp_${a}_$b").cast("double") - sx * sy
      val dxx = n * col(s"ss_$a").cast("double") - sx * sx
      val dyy = n * col(s"ss_$b").cast("double") - sy * sy
      num / sqrt(dxx * dyy)
    }
    val pairs = vars.combinations(2).toSeq
    agg.select(explode(array(pairs.map { case Seq(a, b) =>
        struct(lit(a).as("var_a"), lit(b).as("var_b"),
          corrCol(a, b).as("corr"))
      }: _*)).as("r"))
      .select(col("r.var_a").as("var_a"), col("r.var_b").as("var_b"),
        col("r.corr").as("corr"))
      .orderBy(col("var_a"), col("var_b"))
  }

  /** Join-key skew diagnostic: the distribution of per-key row counts
    * for the lineitem fact-fact join key — the report you read BEFORE
    * choosing [[Skew.saltedJoin]]'s salt count or trusting AQE's skew
    * split (max key size vs median, top-key row share).  One row out.
    *
    * Everything is counting: per-key counts collapse map-side, then
    * the KEY-SIZE histogram (count → how many keys have it) is
    * domain-bounded, and p50/p99 come from cumulative counts over it
    * (the [[qualityMad]] discipline) — no sort of the key list, no
    * percentile buffering.  `top_share_ppm` is an integer div.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val keyCnt = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
    val hist = keyCnt.groupBy(col("c")).agg(count(lit(1)).as("nk"))
      .localCheckpoint(eager = false) // shared by cum + totals: one scan
    val w = Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("hi", sum(col("nk")).over(w))
    val tot = hist.agg(sum(col("nk")).as("n_keys"),
      sum(col("c") * col("nk")).as("n_rows"), max(col("c")).as("max_cnt"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n_keys"), col("n_rows"), col("max_cnt"))
      .agg(
        min(when(col("hi") * 2 >= col("n_keys"), col("c"))).as("p50_cnt"),
        min(when(col("hi") * 100 >= col("n_keys") * 99, col("c"))).as("p99_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"),
        expr("(max_cnt * 1000000) div n_rows").as("top_share_ppm"))
  }

  /** Market-basket co-occurrence: the top-20 part pairs bought in the
    * same order, with exact lift — the association-mining /
    * recommendation primer ("which items travel together").
    *
    * Scale shape: the pair space is generated by an ORDER-keyed
    * self-join, so its volume is Σ basket² — bounded by basket size,
    * never |parts|² (the all-pairs trap); per-item support counts are
    * an independent partkey aggregate joined back, the 1-row order
    * total broadcasts, and the cut is a TakeOrderedAndProject under
    * the total (n_ab desc, pa, pb) order.  Lift is ONE division of
    * two exact integer products ⇒ engine-exact doubles.
    */
  def basketPairs(s: SparkSession, dir: String): DataFrame = {
    // ONE (ok)-keyed exchange assembles the per-order basket —
    // collect_set dedups in the aggregate, so the former
    // distinct + ok-keyed self-join (three exchanges of the item set,
    // and the sort-merge buffers behind most of this query's gc) is
    // one shuffle of the projected scan; pairs then generate MAP-SIDE
    // from the sorted basket array (sorted ⇒ strictly increasing ⇒
    // pa < pb by construction), so only (pa, pb) count partials cross
    // the second exchange.  The checkpoint still feeds every consumer
    // off one scan (plan-spec-pinned).
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("pks"))
      .localCheckpoint(eager = false)
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    val supp = baskets.select(explode(col("pks")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_supp"))
    // the top-20 cut is decided by (n_ab desc, pa, pb) ALONE, and the
    // support joins below are 1:1 (supp has exactly one row per pk,
    // and every pa/pb of a pair occurs in some basket): cutting FIRST
    // is value-identical and the lift joins then touch 20 rows, not
    // the distinct-pair table — at scale the planner broadcasts the
    // 20-row side and supp is never collected anywhere.
    val top = baskets
      .select(explode(expr(
        "flatten(transform(pks, (a, i) -> " +
          "transform(slice(pks, i + 2, size(pks)), b -> struct(a AS pa, b AS pb))))"))
        .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .orderBy(desc("n_ab"), col("pa"), col("pb"))
      .limit(20)
    top
      .join(supp.select(col("pk").as("pa"), col("n_supp").as("n_a")), Seq("pa"))
      .join(supp.select(col("pk").as("pb"), col("n_supp").as("n_b")), Seq("pb"))
      .crossJoin(broadcast(tot))
      .select(col("pa"), col("pb"), col("n_ab"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(desc("n_ab"), col("pa"), col("pb"))
  }

  /** Incremental-aggregation algebra, driven through the gate: corpus
    * stats computed as PARTIALS per (source, snapshot-vs-delta slice)
    * and then MERGED — the materialized-view-maintenance shape ("keep
    * a stored aggregate, fold each new batch in, never rescan") whose
    * correctness IS the oracle check here, since the oracle recomputes
    * flat from scratch: count/sum/min/max are the mergeable kernels;
    * the one-scan two-level plan proves merge ≡ recompute exactly.
    * (avg is intentionally derived from merged sum/count, never
    * averaged across partials — the classic non-mergeable trap.)
    */
  def aggIncremental(s: SparkSession, dir: String): DataFrame = {
    val partials = Tables.documents(s, dir)
      .groupBy(col("source"), (pmod(col("doc_id"), lit(10)) === 0).as("is_delta"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
    partials.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"), sum(col("sc")).as("sum_chars"),
        min(col("mn")).as("min_chars"), max(col("mx")).as("max_chars"))
      .withColumn("avg_chars",
        col("sum_chars").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  /** RFM customer segmentation: recency / frequency / monetary
    * quintile scores per customer, reported as bounded (r, f, m)
    * segment counts (≤125 rows) — the classic CRM cube.
    *
    * Quintiles via `percent_rank` over each metric: ties share the
    * rank, so the score depends only on the VALUE (no per-row
    * tie-break needed) and both engines floor the same exact double.
    * The three unpartitioned windows run over the per-customer
    * aggregate (one row per customer); at a scale where even that
    * frame can't sort in one task, swap in the distinct-value
    * counting decomposition `equidepth_hist` demonstrates — the
    * semantics here are the spec, pinned by the oracle either way.
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), epochSecOf(col("o_orderdate")).as("ts_sec"),
        cents(col("o_totalprice")).as("cents"))
      .select(col("o_custkey"), expr("ts_sec div 86400").as("day"), col("cents"))
    val cust = o.groupBy(col("o_custkey")).agg(
      max(col("day")).as("last_day"), count(lit(1)).as("freq"),
      sum(col("cents")).as("mon"))
      .localCheckpoint(eager = false) // shared by maxDay + scoring: one scan
    val maxDay = cust.agg(max(col("last_day")).as("max_day"))
    val scored = cust.crossJoin(broadcast(maxDay))
      .withColumn("recency", col("max_day") - col("last_day"))
    def quint(c: Column, asc: Boolean) = {
      val w = Window.orderBy(if (asc) c.asc else c.desc)
      (least(floor(percent_rank().over(w) * 5), lit(4)) + 1).cast("int")
    }
    scored
      .withColumn("r_score", quint(col("recency"), asc = false))
      .withColumn("f_score", quint(col("freq"), asc = true))
      .withColumn("m_score", quint(col("mon"), asc = true))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** epoch seconds that tolerates TIMESTAMP_NTZ (the [[Temporal]]
    * lane, shared here for o_orderdate).
    */
  private def epochSecOf(c: Column) = c.cast("timestamp").cast("long")

  /** Independence screen: the (returnflag × linestatus) contingency
    * table with expected counts and per-cell χ² contributions — the
    * categorical-association diagnostic next to [[corrMatrix]]'s
    * numeric one.  Emitting PER-CELL contributions (each ONE fixed
    * tree: `d = o·N − r·c` exact in integers, χ² = d²/(N·r·c) in
    * correctly-rounded doubles) keeps every value engine-exact — a
    * χ² TOTAL would be an order-dependent double sum, the exact trap
    * the per-cell form avoids; the caller sums the bounded cell list
    * if they want the statistic.
    *
    * Scale shape: one (a, b) keyed aggregate; margins derive from the
    * CELLS (bounded |a|·|b|), never from a second corpus pass.
    */
  def contingencyChi2(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // margins + output share the cells
    val ra = cells.groupBy(col("flag")).agg(sum(col("o")).as("rtot"))
    val cb = cells.groupBy(col("status")).agg(sum(col("o")).as("ctot"))
    val n = cells.agg(sum(col("o")).as("nn"))
    val d = (col("o") * col("nn") - col("rtot") * col("ctot")).cast("double")
    cells.join(broadcast(ra), Seq("flag")).join(broadcast(cb), Seq("status"))
      .crossJoin(broadcast(n))
      .select(col("flag"), col("status"), col("o").as("observed"),
        ((col("rtot") * col("ctot")).cast("double") / col("nn").cast("double"))
          .as("expected"),
        (d * d / ((col("rtot") * col("ctot")).cast("double") *
          col("nn").cast("double"))).as("chi2_cell"))
      .orderBy(col("flag"), col("status"))
  }

  /** Corpus-version drift monitor: per source, a slice×length-bucket
    * contingency between the snapshot and delta corpus slices (the
    * [[aggIncremental]] doc_id%10 slicing convention), emitted as
    * PER-CELL chi² contributions — the check a pipeline runs when a
    * new crawl lands: a crawler change that shifts the document-
    * length distribution of one source lights up that source's cells
    * before any content-level check fires.
    *
    * FLOAT DISCIPLINE (the [[contingencyChi2]] rule): every cell is
    * a fixed expression tree over exact integer counts — the total
    * chi² is a Σ of doubles and therefore ORDER-DEPENDENT, so the
    * judgment sum belongs to the consumer/spec, never the oracle
    * lane.  Zero-margin cells can't occur (cells exist only where
    * observed > 0, margins ≥ cell).
    *
    * Scale shape: one keyed aggregate collapses the corpus to
    * ≤ |sources|·2·10 cells map-side; margins re-aggregate those
    * cells (broadcast-joined back); everything after the first
    * aggregate is bounded-cardinality.
    */
  def driftReport(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .select(col("source"),
        when(pmod(col("doc_id"), lit(10)) === 0, lit("delta"))
          .otherwise(lit("snap")).as("slice"),
        least(expr("n_chars div 100"), lit(9)).as("bucket"))
      .groupBy(col("source"), col("slice"), col("bucket"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // margins + output share the cells
    val rs = cells.groupBy(col("source"), col("slice")).agg(sum(col("o")).as("rtot"))
    val cb = cells.groupBy(col("source"), col("bucket")).agg(sum(col("o")).as("ctot"))
    val n = cells.groupBy(col("source")).agg(sum(col("o")).as("nn"))
    val d = (col("o") * col("nn") - col("rtot") * col("ctot")).cast("double")
    cells
      .join(broadcast(rs), Seq("source", "slice"))
      .join(broadcast(cb), Seq("source", "bucket"))
      .join(broadcast(n), Seq("source"))
      .select(col("source"), col("slice"), col("bucket"),
        col("o").as("observed"),
        ((col("rtot") * col("ctot")).cast("double") / col("nn").cast("double"))
          .as("expected"),
        (d * d / ((col("rtot") * col("ctot")).cast("double") *
          col("nn").cast("double"))).as("chi2_cell"))
      .orderBy(col("source"), col("slice"), col("bucket"))
  }

  /** Data-quality constraint suite over the order star — the check set
    * a warehouse runs before trusting a load (the shape popularized by
    * Deequ/Great Expectations): PK uniqueness, FK integrity in both
    * directions of the star, row-local range constraints, and the
    * cross-table temporal consistency "no lineitem ships before its
    * order".  One row per check: (check_name, tbl, violations,
    * n_checked) — a report that is diffable across loads and alertable
    * on `violations > 0`.
    *
    * Scale shape — the suite costs TWO joins and TWO scans regardless
    * of how many checks it carries: all row-local lineitem range
    * checks ride one scan as conditional counting sums (map-side
    * partials collapse every partition to one row); the lineitem→
    * orders FK check and the ship-before-order consistency check
    * share ONE left join (violation = null probe side vs. matched-but-
    * inverted dates — both fall out of the same joined row); orders'
    * PK-uniqueness and orders→customer FK share the orders scan/join
    * the same way.  Adding a 20th range check at 100 TB adds one
    * `when` branch to an existing scan, not a pass.  The joins shuffle
    * on their keys (AQE-planned); every aggregate is a global count —
    * partial-aggregated map-side, so nothing wider than a handful of
    * longs crosses the wire.
    */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"), col("l_shipdate"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))

    // one lineitem scan: every row-local range constraint
    val liLocal = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("v_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.10, 1L)
        .otherwise(0L)).as("v_disc"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("v_price"))
    // one left join: FK lineitem→orders + ship-before-order consistency
    val liJoin = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_fk"),
        sum(when(col("o_orderkey").isNotNull &&
          col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)).as("v_ship"))
    // orders: PK uniqueness (scan) + FK orders→customer (left join)
    val ordPk = ord.agg(count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"))
    val ordFk = ord.select(col("o_custkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v"))

    // unpivot each 1-row aggregate with a generator so no source frame
    // is re-executed per check row
    val liRows = liLocal.select(
      stack(lit(3),
        lit("range_quantity"), col("v_qty"),
        lit("range_discount"), col("v_disc"),
        lit("range_extendedprice"), col("v_price")).as(Seq("check_name", "violations")),
      lit("lineitem").as("tbl"), col("n"))
    val ljRows = liJoin.select(
      stack(lit(2),
        lit("fk_orderkey"), col("v_fk"),
        lit("ship_before_order"), col("v_ship")).as(Seq("check_name", "violations")),
      lit("lineitem").as("tbl"), col("n"))
    val opRows = ordPk.select(lit("pk_unique").as("check_name"),
      col("v_dup").as("violations"), lit("orders").as("tbl"), col("n"))
    val ofRows = ordFk.select(lit("fk_custkey").as("check_name"),
      col("v").as("violations"), lit("orders").as("tbl"), col("n"))

    liRows.unionByName(ljRows).unionByName(opRows).unionByName(ofRows)
      .select(col("check_name"), col("tbl"),
        col("violations").cast("long").as("violations"),
        col("n").cast("long").as("n_checked"))
      .orderBy(col("check_name"), col("tbl"))
  }

  /** Referential-integrity audit across the star schema's FK edges —
    * the batch image of [[graft.streaming.Stateful.fkMonitor]]'s keyed
    * state, and the first table a data engineer checks after a load:
    * one row per FK edge with child-row count, orphan rows/keys
    * (children whose parent is missing) and CHILDLESS parents
    * (coverage in the opposite direction — e.g. customers who never
    * ordered; on a clean load the orphan columns are structural
    * zeros and the childless column is the coverage signal).
    *
    * Scale shape per edge: ONE keyed aggregate over child ∪ parent
    * rows (the fkMonitor pre-reduce as a batch plan — per key, child
    * count + parent presence, map-side combined), then a bounded
    * second aggregate; no join, no distinct pass, nothing carried
    * but (key, count, flag).  Five edges = five independent
    * pipelines unioned into a 5-row report.
    */
  def fkOrphans(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val tagged = child.select(col(childKey).cast("long").as("k"), lit(1L).as("w"))
        .unionByName(parent.select(col(parentKey).cast("long").as("k"), lit(0L).as("w")))
      tagged.groupBy(col("k"))
        .agg(sum(col("w")).as("nc"),
          max(when(col("w") === 0, 1).otherwise(0)).as("hasp"))
        .agg(
          sum(col("nc")).as("n_child_rows"),
          sum(when(col("hasp") === 0, col("nc")).otherwise(0L)).as("n_orphan_rows"),
          // NULL child FKs: they ARE orphan rows (NOT EXISTS is true
          // for a NULL key on both engines) but COUNT(DISTINCT key)
          // ignores NULLs in SQL — exclude the null group from the key
          // count so operator and oracle agree by construction on
          // nullable-FK data, not just on non-null TPC-H.
          sum(when(col("hasp") === 0 && col("nc") > 0 && col("k").isNotNull, 1L)
            .otherwise(0L)).as("n_orphan_keys"),
          sum(when(col("hasp") === 1 && col("nc") === 0, 1L).otherwise(0L)).as("n_childless_parents"))
        .select(lit(name).as("fk_name"), col("n_child_rows"),
          col("n_orphan_rows"), col("n_orphan_keys"), col("n_childless_parents"))
    }
    edge("customer_nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey")
      .unionByName(edge("lineitem_orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"))
      .unionByName(edge("nation_region", Tables.nation(s, dir), "n_regionkey",
        Tables.region(s, dir), "r_regionkey"))
      .unionByName(edge("orders_customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .unionByName(edge("supplier_nation", Tables.supplier(s, dir), "s_nationkey",
        Tables.nation(s, dir), "n_nationkey"))
      .orderBy(col("fk_name"))
  }

  /** Directed association rules over the co-purchase substrate —
    * [[basketPairs]]' undirected top-support view upgraded to the
    * recommender's actual ranking: for every ordered pair a→b with
    * support ≥ 2, confidence = P(b|a) = n_ab/n_a and lift =
    * n_ab·N/(n_a·n_b), top-20 by confidence (support, antecedent,
    * consequent break ties totally, so the cut is deterministic).
    *
    * Rides the materialized `copurchase_pairs` artifact (the
    * link_predict/graph_kcore substrate — one FileScan instead of the
    * order-keyed self-join); supports and the order total are one
    * independent scan-aggregate pair, the 1-row total broadcasts, and
    * the cut is a TakeOrderedAndProject.  Confidence and lift are
    * single IEEE divisions of exact integer products ⇒ engine-exact
    * doubles.
    */
  def basketRules(s: SparkSession, dir: String): DataFrame = {
    val pairs = GraphOps.coPurchasePairs(s, dir)
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .localCheckpoint(eager = false)
    val supp = items.groupBy(col("pk")).agg(count(lit(1)).as("n_supp"))
    val directed = pairs.select(col("src").as("a"), col("dst").as("b"), col("n_ab"))
      .unionByName(pairs.select(col("dst").as("a"), col("src").as("b"), col("n_ab")))
    directed.filter(col("n_ab") >= 2)
      .join(supp.select(col("pk").as("a"), col("n_supp").as("n_a")), Seq("a"))
      .join(supp.select(col("pk").as("b"), col("n_supp").as("n_b")), Seq("b"))
      .crossJoin(broadcast(items.agg(countDistinct(col("ok")).as("n_orders"))))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("n_ab").as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(desc("confidence"), desc("support"), col("antecedent"), col("consequent"))
      .limit(20)
  }

  /** Customer-value deciles: customers ranked by lifetime revenue
    * (exact cents), split into 10 equal-depth tiles (decile 10 = the
    * top spenders), each reporting its customer count, order count
    * and exact revenue — the LTV segmentation a marketing team reads
    * next to [[rfmSegments]] and [[giniTopshare]].
    *
    * Exactness: revenue is an exact integer cents sum; the tile
    * assignment replays NTILE's base/big arithmetic on an exact
    * global position, tie-broken (rev, custkey) — a total order, so
    * both engines assign identical tiles.
    *
    * Scale shape: the [[equidepthHist]] staircase — NO corpus-wide
    * row_number: the cumulative window runs over |distinct revenue
    * values| staircase rows and the per-row position is a PER-VALUE
    * row_number (keyed window) added to the staircase offset; the
    * per-customer aggregate is the only corpus-sized exchange.
    */
  def customerValueDeciles(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val rev = Tables.orders(s, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("v"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("v")).as("rev_cents"), count(lit(1)).as("n_orders"))
      .localCheckpoint(eager = false) // feeds staircase, total, and join
    val vc = rev.groupBy(col("rev_cents")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("rev_cents")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = vc.select(col("rev_cents"),
      coalesce(sum(col("cnt")).over(wCum), lit(0L)).as("lo"))
    val tot = rev.agg(count(lit(1)).as("n"))
    val wIn = Window.partitionBy(col("rev_cents")).orderBy(col("o_custkey"))
    rev.join(cum, Seq("rev_cents"))
      .withColumn("pos", col("lo") + row_number().over(wIn) - lit(1))
      .crossJoin(broadcast(tot))
      .select(col("rev_cents"), col("n_orders"), col("pos"),
        expr(s"n div $k").as("base"), (col("n") % k).as("big"))
      .withColumn("decile",
        when(col("pos") < col("big") * (col("base") + 1),
          expr("pos div (base + 1)"))
          .otherwise(col("big") + expr("(pos - big * (base + 1)) div base"))
          .cast("int") + lit(1))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("n_orders")).as("n_orders"),
        sum(col("rev_cents")).as("rev_cents"))
      .orderBy(col("decile"))
  }

  /** Repeat-purchase rate per market segment — the loyalty KPI next to
    * [[rfmSegments]]: how many buyers a segment has, how many came
    * back (≥2 orders), the repeat rate and orders-per-buyer.
    *
    * Exactness: pure count lane; the two rates are one IEEE division
    * of exact longs each.
    *
    * Scale shape: aggregate-before-join — orders collapses to one row
    * per customer BEFORE meeting the customer dim on its natural key,
    * then a ≤|segments|-key aggregate.  The fact table never reaches
    * the join.
    */
  def repeatPurchase(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    perCust
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("n_ord") >= 2, 1L).otherwise(0L)).as("n_repeat"),
        sum(col("n_ord")).as("n_orders"))
      .select(col("c_mktsegment"), col("n_buyers"), col("n_repeat"),
        col("n_orders"),
        (col("n_repeat").cast("double") / col("n_buyers")).as("repeat_rate"),
        (col("n_orders").cast("double") / col("n_buyers")).as("orders_per_buyer"))
      .orderBy(col("c_mktsegment"))
  }

  /** Customer segment-migration matrix — cohort movement between the
    * first and second half of the order timeline (cut 1998-01-01):
    * each customer gets an activity tier per period from exact order
    * counts (none / low 1–2 / mid 3–5 / high 6+), and the matrix
    * counts customers per (before, after) tier pair — the churn /
    * upgrade dashboard [[rfmSegments]]' single-snapshot view cannot
    * show.
    *
    * Exactness: tiers are CASE thresholds on exact longs; the matrix
    * is a count.  Nothing floats.
    *
    * Scale shape: one orders scan with two conditional counts per
    * customer (map-side combined), tiering map-side on the ≤|custs|
    * aggregate, then a ≤16-key matrix aggregate.  No join at all.
    */
  def segmentMigration(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    def tier(c: Column) = when(c === 0L, "none").when(c <= 2L, "low")
      .when(c <= 5L, "mid").otherwise("high")
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("n1"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("n2"))
      .select(tier(col("n1")).as("seg_before"), tier(col("n2")).as("seg_after"))
      .groupBy(col("seg_before"), col("seg_after"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("seg_before"), col("seg_after"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "repeat_purchase" -> (repeatPurchase _),
    "segment_migration" -> (segmentMigration _),
    "customer_value_deciles" -> (customerValueDeciles _),
    "fk_orphans" -> (fkOrphans _),
    "basket_rules" -> (basketRules _),
    "dq_checks" -> (dqChecks _),
    "drift_report" -> (driftReport _),
    "skew_report" -> (skewReport _),
    "basket_pairs" -> (basketPairs _),
    "agg_incremental" -> (aggIncremental _),
    "rfm_segments" -> (rfmSegments _),
    "contingency_chi2" -> (contingencyChi2 _),
    "window_distribution" -> (windowDistribution _),
    "quantile_sketch" -> (quantileSketch _),
    "corr_matrix" -> (corrMatrix _),
    "pareto_front" -> (paretoFront _),
    "equidepth_hist" -> (equidepthHist _),
    "entity_match" -> (entityMatch _),
    "gini_topshare" -> (giniTopshare _),
    "benford_digits" -> (benfordDigits _),
    "quality_mad" -> (qualityMad _))

  def oracleSql: Map[String, String] = Map(
    // pure count lane; rates are one IEEE division of exact longs
    "repeat_purchase" ->
      """WITH pc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY 1)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_buyers,
        |  CAST(SUM(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
        |  CAST(SUM(n_ord) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS repeat_rate,
        |  CAST(SUM(n_ord) AS DOUBLE) / COUNT(*) AS orders_per_buyer
        |FROM pc JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // CASE tiers on exact longs; the matrix is a count — nothing floats
    "segment_migration" ->
      """WITH pc AS (SELECT o_custkey,
        |  CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM orders GROUP BY 1),
        |t AS (SELECT
        |  CASE WHEN n1 = 0 THEN 'none' WHEN n1 <= 2 THEN 'low'
        |       WHEN n1 <= 5 THEN 'mid' ELSE 'high' END AS seg_before,
        |  CASE WHEN n2 = 0 THEN 'none' WHEN n2 <= 2 THEN 'low'
        |       WHEN n2 <= 5 THEN 'mid' ELSE 'high' END AS seg_after
        |  FROM pc)
        |SELECT seg_before, seg_after, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // DuckDB's NTILE implements exactly the base/big arithmetic the
    // Spark side replays on the staircase position (total tie order
    // (rev, custkey)); revenue is the exact integer cents lane
    "customer_value_deciles" ->
      """WITH r AS (SELECT o_custkey,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1),
        |t AS (SELECT rev_cents, n_orders,
        |  NTILE(10) OVER (ORDER BY rev_cents, o_custkey) AS decile FROM r)
        |SELECT CAST(decile AS INT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
        |  CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    // each FK edge replayed as NOT-EXISTS scans; orphan columns are
    // structural zeros on clean TPC-H, childless parents carry signal
    "fk_orphans" ->
      """WITH e1 AS (SELECT 'customer_nation' AS fk_name,
        |  CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_child_rows,
        |  CAST((SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT) AS n_orphan_rows,
        |  CAST((SELECT COUNT(DISTINCT c_nationkey) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT) AS n_orphan_keys,
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = p.k)) AS BIGINT) AS n_childless_parents),
        |e2 AS (SELECT 'lineitem_orders',
        |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
        |  CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = p.k)) AS BIGINT)),
        |e3 AS (SELECT 'nation_region',
        |  CAST((SELECT COUNT(*) FROM nation) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        |    (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)) AS BIGINT),
        |  CAST((SELECT COUNT(DISTINCT n_regionkey) FROM nation n WHERE NOT EXISTS
        |    (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT r_regionkey AS k FROM region) p
        |    WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = p.k)) AS BIGINT)),
        |e4 AS (SELECT 'orders_customer',
        |  CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |  CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.k)) AS BIGINT)),
        |e5 AS (SELECT 'supplier_nation',
        |  CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)) AS BIGINT),
        |  CAST((SELECT COUNT(DISTINCT s_nationkey) FROM supplier s WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = p.k)) AS BIGINT))
        |SELECT * FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
        |  UNION ALL SELECT * FROM e5) ORDER BY fk_name""".stripMargin,
    "basket_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |    FROM lineitem),
        |pairs AS (SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS n_ab
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2),
        |directed AS (SELECT src AS a, dst AS b, n_ab FROM pairs
        |  UNION ALL SELECT dst, src, n_ab FROM pairs),
        |supp AS (SELECT pk, COUNT(*) AS n_supp FROM items GROUP BY 1),
        |tot AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items)
        |SELECT d.a AS antecedent, d.b AS consequent,
        |  CAST(d.n_ab AS BIGINT) AS support,
        |  CAST(d.n_ab AS DOUBLE) / CAST(sa.n_supp AS DOUBLE) AS confidence,
        |  CAST(d.n_ab * t.n_orders AS DOUBLE)
        |    / CAST(sa.n_supp * sb.n_supp AS DOUBLE) AS lift
        |FROM directed d
        |JOIN supp sa ON d.a = sa.pk
        |JOIN supp sb ON d.b = sb.pk
        |CROSS JOIN tot t
        |WHERE d.n_ab >= 2
        |ORDER BY confidence DESC, support DESC, antecedent, consequent
        |LIMIT 20""".stripMargin,
    // every aggregate is an integer count; SUM over ints is HUGEINT in
    // DuckDB -> explicit BIGINT casts (the standard trap)
    "dq_checks" ->
      """WITH li AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty,
        |  SUM(CASE WHEN l_discount < 0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS v_disc,
        |  SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price
        |  FROM lineitem),
        |lj AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_fk,
        |  SUM(CASE WHEN o.o_orderkey IS NOT NULL
        |           AND l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS v_ship
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |op AS (SELECT COUNT(*) AS n,
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup FROM orders),
        |ofk AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT * FROM (
        |  SELECT 'range_quantity' AS check_name, 'lineitem' AS tbl,
        |    CAST(v_qty AS BIGINT) AS violations, n AS n_checked FROM li
        |  UNION ALL SELECT 'range_discount', 'lineitem', CAST(v_disc AS BIGINT), n FROM li
        |  UNION ALL SELECT 'range_extendedprice', 'lineitem', CAST(v_price AS BIGINT), n FROM li
        |  UNION ALL SELECT 'fk_orderkey', 'lineitem', CAST(v_fk AS BIGINT), n FROM lj
        |  UNION ALL SELECT 'ship_before_order', 'lineitem', CAST(v_ship AS BIGINT), n FROM lj
        |  UNION ALL SELECT 'pk_unique', 'orders', CAST(v_dup AS BIGINT), n FROM op
        |  UNION ALL SELECT 'fk_custkey', 'orders', CAST(v AS BIGINT), n FROM ofk
        |) ORDER BY check_name, tbl""".stripMargin,
    // per-source 2xB contingency replayed with the same integer counts
    // and the identical per-cell double tree (see contingency_chi2)
    "drift_report" ->
      """WITH b AS (SELECT source,
        |  CASE WHEN doc_id % 10 = 0 THEN 'delta' ELSE 'snap' END AS slice,
        |  LEAST(n_chars // 100, 9) AS bucket FROM documents),
        |cells AS (SELECT source, slice, bucket, COUNT(*) AS o
        |          FROM b GROUP BY 1, 2, 3),
        |rs AS (SELECT source, slice, CAST(SUM(o) AS BIGINT) AS rtot
        |       FROM cells GROUP BY 1, 2),
        |cb AS (SELECT source, bucket, CAST(SUM(o) AS BIGINT) AS ctot
        |       FROM cells GROUP BY 1, 2),
        |t AS (SELECT source, CAST(SUM(o) AS BIGINT) AS nn
        |      FROM cells GROUP BY 1)
        |SELECT source, slice, bucket, o AS observed,
        |  CAST(rtot * ctot AS DOUBLE) / CAST(nn AS DOUBLE) AS expected,
        |  (CAST(o * nn - rtot * ctot AS DOUBLE)
        |     * CAST(o * nn - rtot * ctot AS DOUBLE))
        |    / (CAST(rtot * ctot AS DOUBLE) * CAST(nn AS DOUBLE)) AS chi2_cell
        |FROM cells JOIN rs USING (source, slice)
        |           JOIN cb USING (source, bucket)
        |           JOIN t USING (source)
        |ORDER BY source, slice, bucket""".stripMargin,
    "benford_digits" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE floor(o_totalprice * 100) > 0),
        |c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
        |SELECT digit, n_obs, n_obs * 1000000 // n AS share_ppm
        |FROM c, t ORDER BY digit""".stripMargin,
    // the staircase decomposition replayed verbatim: W, T in HUGEINT
    // (≡ Spark decimal(38,0)), ONE double division for gini, long-lane
    // floor division for the ppm shares
    "gini_topshare" ->
      """WITH rev AS (SELECT o_custkey,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev FROM orders GROUP BY 1),
        |vc AS (SELECT rev AS v, COUNT(*) AS cnt FROM rev GROUP BY 1),
        |st AS (SELECT v, cnt,
        |  COALESCE(SUM(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
        |  (cnt * (cnt + 1)) // 2 AS tri FROM vc),
        |agg AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |  SUM(CAST(v AS HUGEINT) * cnt) AS t,
        |  SUM(CAST(v AS HUGEINT) * (CAST(cnt AS HUGEINT) * lo + tri)) AS w
        |  FROM st),
        |tops AS (SELECT
        |  SUM(CAST(v AS HUGEINT) * GREATEST(0, LEAST(cnt,
        |    lo + cnt - (n - n // 100)))) AS s1,
        |  SUM(CAST(v AS HUGEINT) * GREATEST(0, LEAST(cnt,
        |    lo + cnt - (n - n // 10)))) AS s10
        |  FROM st, agg)
        |SELECT n AS n_customers, CAST(t AS BIGINT) AS total_cents,
        |  CAST(2 * w - (n + 1) * t AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * t AS DOUBLE) AS gini,
        |  CAST(CAST(s1 AS BIGINT) * 1000000 // CAST(t AS BIGINT) AS BIGINT)
        |    AS top1_share_ppm,
        |  CAST(CAST(s10 AS BIGINT) * 1000000 // CAST(t AS BIGINT) AS BIGINT)
        |    AS top10_share_ppm
        |FROM agg, tops""".stripMargin,
    "contingency_chi2" ->
      """WITH cells AS (SELECT l_returnflag AS flag, l_linestatus AS status,
        |  COUNT(*) AS o FROM lineitem GROUP BY 1, 2),
        |ra AS (SELECT flag, CAST(SUM(o) AS BIGINT) AS rtot FROM cells GROUP BY 1),
        |cb AS (SELECT status, CAST(SUM(o) AS BIGINT) AS ctot FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells)
        |SELECT flag, status, o AS observed,
        |  CAST(rtot * ctot AS DOUBLE) / CAST(nn AS DOUBLE) AS expected,
        |  (CAST(o * nn - rtot * ctot AS DOUBLE)
        |     * CAST(o * nn - rtot * ctot AS DOUBLE))
        |    / (CAST(rtot * ctot AS DOUBLE) * CAST(nn AS DOUBLE)) AS chi2_cell
        |FROM cells JOIN ra USING (flag) JOIN cb USING (status) CROSS JOIN t
        |ORDER BY flag, status""".stripMargin,
    "rfm_segments" ->
      """WITH o AS (SELECT o_custkey,
        |  (epoch_us(o_orderdate) // 1000000) // 86400 AS day,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT o_custkey, MAX(day) AS last_day, COUNT(*) AS freq,
        |  CAST(SUM(cents) AS BIGINT) AS mon FROM o GROUP BY 1),
        |sc AS (SELECT *, (SELECT MAX(last_day) FROM c) - last_day AS recency
        |       FROM c),
        |q AS (SELECT
        |  CAST(LEAST(floor(percent_rank() OVER (ORDER BY recency DESC) * 5), 4)
        |    AS INT) + 1 AS r_score,
        |  CAST(LEAST(floor(percent_rank() OVER (ORDER BY freq ASC) * 5), 4)
        |    AS INT) + 1 AS f_score,
        |  CAST(LEAST(floor(percent_rank() OVER (ORDER BY mon ASC) * 5), 4)
        |    AS INT) + 1 AS m_score
        |  FROM sc)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // flat recompute — merge ≡ recompute is the property under test
    "agg_incremental" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |t AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM it),
        |sup AS (SELECT pk, COUNT(*) AS n_supp FROM it GROUP BY 1),
        |pr AS (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
        |       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2)
        |SELECT pa, pb, n_ab,
        |  CAST(n_ab * n_orders AS DOUBLE)
        |    / CAST(sa.n_supp * sb.n_supp AS DOUBLE) AS lift
        |FROM pr JOIN sup sa ON pr.pa = sa.pk
        |        JOIN sup sb ON pr.pb = sb.pk
        |        CROSS JOIN t
        |ORDER BY n_ab DESC, pa, pb LIMIT 20""".stripMargin,
    "skew_report" ->
      """WITH kc AS (SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |h AS (SELECT c, COUNT(*) AS nk FROM kc GROUP BY 1),
        |cum AS (SELECT c, SUM(nk) OVER (ORDER BY c
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi FROM h),
        |t AS (SELECT CAST(SUM(nk) AS BIGINT) AS n_keys,
        |  CAST(SUM(c * nk) AS BIGINT) AS n_rows, MAX(c) AS max_cnt FROM h)
        |SELECT n_rows, n_keys, max_cnt,
        |  MIN(CASE WHEN hi * 2 >= n_keys THEN c END) AS p50_cnt,
        |  MIN(CASE WHEN hi * 100 >= n_keys * 99 THEN c END) AS p99_cnt,
        |  (max_cnt * 1000000) // n_rows AS top_share_ppm
        |FROM cum, t
        |GROUP BY n_rows, n_keys, max_cnt""".stripMargin,
    // moments in HUGEINT (exact ≡ Spark's DECIMAL(38,0) sums), then the
    // SAME double expression tree per pair — see corrMatrix scaladoc
    "corr_matrix" ->
      """WITH l AS (SELECT
        |  CAST(floor(l_quantity * 100) AS BIGINT) AS qty,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS disc,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax FROM lineitem),
        |m AS (SELECT COUNT(*) AS n,
        |  SUM(CAST(qty AS HUGEINT)) AS s_qty,
        |  SUM(CAST(price AS HUGEINT)) AS s_price,
        |  SUM(CAST(disc AS HUGEINT)) AS s_disc,
        |  SUM(CAST(tax AS HUGEINT)) AS s_tax,
        |  SUM(CAST(qty AS HUGEINT) * qty) AS ss_qty,
        |  SUM(CAST(price AS HUGEINT) * price) AS ss_price,
        |  SUM(CAST(disc AS HUGEINT) * disc) AS ss_disc,
        |  SUM(CAST(tax AS HUGEINT) * tax) AS ss_tax,
        |  SUM(CAST(qty AS HUGEINT) * price) AS sp_qty_price,
        |  SUM(CAST(qty AS HUGEINT) * disc) AS sp_qty_disc,
        |  SUM(CAST(qty AS HUGEINT) * tax) AS sp_qty_tax,
        |  SUM(CAST(price AS HUGEINT) * disc) AS sp_price_disc,
        |  SUM(CAST(price AS HUGEINT) * tax) AS sp_price_tax,
        |  SUM(CAST(disc AS HUGEINT) * tax) AS sp_disc_tax
        |  FROM l),
        |p AS (
        |  SELECT 'qty' AS var_a, 'price' AS var_b, sp_qty_price AS sp,
        |         s_qty AS sa, s_price AS sb, ss_qty AS ssa, ss_price AS ssb, n FROM m
        |  UNION ALL SELECT 'qty', 'disc', sp_qty_disc, s_qty, s_disc, ss_qty, ss_disc, n FROM m
        |  UNION ALL SELECT 'qty', 'tax', sp_qty_tax, s_qty, s_tax, ss_qty, ss_tax, n FROM m
        |  UNION ALL SELECT 'price', 'disc', sp_price_disc, s_price, s_disc, ss_price, ss_disc, n FROM m
        |  UNION ALL SELECT 'price', 'tax', sp_price_tax, s_price, s_tax, ss_price, ss_tax, n FROM m
        |  UNION ALL SELECT 'disc', 'tax', sp_disc_tax, s_disc, s_tax, ss_disc, ss_tax, n FROM m)
        |SELECT var_a, var_b,
        |  (CAST(n AS DOUBLE) * CAST(sp AS DOUBLE)
        |     - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |  / sqrt((CAST(n AS DOUBLE) * CAST(ssa AS DOUBLE)
        |            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(ssb AS DOUBLE)
        |            - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS corr
        |FROM p ORDER BY var_a, var_b""".stripMargin,
    "window_distribution" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS prio,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderkey, prio, cents,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM o
        |WINDOW w AS (PARTITION BY prio ORDER BY cents)
        |ORDER BY prio, cents, o_orderkey""".stripMargin,
    // the quadratic dominance spec the staircase plan must equal
    "pareto_front" ->
      """WITH p AS (SELECT p_partkey, p_name,
        |  CAST(floor(p_retailprice * 100) AS BIGINT) AS cents, p_size
        |  FROM part)
        |SELECT p_partkey, p_name, cents, p_size FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.cents <= a.cents AND b.p_size >= a.p_size
        |    AND (b.cents < a.cents OR b.p_size > a.p_size))
        |ORDER BY cents, p_partkey""".stripMargin,
    "equidepth_hist" ->
      """WITH l AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
        |  l_orderkey, l_linenumber FROM lineitem),
        |t AS (SELECT cents,
        |  NTILE(16) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS tile
        |  FROM l)
        |SELECT CAST(tile AS INT) AS tile, COUNT(*) AS n_rows,
        |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "entity_match" ->
      """WITH p AS (SELECT p_partkey AS k, p_name AS n,
        |  split_part(p_name, ' ', 2) AS blk FROM part),
        |pr AS (SELECT a.blk, levenshtein(a.n, b.n) AS dist
        |       FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k),
        |np AS (SELECT blk, COUNT(*) AS n_parts FROM p GROUP BY 1)
        |SELECT blk, n_parts, COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN dist > 0 AND dist <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fuzzy
        |FROM pr JOIN np USING (blk)
        |GROUP BY blk, n_parts ORDER BY blk""".stripMargin,
    // quantile_cont(0.5) ≡ the counting median: exact on integer input
    "quality_mad" ->
      """WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
        |           FROM documents GROUP BY 1),
        |d AS (SELECT d.source,
        |  ABS(2 * d.n_chars - CAST(2 * m.med AS BIGINT)) AS dd, m.med
        |  FROM documents d JOIN m USING (source)),
        |mm AS (SELECT source, quantile_cont(dd, 0.5) AS mad2
        |       FROM d GROUP BY 1)
        |SELECT source, COUNT(*) AS n_docs,
        |  MAX(med) AS med_chars, MAX(mad2) / 2.0 AS mad_chars,
        |  CAST(SUM(CASE WHEN 4 * dd > CAST(6 * mad2 AS BIGINT)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mm USING (source)
        |GROUP BY source ORDER BY source""".stripMargin)
}
