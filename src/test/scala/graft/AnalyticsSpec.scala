package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.sources.Tables

/** Sequential-replay oracles for [[graft.operators.Analytics]]: the
  * quadratic/sort-based reference semantics each scale-shaped plan must
  * equal, run over the collected sf0.001 tables.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def centsOf(x: Double): Long = math.floor(x * 100).toLong

  private lazy val parts: Array[(Long, String, Long, Int)] =
    Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), centsOf(r.getDouble(2)), r.getInt(3)))

  test("pareto_front equals the quadratic dominance scan") {
    val want = parts.filter { case (_, _, c, sz) =>
      !parts.exists { case (_, _, c2, sz2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz)
      }
    }.map(p => (p._1, p._3, p._4)).toSet
    val got = Analytics.paretoFront(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("cents"),
        r.getAs[Int]("p_size"))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("pareto_front staircase join is broadcast") {
    val plan = Analytics.paretoFront(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("equidepth_hist equals sorted NTILE replay and balances tiles") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (centsOf(r.getDouble(0)), r.getLong(1), r.getInt(2)))
      .sortBy(identity)
    val k = 16
    val n = li.length
    val base = n / k
    val big = n % k
    // NTILE: first (n mod k) tiles take (base+1) rows, in order
    val expect = li.zipWithIndex.map { case ((c, _, _), pos) =>
      val tile = if (pos < big * (base + 1)) pos / (base + 1)
      else big + (pos - big * (base + 1)) / base
      (tile + 1, c)
    }.groupBy(_._1).map { case (t, rows) =>
      t -> (rows.length.toLong, rows.map(_._2).min, rows.map(_._2).max,
        rows.map(_._2).sum)
    }
    val got = Analytics.equidepthHist(spark, sf).collect()
      .map(r => r.getAs[Int]("tile") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("lo_cents"),
          r.getAs[Long]("hi_cents"), r.getAs[Long]("sum_cents"))).toMap
    assert(got == expect)
    // equi-depth: tile sizes differ by at most one
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
  }

  test("entity_match counts pairs exactly per block") {
    val byBlk = parts.groupBy(_._2.split(" ")(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = Analytics.entityMatch(spark, sf).collect()
      .map(r => r.getAs[String]("blk") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_exact"), r.getAs[Long]("n_fuzzy"))).toMap
    assert(got.keySet == byBlk.keySet)
    byBlk.foreach { case (blk, ps) =>
      val pairs = for {
        (ka, na, _, _) <- ps; (kb, nb, _, _) <- ps if ka < kb
      } yield lev(na, nb)
      val want = (ps.length.toLong, pairs.length.toLong,
        pairs.count(_ == 0).toLong, pairs.count(d => d > 0 && d <= 2).toLong)
      assert(got(blk) == want, s"block $blk")
    }
  }

  test("quality_mad equals the sort-based median/MAD per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def median2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n - 1) / 2) + s(n / 2) // lower + upper middle (0-based)
    }
    val got = Analytics.qualityMad(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("med_chars"),
          r.getAs[Double]("mad_chars"), r.getAs[Long]("n_outliers"))).toMap
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val xs = ds.map(_._2).toSeq
      val med2 = median2(xs)
      val dd = xs.map(x => math.abs(2 * x - med2))
      val mad4 = median2(dd)
      val out = dd.count(d => 4 * d > 3 * mad4).toLong
      assert(got(src) == ((xs.length.toLong, med2 / 2.0, mad4 / 4.0, out)),
        s"source $src")
    }
    assert(got.size == docs.map(_._1).distinct.length)
  }

  test("basket_pairs equals the sequential co-occurrence replay") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val supp = items.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCnt = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val want = pairCnt.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
      .map { case ((a, b), n) =>
        (a, b, n, (n * nOrders).toDouble / (supp(a) * supp(b)).toDouble)
      }
    val got = Analytics.basketPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("lift"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("fk_orphans equals the set-algebra replay on the clean star schema") {
    // dimension keys are int32 in the parquet — cast to the long lane
    // the operator itself uses
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").cast("long")).collect().map(_.getLong(0))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sup = Tables.supplier(spark, sf)
      .select(col("s_nationkey").cast("long")).collect().map(_.getLong(0))
    val reg = Tables.region(spark, sf)
      .select(col("r_regionkey").cast("long")).collect().map(_.getLong(0))
    def replay(name: String, children: Seq[Long], parents: Seq[Long]) = {
      val pset = parents.toSet
      val cset = children.toSet
      (name, children.length.toLong,
        children.count(k => !pset.contains(k)).toLong,
        cset.count(k => !pset.contains(k)).toLong,
        pset.count(k => !cset.contains(k)).toLong)
    }
    val want = Seq(
      replay("customer_nation", cust.map(_._2).toSeq, nat.map(_._1).toSeq),
      replay("lineitem_orders", li.toSeq, ord.map(_._1).toSeq),
      replay("nation_region", nat.map(_._2).toSeq, reg.toSeq),
      replay("orders_customer", ord.map(_._2).toSeq, cust.map(_._1).toSeq),
      replay("supplier_nation", sup.toSeq, nat.map(_._1).toSeq)).sortBy(_._1)
    val got = Analytics.fkOrphans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.forall(_._3 === 0L), "clean star schema: no orphan rows")
    assert(got.forall(_._2 > 0L), "every edge audits a nonempty child table")
    assert(got.map(_._1) === got.map(_._1).sorted, "deterministic edge order")
  }

  test("fk_orphans: planted orphans and childless parents are counted per edge") {
    import spark.implicits._
    // engineered star: nation 1..3; customers referencing nation 1, 2
    // and a DANGLING nation 9 (two rows on key 9 — orphan rows vs
    // orphan keys differ); nation 3 has no customers (childless)
    val dir = java.nio.file.Files.createTempDirectory("graft_fk_orphans").toString
    Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 9L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq((0L, "r")).toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((20L, 1L)).toDF("s_suppkey", "s_nationkey").write.parquet(s"$dir/supplier.parquet")
    Seq((30L, 10L)).toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    Seq((30L, 1L)).toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val got = Analytics.fkOrphans(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .map(t => t._1 -> t).toMap
    assert(got("customer_nation") === (("customer_nation", 4L, 2L, 1L, 1L)),
      "two orphan rows on one dangling key; nation 3 childless")
    assert(got("orders_customer") === (("orders_customer", 1L, 0L, 0L, 3L)),
      "three customers never ordered")
    assert(got("supplier_nation")._5 === 2L, "nations 2 and 3 have no supplier")
  }

  test("basket_rules equals the sequential directed-rule replay") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val supp = items.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCnt = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val directed = pairCnt.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val want = directed.filter(_._3 >= 2L).map { case (a, b, n) =>
      (a, b, n, n.toDouble / supp(a).toDouble,
        (n * nOrders).toDouble / (supp(a) * supp(b)).toDouble)
    }.sortBy { case (a, b, n, conf, _) => (-conf, -n, a, b) }.take(20)
    val got = Analytics.basketRules(spark, sf).collect()
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"),
        r.getAs[Long]("support"), r.getAs[Double]("confidence"),
        r.getAs[Double]("lift"))).toSeq
    assert(got === want)
    assert(got.nonEmpty && got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
  }

  test("contingency_chi2 cells replay exactly and margins conserve") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val n = rows.length.toLong
    val rtot = rows.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val ctot = rows.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val got = Analytics.contingencyChi2(spark, sf).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[String]("status")) ->
        (r.getAs[Long]("observed"), r.getAs[Double]("expected"),
          r.getAs[Double]("chi2_cell"))).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case ((f, st), o) =>
      val d = (o * n - rtot(f) * ctot(st)).toDouble
      val want = (o, (rtot(f) * ctot(st)).toDouble / n.toDouble,
        d * d / ((rtot(f) * ctot(st)).toDouble * n.toDouble))
      assert(got((f, st)) == want, s"cell ($f,$st)")
    }
    assert(got.values.map(_._1).sum == n)
  }

  test("rfm_segments replays the quintile assignment and conserves customers") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("ts_sec"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400, centsOf(r.getDouble(2))))
    val cust = orders.groupBy(_._1).map { case (k, os) =>
      (k, os.map(_._2).max, os.length.toLong, os.map(_._3).sum)
    }.toSeq
    val maxDay = cust.map(_._2).max
    def quint(xs: Seq[(Long, Long)], asc: Boolean): Map[Long, Int] = {
      // percent_rank: ties share (count of strictly-before) / (n-1)
      val n = xs.length
      xs.map { case (k, v) =>
        val before =
          if (asc) xs.count(o => o._2 < v) else xs.count(o => o._2 > v)
        val pr = if (n == 1) 0.0 else before.toDouble / (n - 1)
        k -> (math.min(math.floor(pr * 5), 4).toInt + 1)
      }.toMap
    }
    val r = quint(cust.map(c => c._1 -> (maxDay - c._2)), asc = false)
    val f = quint(cust.map(c => c._1 -> c._3), asc = true)
    val m = quint(cust.map(c => c._1 -> c._4), asc = true)
    val want = cust.map(c => (r(c._1), f(c._1), m(c._1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = Analytics.rfmSegments(spark, sf).collect()
      .map(row => (row.getAs[Int]("r_score"), row.getAs[Int]("f_score"),
        row.getAs[Int]("m_score")) -> row.getAs[Long]("n_customers")).toMap
    assert(got == want)
    assert(got.values.sum == cust.length)
    assert(got.keys.forall { case (a, b, c) =>
      (1 to 5).contains(a) && (1 to 5).contains(b) && (1 to 5).contains(c)
    })
  }

  test("skew_report equals the counted key-size distribution") {
    val counts = Tables.lineitem(spark, sf).select(col("l_orderkey")).collect()
      .map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong).toSeq.sorted
    val r = Analytics.skewReport(spark, sf).collect().head
    assert(r.getAs[Long]("n_keys") == counts.length)
    assert(r.getAs[Long]("n_rows") == counts.sum)
    assert(r.getAs[Long]("max_cnt") == counts.max)
    // counting percentiles: min c whose cumulative keys reach the position
    def pct(q: Int, of: Int) = counts((counts.length * q + of - 1) / of - 1)
    assert(r.getAs[Long]("p50_cnt") == pct(1, 2))
    assert(r.getAs[Long]("p99_cnt") == pct(99, 100))
    assert(r.getAs[Long]("top_share_ppm") == counts.max * 1000000 / counts.sum)
  }

  test("cusum_shift finds the planted level change exactly") {
    import spark.implicits._
    // 10 days at 100/day then 10 days at 200/day: CUSUM peaks at day 9
    val ev = (0 until 20).flatMap { d =>
      val n = if (d < 10) 100 else 200
      (0 until n).map(i => ("planted", d.toLong * 86400L + i))
    }.toDF("event_type", "ts_sec")
      .select(col("event_type"),
        org.apache.spark.sql.functions.timestamp_seconds(col("ts_sec")).as("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-cusum")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.operators.Temporal.cusumShift(spark, tmp.toString).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("shift_day") == 9L)
    // S_9 = 20*1000 - 10*3000 = -10000
    assert(r.head.getAs[Long]("s_scaled") == -10000L)
    assert(r.head.getAs[Long]("n_days") == 20L)
  }

  test("corr_matrix equals the exact-moment replay bit for bit") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")).collect()
      .map(r => Array(centsOf(r.getDouble(0)), centsOf(r.getDouble(1)),
        centsOf(r.getDouble(2)), centsOf(r.getDouble(3))))
    val names = Seq("qty", "price", "disc", "tax")
    val n = li.length
    def s(i: Int) = li.map(r => BigInt(r(i))).sum
    def sp(i: Int, j: Int) = li.map(r => BigInt(r(i)) * BigInt(r(j))).sum
    val got = Analytics.corrMatrix(spark, sf).collect()
      .map(r => (r.getAs[String]("var_a"), r.getAs[String]("var_b")) ->
        r.getAs[Double]("corr")).toMap
    assert(got.size == 6)
    for (Seq(i, j) <- (0 to 3).combinations(2)) {
      val num = n.toDouble * sp(i, j).toDouble - s(i).toDouble * s(j).toDouble
      val dxx = n.toDouble * sp(i, i).toDouble - s(i).toDouble * s(i).toDouble
      val dyy = n.toDouble * sp(j, j).toDouble - s(j).toDouble * s(j).toDouble
      val want = num / math.sqrt(dxx * dyy)
      val g = got((names(i), names(j)))
      assert(g == want, s"${names(i)}~${names(j)}: $g vs $want")
      assert(math.abs(g) <= 1.0 + 1e-12)
    }
  }

  test("window_distribution equals the integer-ratio replay") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), centsOf(r.getDouble(2))))
    val got = Analytics.windowDistribution(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"))).toMap
    orders.groupBy(_._2).foreach { case (_, grp) =>
      val n = grp.length
      grp.foreach { case (key, _, c) =>
        val below = grp.count(_._3 < c)
        val le = grp.count(_._3 <= c)
        val want = (if (n == 1) 0.0 else below.toDouble / (n - 1),
          le.toDouble / n)
        assert(got(key) == want, s"order $key")
      }
    }
  }

  test("quantile_sketch ranks land within the accuracy envelope") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    val rows = Analytics.quantileSketch(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("p"),
        r.getAs[Long]("q_chars")))
    assert(rows.length == bySrc.size * 4)
    rows.foreach { case (src, p, q) =>
      val xs = bySrc(src)
      val n = xs.length
      // exact rank interval occupied by value q in sorted order
      val lo = xs.count(_ < q)
      val hi = xs.count(_ <= q)
      val target = p * n
      val slack = n.toDouble / 1000 + 1 // accuracy envelope + discreteness
      assert(lo - slack <= target && target <= hi + slack,
        s"$src p=$p q=$q rank=[$lo,$hi] target=$target n=$n")
    }
  }

  test("gini_topshare equals the sorted-rank definition; staircase ≡ explicit ranks") {
    val rev = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), centsOf(r.getDouble(1))))
      .groupBy(_._1).map { case (c, os) => c -> os.map(_._2).sum }
      .values.toSeq.sorted
    val n = rev.length
    val t = rev.map(BigInt(_)).sum
    // explicit per-customer ranks 1..n — the definition the staircase
    // decomposition must reproduce regardless of tie ordering
    val w = rev.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(2) * w - BigInt(n + 1) * t).toDouble /
      (BigInt(n) * t).toDouble
    def topShare(k: Int): Long =
      ((rev.takeRight(k).map(BigInt(_)).sum * 1000000) / t).toLong
    val r = Analytics.giniTopshare(spark, sf).collect().head
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("total_cents") == t.toLong)
    assert(r.getAs[Double]("gini") == gini)
    assert(r.getAs[Long]("top1_share_ppm") == topShare(n / 100))
    assert(r.getAs[Long]("top10_share_ppm") == topShare(n / 10))
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("benford_digits replays exactly; chi2 vs the Benford reference is computable") {
    val cents = Tables.orders(spark, sf).select(col("o_totalprice"))
      .collect().map(r => centsOf(r.getDouble(0))).filter(_ > 0)
    val want = cents.groupBy(_.toString.head.asDigit)
      .map { case (d, v) => d -> v.length.toLong }
    val got = Analytics.benfordDigits(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap === want)
    val n = cents.length.toLong
    got.foreach { case (_, obs, ppm) => assert(ppm === obs * 1000000L / n) }
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // the judgment the op deliberately leaves to the consumer: chi²
    // against log10(1+1/d) — computable from the emitted integers
    val chi2 = got.map { case (d, obs, _) =>
      val e = n * math.log10(1.0 + 1.0 / d)
      (obs - e) * (obs - e) / e
    }.sum
    assert(chi2 >= 0 && !chi2.isNaN)
  }

  test("drift_report replays the per-source contingency exactly; cells conserve the corpus") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cells = docs.groupBy { case (src, id, nc) =>
      (src, if (id % 10 == 0) "delta" else "snap", math.min(nc / 100, 9L))
    }.map { case (k, v) => k -> v.length.toLong }
    val rows = Analytics.driftReport(spark, sf).collect()
    assert(rows.map(_.getLong(3)).sum === docs.length.toLong, "cells conserve corpus")
    val bySrc = cells.groupBy(_._1._1)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getLong(2))
      val o = cells(key)
      assert(r.getLong(3) === o, key)
      val src = bySrc(key._1)
      val rtot = src.filter(_._1._2 == key._2).values.sum
      val ctot = src.filter(_._1._3 == key._3).values.sum
      val nn = src.values.sum
      assert(r.getDouble(4) === (rtot * ctot).toDouble / nn.toDouble, key)
      val d = (o * nn - rtot * ctot).toDouble
      assert(r.getDouble(5) === d * d / ((rtot * ctot).toDouble * nn.toDouble), key)
    }
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      === cells.keySet)
  }

  test("dq_checks equals the sequential constraint replay") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"), col("l_shipdate"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getAs[java.time.LocalDateTime](4)))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val ordDate = ord.map(o => o._1 -> o._3).toMap

    val want = Map(
      ("range_quantity", "lineitem") ->
        (li.count(r => r._2 < 1 || r._2 > 50).toLong, li.length.toLong),
      ("range_discount", "lineitem") ->
        (li.count(r => r._3 < 0 || r._3 > 0.10).toLong, li.length.toLong),
      ("range_extendedprice", "lineitem") ->
        (li.count(_._4 <= 0).toLong, li.length.toLong),
      ("fk_orderkey", "lineitem") ->
        (li.count(r => !ordDate.contains(r._1)).toLong, li.length.toLong),
      ("ship_before_order", "lineitem") ->
        (li.count(r => ordDate.get(r._1).exists(r._5.isBefore(_))).toLong, li.length.toLong),
      ("pk_unique", "orders") ->
        ((ord.length - ord.map(_._1).distinct.length).toLong, ord.length.toLong),
      ("fk_custkey", "orders") ->
        (ord.count(o => !cust.contains(o._2)).toLong, ord.length.toLong))

    val got = Analytics.dqChecks(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === want)
    // the report is ordered and covers each check exactly once
    val names = Analytics.dqChecks(spark, sf).collect().map(r => (r.getString(0), r.getString(1)))
    assert(names.toSeq === names.toSeq.sorted)
  }

  test("customer_value_deciles equals an exact NTILE replay; depths differ by at most one") {
    import org.apache.spark.sql.functions.col
    val perCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100).toLong))
      .groupBy(_._1).view.mapValues(v => (v.map(_._2).sum, v.length.toLong)).toMap
      .toSeq.map { case (ck, (rev, n)) => (rev, ck, n) }
      .sortBy(t => (t._1, t._2)) // the total (rev, custkey) tie order
    val n = perCust.length
    val base = n / 10; val big = n % 10
    def tile(pos: Int): Int =
      (if (pos < big * (base + 1)) pos / (base + 1)
       else big + (pos - big * (base + 1)) / base) + 1
    val want = perCust.zipWithIndex
      .groupBy { case (_, pos) => tile(pos) }.view
      .mapValues { g => (g.length.toLong, g.map(_._1._3).sum, g.map(_._1._1).sum) }
      .toMap
    val got = Analytics.customerValueDeciles(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // equal-depth: tile sizes differ by at most one, all 10 present
    val depths = got.values.map(_._1)
    assert(got.keySet === (1 to 10).toSet)
    assert(depths.max - depths.min <= 1)
    // ascending tiles ⇒ per-customer average revenue is monotone
    val avg = (1 to 10).map(d => got(d)._3.toDouble / got(d)._1)
    assert(avg.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("repeat_purchase equals a JVM replay of the per-segment loyalty counts") {
    import org.apache.spark.sql.functions.col
    val ordersPer = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey")).collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val seg = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = ordersPer.toSeq.groupBy { case (ck, _) => seg(ck) }
    val got = graft.operators.Analytics.repeatPurchase(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet === bySeg.keySet)
    bySeg.foreach { case (sg, cs) =>
      val buyers = cs.length.toLong
      val rep = cs.count(_._2 >= 2L).toLong
      val nOrd = cs.map(_._2).sum
      assert(got(sg) === ((buyers, rep, nOrd,
        rep.toDouble / buyers, nOrd.toDouble / buyers)), sg)
    }
    // conservation: buyers partition the ordering customers
    assert(got.values.map(_._1).sum === ordersPer.size.toLong)
  }

  test("segment_migration equals a JVM replay; cells partition the buyers") {
    import org.apache.spark.sql.functions.col
    val cut = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val per = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate")).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).isBefore(cut)))
      .groupBy(_._1).view.mapValues { os =>
        (os.count(_._2).toLong, os.count(!_._2).toLong)
      }.toMap
    def tier(n: Long) =
      if (n == 0) "none" else if (n <= 2) "low" else if (n <= 5) "mid" else "high"
    val want = per.values.toSeq.map { case (n1, n2) => (tier(n1), tier(n2)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.Analytics.segmentMigration(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.values.sum === per.size.toLong, "cells partition the buyers")
  }
}
