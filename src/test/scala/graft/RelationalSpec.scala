package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q1 aggregates every flag/status group") {
    val rows = Relational.q1Pricing(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum > 0)
  }

  test("part_return_rate equals the sequential per-brand replay") {
    import org.apache.spark.sql.functions.col
    val brand = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_returnflag")).collect()
      .map(r => (brand(r.getLong(0)), r.getString(1)))
    val want = lines.groupBy(_._1).map { case (b, xs) =>
      val nl = xs.length.toLong
      val nr = xs.count(_._2 == "R").toLong
      (b, nl, nr, nr * 1000000L / nl)
    }.toSeq.sortBy(_._1)
    val got = Relational.partReturnRate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.nonEmpty && got.exists(_._3 > 0), "some brand has returns")
  }

  test("q5 plan broadcasts the dimension tables") {
    val plan = Relational.q5RegionRevenue(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = Relational.q1Pricing(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"no pushed filters in:\n$plan")
  }

  test("top_k returns 20 rows in strict descending order") {
    val prices = Relational.topK(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 20)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("window_rank keeps at most 3 parts per brand") {
    val rows = Relational.windowRank(spark, sf).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand")).values.map(_.length)
    assert(perBrand.forall(_ <= 3))
    assert(rows.forall(_.getAs[Int]("rk") <= 3))
  }

  test("q18 returns only orders whose line quantity sum exceeds 300") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q18LargeOrders(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300.0))
    val want = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("sq"))
      .filter(col("sq") > 300).count()
    assert(rows.length === math.min(want, 100L).toInt)
  }

  test("q13 histogram conserves the customer population") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q13CustDist(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total === graft.sources.Tables.customer(spark, sf).count())
  }

  test("q22 keeps only order-less customers above the positive-balance average") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q22NoOrders(spark, sf).collect()
    assert(rows.nonEmpty)
    val cust = graft.sources.Tables.customer(spark, sf).collect()
    // replicate the query's exact decimal cross-multiplication
    // (bal·n > Σbal) — a float average with an epsilon would disagree
    // at exact-boundary balances
    def dec(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val pos = cust.map(_.getAs[Double]("c_acctbal")).filter(_ > 0.0).map(dec)
    val (s, n) = (pos.sum, pos.length)
    val withOrders = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val want = cust.filter(r => dec(r.getAs[Double]("c_acctbal")) * n > s &&
      !withOrders.contains(r.getAs[Long]("c_custkey")))
    assert(rows.map(_.getAs[Long]("numcust")).sum === want.length)
  }

  test("q6 is a join-free scan-aggregate with every predicate pushed or codegen'd") {
    val df = Relational.q6Forecast(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q6 must not join:\n$plan")
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"))
    val row = df.collect().head
    assert(row.getAs[Long]("n_lines") > 0 && row.getAs[Double]("revenue") > 0.0)
  }

  test("q7 groups match an independent recount of the cross-nation pair join") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q7Volume(spark, sf).collect()
    val pair = Set("NATION_1", "NATION_2")
    rows.foreach { r =>
      val sn = r.getAs[String]("supp_nation"); val cn = r.getAs[String]("cust_nation")
      assert(pair.contains(sn) && pair.contains(cn) && sn != cn)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // independent group-count recount (plain joins, no broadcast hints);
    // the selective pair can be empty at the smallest SF — equality
    // still pins that the operator found every qualifying group
    val t = graft.sources.Tables
    val want = t.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(t.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(t.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(t.nation(spark, sf).select(col("n_nationkey").as("k1"), col("n_name").as("sn")),
        col("s_nationkey") === col("k1"))
      .join(t.nation(spark, sf).select(col("n_nationkey").as("k2"), col("n_name").as("cn")),
        col("c_nationkey") === col("k2"))
      .filter(col("sn").isin("NATION_1", "NATION_2") && col("cn").isin("NATION_1", "NATION_2") &&
        col("sn") =!= col("cn"))
      .groupBy(col("sn"), col("cn"), year(col("l_shipdate"))).count().count()
    assert(rows.length.toLong === want)
  }

  test("q8 market share is a valid per-year fraction") {
    val rows = Relational.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
    }
  }

  test("q12 high+low counts conserve the filtered join cardinality") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q12ShipClass(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val want = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.sources.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total === want)
  }

  test("q11 keeps exactly the parts above the integer cross-multiplied threshold") {
    import org.apache.spark.sql.functions._
    val pairs = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n3 = graft.sources.Tables.supplier(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val vals = pairs.filter(p => n3.contains(p._2))
      .groupBy(_._1).view.mapValues(_.map { case (p, su) =>
        ((p * 37 + su * 17) % 9999 + 1) * ((p * 7 + su * 11) % 99999 + 100)
      }.sum).toMap
    val total = vals.values.sum
    val want = vals.filter(_._2 * 10000 > total)
    val got = Relational.q11Stock(spark, sf).collect()
      .map(r => r.getAs[Long]("ps_partkey") -> r.getAs[Double]("value")).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, cents) => assert(got(k) === cents.toDouble / 100.0) }
  }

  test("q20 finds exactly the excess-stock promo suppliers (local replay)") {
    import org.apache.spark.sql.functions._
    val red = graft.sources.Tables.part(spark, sf).filter(col("p_name").like("red%"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val shipped = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity")).collect()
      .filter(r => red.contains(r.getLong(0)))
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(r => BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    val pairs = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val excess = pairs.filter { case (p, su) =>
      red.contains(p) && shipped.get((p, su)).exists { q =>
        BigDecimal(((p * 37 + su * 17) % 9999 + 1) * 2) > q
      }
    }.map(_._2).toSet
    val want = graft.sources.Tables.supplier(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf).filter(col("n_name") === "NATION_1"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name")).collect()
      .filter(r => excess.contains(r.getLong(0))).map(_.getString(1)).sorted.toSeq
    val got = Relational.q20Promo(spark, sf).collect()
      .map(_.getAs[String]("s_name")).toSeq
    assert(got === want)
  }

  test("set_ops partitions are disjoint and consistent") {
    val rows = Relational.setOps(spark, sf).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("k")))
    val byOp = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byOp("in_both").intersect(byOp.getOrElse("only_orders", Set())).isEmpty)
    assert(byOp("in_both").intersect(byOp.getOrElse("only_rich", Set())).isEmpty)
  }

  test("ship_lag_hist equals a JVM replay of the epoch-day lag histogram") {
    import org.apache.spark.sql.functions.col
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        graft.functions.TimeFunctions.epochSec(col("o_orderdate")).as("s"))
      .collect().map(r => r.getLong(0) -> Math.floorDiv(r.getLong(1), 86400L)).toMap
    val lags = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"),
        graft.functions.TimeFunctions.epochSec(col("l_shipdate")).as("s"))
      .collect().map(r => Math.floorDiv(r.getLong(1), 86400L) - ord(r.getLong(0)))
    val want = lags.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = lags.length.toLong
    val got = graft.operators.Relational.shipLagHist(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (lag, n) =>
      assert(got(lag) === ((n, n * 1000000L / total)), s"lag $lag")
    }
    assert(got.values.map(_._1).sum === total, "every line lands in exactly one bucket")
  }

  test("revenue_bridge: effects decompose the YoY delta; nations conserve the window's revenue") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Relational.revenueBridge(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rev1, rev2) = (r.getDouble(1), r.getDouble(2))
      val (q1, q2) = (r.getDouble(3), r.getDouble(4))
      val (dr, pe, ve) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(q1 > 0 && q2 > 0, r.getString(0))
      assert(dr === rev2 - rev1, r.getString(0))
      // the bridge identity (p2−p1)·v2 + p1·(v2−v1) = rev2 − rev1 holds
      // in real arithmetic; IEEE evaluation leaves rounding residue only
      assert(math.abs(pe + ve - dr) <=
        1e-9 * math.max(math.abs(rev1), math.abs(rev2)), r.getString(0))
    }
    // conservation: per-nation window revenue sums to the window total
    // (every supplier has a nation) — double-lane recomputation, tolerant
    val tot = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .collect()(0).getDouble(0)
    val bridged = got.map(r => r.getDouble(1) + r.getDouble(2)).sum
    assert(math.abs(bridged - tot) <= 1e-6 * tot,
      s"nations carry the window total: $bridged vs $tot")
  }
}
