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

  test("set_ops partitions are disjoint and consistent") {
    val rows = Relational.setOps(spark, sf).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("k")))
    val byOp = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byOp("in_both").intersect(byOp.getOrElse("only_orders", Set())).isEmpty)
    assert(byOp("in_both").intersect(byOp.getOrElse("only_rich", Set())).isEmpty)
  }
}
