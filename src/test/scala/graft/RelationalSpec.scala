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

  test("set_ops partitions are disjoint and consistent") {
    val rows = Relational.setOps(spark, sf).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("k")))
    val byOp = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byOp("in_both").intersect(byOp.getOrElse("only_orders", Set())).isEmpty)
    assert(byOp("in_both").intersect(byOp.getOrElse("only_rich", Set())).isEmpty)
  }
}
