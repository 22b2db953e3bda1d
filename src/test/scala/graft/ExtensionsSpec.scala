package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions are callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  size(minhash_sig(array('a','b','c'), 16)) AS mh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  word_shingles(array('a','b','c','d'), 2) AS ws
        |""".stripMargin).head()
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Int]("mh") === 16)
    assert(row.getAs[Double]("dp") === 11.0)
    assert(row.getAs[scala.collection.Seq[String]]("ws") === Seq("a b", "b c", "c d"))
    val row2 = spark.sql(
      """SELECT rolling_hash64('hello world') AS rh,
        |  count_in_set(array('the','cat','sat'), array('the','a','an')) AS cs
        |""".stripMargin).head()
    assert(row2.getAs[Long]("rh") !== 0L)
    assert(row2.getAs[Int]("cs") === 1)
    val row3 = spark.sql(
      """SELECT size(window_hashes(array('a','b','c','d'), 2)) AS wh,
        |  bpe_segment('thin') AS seg,
        |  bpe_token_count(array('the', 'thin')) AS cnt
        |""".stripMargin).head()
    assert(row3.getAs[Int]("wh") === 3)
    assert(row3.getAs[scala.collection.Seq[String]]("seg") === Seq("th", "in"))
    assert(row3.getAs[Long]("cnt") === 3L) // [the] + [th, in]
  }

  test("full SQL surface works over registered views + custom functions") {
    graft.sources.Tables.registerAll(spark, TestSpark.sf)
    val n = spark.sql(
      """SELECT count(DISTINCT simhash64(word_shingles(split(trim(text), '\\s+'), 3))) AS n
        |FROM documents WHERE n_chars > 100""".stripMargin).head().getAs[Long]("n")
    assert(n > 1)
    val agg = spark.sql(
      """SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(agg.length === 3)
  }

  test("space_saving aggregate is callable from SQL and over-estimates truly") {
    import spark.implicits._
    (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map(i => s"t$i"))
      .toDF("term").createOrReplaceTempView("ss_terms")
    val rows = spark.sql(
      """SELECT h.term, h.est, h.err
        |FROM (SELECT explode(space_saving(term, 16, 16)) AS h FROM ss_terms)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val top = rows.sortBy(-_._2).take(2).map(_._1).toSet
    assert(top === Set("a", "b"))
    val a = rows.find(_._1 == "a").get
    assert(a._2 >= 50 && a._2 - a._3 <= 50)
  }

  test("optimizer rule collapses nested normalize_text, including across view/column stages") {
    import org.apache.spark.sql.functions.col
    def normCount(df: org.apache.spark.sql.DataFrame): Int =
      "normalize_text".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).size
    // parquet-backed, NOT a local Seq: ConvertToLocalRelation would
    // constant-fold a literal relation's whole projection away before
    // the count is taken (folding through our expressions is itself
    // working as intended there)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text").as("t"))
    // direct nesting
    val direct = docs.selectExpr("normalize_text(normalize_text(t)) AS n")
    assert(normCount(direct) === 1, direct.queryExecution.optimizedPlan)
    // cross-stage: an ingest-normalized column re-normalized by a
    // downstream consumer — the realistic composition shape
    val staged = docs
      .withColumn("clean", graft.functions.NormalizeText.normalizeText(col("t")))
      .select(graft.functions.NormalizeText.normalizeText(col("clean")).as("n"))
    assert(normCount(staged) === 1, staged.queryExecution.optimizedPlan)
    // and through a SQL view boundary
    docs.createOrReplaceTempView("raw_norm_docs")
    spark.sql("SELECT normalize_text(t) AS clean FROM raw_norm_docs")
      .createOrReplaceTempView("clean_norm_docs")
    val viewed = spark.sql("SELECT normalize_text(clean) AS n FROM clean_norm_docs")
    assert(normCount(viewed) === 1, viewed.queryExecution.optimizedPlan)
    // soundness: collapsed plan produces the identical (idempotent) result
    val once = docs.selectExpr("normalize_text(t) AS n").collect().map(_.getString(0))
    assert(direct.collect().map(_.getString(0)).toSeq === once.toSeq)
    assert(viewed.collect().map(_.getString(0)).toSeq === once.toSeq)
  }
}
