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
  }
}
