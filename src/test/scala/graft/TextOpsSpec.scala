package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextOps}

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("text stats cover every doc with sane values") {
    val rows = TextOps.textStats(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
  }

  test("lang_id is deterministic and covers every doc") {
    val a = TextOps.langId(spark, sf).collect().map(_.toString).toSeq
    val b = TextOps.langId(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.length === 500)
  }

  test("quality score stays in [0,1]") {
    val rows = TextOps.textQuality(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q")
    }
  }

  test("mm_features histograms are normalized and deterministic") {
    val rows = Multimodal.mmFeatures(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val hist = r.getAs[scala.collection.Seq[Double]]("features")
      assert(hist.length === 16)
      assert(math.abs(hist.sum - 1.0) < 1e-9)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
    }
    val again = Multimodal.mmFeatures(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
