package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline
import graft.sources.Tables

/** Oracles for the trained-model operators (quality_lr): the decimal
  * gradient discipline must make training a pure function of the data
  * — independent of partition layout — and the student must actually
  * reproduce its weak-label teacher.
  */
class LearnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("quality_lr training is bit-identical across partition layouts") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val (w3, _) = Pipeline.qualityLrTrain(docs.repartition(3), iters = 8)
    val (w11, _) = Pipeline.qualityLrTrain(docs.repartition(11), iters = 8)
    assert(w3.toSeq === w11.toSeq,
      "decimal gradient sums must make weights layout-independent")
  }

  test("quality_lr loss decreases and the student reproduces the teacher") {
    val (w, losses) = Pipeline.qualityLrTrain(
      Tables.documents(spark, sf).select("doc_id", "text"))
    assert(losses.head > losses.last, s"loss did not improve: ${losses.toSeq}")
    // weak labels are a linear threshold of (a subset of) the features,
    // so a linear student must be able to mimic them well
    val rows = Pipeline.qualityLr(spark, sf).collect()
      .map(r => (r.getInt(1), r.getInt(3)))
    assert(rows.length === 500)
    val acc = rows.count { case (y, pred) => y == pred }.toDouble / rows.length
    assert(acc >= 0.85, s"student/teacher agreement $acc")
    assert(rows.map(_._1).distinct.length === 2, "both classes present in the corpus")
    assert(w.exists(_ != 0.0))
  }

  test("quality_lr gradient agrees with a sequential replica to 1e-9") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again today"),
      (2L, "a b c d!!! ??? ... ;;; ,,, !!!"),
      (3L, "it was the best of times it was the worst of times " * 4),
      (4L, "zzz")).toDF("doc_id", "text")
    val (w, losses) = Pipeline.qualityLrTrain(docs, iters = 5, lr = 1.0)
    // independent replica: collect the feature frame, run plain-double
    // batch GD in doc_id order — decimal vs double only differ below
    // the 1e-15 rounding floor on 4 rows, far under the tolerance
    val f = Pipeline.qualityFeatures(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    val dim = 6
    val wr = new Array[Double](dim)
    val lr2 = new Array[Double](5)
    for (it <- 0 until 5) {
      val g = new Array[Double](dim)
      var loss = 0.0
      f.foreach { case (_, y, x) =>
        val m = x.zip(wr).map { case (a, b) => a * b }.sum
        val p = 1.0 / (1.0 + math.exp(-m))
        loss += -(y * math.log(math.max(p, 1e-12)) +
          (1.0 - y) * math.log(math.max(1.0 - p, 1e-12)))
        var j = 0
        while (j < dim) { g(j) += (p - y) * x(j); j += 1 }
      }
      lr2(it) = loss / f.length
      var j = 0
      while (j < dim) { wr(j) -= 1.0 * g(j) / f.length; j += 1 }
    }
    w.zip(wr).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    losses.zip(lr2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}
