package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CellAssigner, NearestCellId, PqEncodeCodes, PqEncoder}
import graft.functions.VectorFunctions.{dot, l2Norm, toDouble}

/** Bit-identity pins for the r19 allocation-free encode expressions
  * against the r18 literal formulations they replaced (the unrolled
  * struct/array_min plans).  The literal reference is rebuilt here
  * VERBATIM from the r18 source, so any drift in IEEE op order,
  * tie-break, or NaN handling shows as an exact-equality failure on
  * real embedding data — the codes artifacts' cold-bit-identity
  * contracts ride on this.
  */
class PqEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), toDouble(col("embedding")).as("e"))
    .withColumn("nrm", l2Norm(col("e")))
    .filter(col("nrm") > 0)

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(e)
  }
  private def exprOf(c: Column) = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.expression(c)
  }

  /** Deterministic books off the first rows' subvectors, with a
    * DUPLICATED centroid per book so the lowest-cid tie-break is
    * actually exercised on every row that lands there.
    */
  private def mkBooks(m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val rows = vecs.orderBy(col("vec_id")).limit(ksub).collect()
      .map(r => r.getAs[scala.collection.Seq[Double]]("e").toArray)
    val dim = rows(0).length
    val sub = dim / m
    Array.tabulate(m) { j =>
      val base = rows.take(ksub - 1).map(u =>
        java.util.Arrays.copyOfRange(u, j * sub, (j + 1) * sub))
      base :+ base(1).clone() // ksub-1 duplicates cid 1 → cid 1 must win
    }
  }

  // the r18 literal PQ encode, verbatim
  private def literalPqCodes(books: Array[Array[Array[Double]]], sub: Int,
      e: Column, nrm: Column, divByNrm: Boolean): Column =
    array(books.indices.map { j =>
      array_min(array(books(j).zipWithIndex.map { case (c, cid) =>
        val d = dot(slice(e, j * sub + 1, sub), typedLit(c.toSeq))
        val score = (if (divByNrm) d / nrm else d) - lit(0.5 * c.map(x => x * x).sum)
        struct((-score).as("negscore"), lit(cid).as("cid"))
      }: _*)).getField("cid")
    }: _*)

  test("pq_encode is bit-identical to the r18 literal plan (norm variant, with ties)") {
    val books = mkBooks(m = 8, ksub = 17)
    val sub = books(0)(0).length
    val got = vecs.select(col("vec_id"),
      colOf(PqEncodeCodes(exprOf(col("e")), exprOf(col("nrm")),
        new PqEncoder(books, divByNrm = true))).as("codes"),
      literalPqCodes(books, sub, col("e"), col("nrm"), divByNrm = true).as("ref"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Int]]("codes") ===
        r.getAs[scala.collection.Seq[Int]]("ref"), s"vec ${r.get(0)}")
    }
    // the duplicated centroid must never be emitted: its twin (lower
    // cid) wins every tie — proves the tie-break is live, not vacuous
    val maxCode = got.flatMap(_.getAs[scala.collection.Seq[Int]]("codes")).max
    assert(maxCode < 16, "duplicate-centroid cid 16 must lose every tie to cid 1")
  }

  test("pq_encode is bit-identical to the r18 literal plan (residual variant)") {
    val books = mkBooks(m = 8, ksub = 9)
    val sub = books(0)(0).length
    // residual-space input: e/nrm − const, materialized like residualCol
    val r = transform(col("e"), x => x / col("nrm") - lit(0.01))
    val got = vecs.select(
      colOf(PqEncodeCodes(exprOf(r), exprOf(lit(1.0)),
        new PqEncoder(books, divByNrm = false))).as("codes"),
      literalPqCodes(books, sub, r, lit(1.0), divByNrm = false).as("ref"))
      .collect()
    got.foreach { row =>
      assert(row.getAs[scala.collection.Seq[Int]]("codes") ===
        row.getAs[scala.collection.Seq[Int]]("ref"))
    }
  }

  test("nearest_cell is bit-identical to the r18 literal argmax (with ties)") {
    val rows = vecs.orderBy(col("vec_id")).limit(12).collect()
      .map(r => r.getAs[scala.collection.Seq[Double]]("e").toArray)
    val cents = rows :+ rows(2).clone() // cid 12 duplicates cid 2
    val literal = array_min(array(cents.zipWithIndex.map { case (c, cid) =>
      struct((-dot(col("e"), typedLit(c.toSeq))).as("negdot"), lit(cid).as("cid"))
    }: _*)).getField("cid")
    val got = vecs.select(
      colOf(NearestCellId(exprOf(col("e")), new CellAssigner(cents))).as("cid"),
      literal.as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    assert(!got.exists(_.getInt(0) == 12), "duplicate centroid must lose ties to cid 2")
    assert(got.exists(_.getInt(0) == 2), "cid 2 should win somewhere")
  }
}
