package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKScoredAgg
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `annBruteforce` is the exact baseline: broadcast the (small) query
  * set against the corpus and keep top-k per query.  `annLsh` is the
  * scale path: L random-hyperplane tables × b bits bucket the corpus so
  * a query only scores its bucket cohort — the shuffle is keyed by
  * (table, bucket) and touches a vanishing fraction of the corpus.
  */
object Similarity {

  /** Query set: every 100th vector (deterministic, SF-independent). */
  private def queryVecs(v: DataFrame): DataFrame =
    v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
      // zero vectors have no direction: cosine would be NULL in Spark
      // and NaN in DuckDB — excluded identically on both sides
      .filter(col("nrm") > 0)

  /** Shared top-k tail: map-side combining [[TopKByScore]] aggregator —
    * each partition carries ≤2k candidates per query, only the winners
    * cross the shuffle (a row_number window would shuffle every scored
    * row; at 100 TB that is the difference between shuffling |corpus|×|Q|
    * and |Q|×k).
    */
  private def topKPerQuery(s: SparkSession, scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(TopKScoredAgg.topKScored(col("cos"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).as("rk"), col("t.id").as("vec_id"),
        round(col("t.score"), 6).as("cos6"))
      .orderBy(col("q_id"), col("rk"))

  /** Exact cosine top-10 per query.  The query side is broadcast (tiny
    * by construction), so the corpus is scanned once with no shuffle of
    * corpus rows; the aggregator keeps the top-k map-side.
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val q = queryVecs(v)
    val scored = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(s, scored, 10)
  }

  /** 8 tables × 6-bit random-hyperplane LSH.  Hyperplanes are a fixed
    * seeded pseudo-random matrix compiled into the plan as an array
    * literal (no driver state, no UDF).  Candidates = corpus vectors
    * sharing any (table, bucket) with the query; rank candidates by
    * exact cosine, keep top-10.  Rows-only oracle; the spec measures
    * recall@10 against `annBruteforce`.
    */
  /** Shared random-hyperplane machinery: 8 tables × 6 sign bits from a
    * fixed seeded gaussian matrix compiled into the plan as literals.
    * `hyperplaneBuckets(e)` → `array<struct<tbl,bucket>>` per vector.
    */
  private[operators] val LshTables = 8
  private[operators] val LshBits = 6
  private val lshPlanesCol: Column = {
    val rnd = new scala.util.Random(12345)
    val planes = Seq.fill(LshTables * LshBits)(Seq.fill(64)(rnd.nextGaussian()))
    array(planes.map(p => array(p.map(lit): _*)): _*)
  }

  private[operators] def hyperplaneBuckets(e: Column): Column =
    transform(sequence(lit(0), lit(LshTables - 1)), t =>
      struct(t.as("tbl"),
        aggregate(sequence(lit(0), lit(LshBits - 1)), lit(0L),
          (acc, b) => acc * 2 + when(dot(element_at(lshPlanesCol, t * LshBits + b + 1), e) > 0, 1L).otherwise(0L))
          .as("bucket")))

  private[operators] def normalizedVecs(s: SparkSession, dir: String): DataFrame = vecs(s, dir)

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    def buckets(e: Column): Column = hyperplaneBuckets(e)
    val v = vecs(s, dir)
    val corpus = v.select(col("vec_id"), col("e"), col("nrm"), explode(buckets(col("e"))).as("tb"))
      .select(col("vec_id"), col("e"), col("nrm"), col("tb.tbl"), col("tb.bucket"))
    val q = queryVecs(v)
      .select(col("q_id"), col("qe"), col("qnrm"), explode(buckets(col("qe"))).as("tb"))
      .select(col("q_id"), col("qe"), col("qnrm"), col("tb.tbl"), col("tb.bucket"))
    // dedupe multi-table hits before the exact re-rank
    val scored = corpus.as("c").join(broadcast(q).as("q"),
        col("c.tbl") === col("q.tbl") && col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id"), col("c.vec_id"), col("c.e"), col("c.nrm"), col("q.qe"), col("q.qnrm"))
      .dropDuplicates("q_id", "vec_id")
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(s, scored, 10)
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer splits the
    * corpus into C cells; queries probe only the nprobe nearest cells
    * and re-rank exactly inside them.  Training is 2 deterministic
    * Lloyd iterations (seeds = first C vectors by id); the learned
    * centroids are broadcast model state (C×dim doubles), never the
    * data.  At 100 TB the cell assignment partitions the corpus scan
    * and each query touches nprobe/C of it.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val cells = 16
    val nprobe = 4
    // cache the normalized corpus for the training collects (seed +
    // 2 Lloyd iterations would otherwise re-scan parquet each time);
    // released before returning — the result plan re-derives lazily
    val v = vecs(s, dir).persist()

    def nearestCell(e: Column, cents: Seq[(Int, Seq[Double])]): Column =
      array_min(array(cents.map { case (cid, c) =>
        struct((-dot(e, typedLit(c))).as("negdot"), lit(cid).as("cid"))
      }: _*)).getField("cid")

    // deterministic seeds: the C lowest vec_ids, L2-normalized
    var centroids: Seq[(Int, Seq[Double])] = v.orderBy(col("vec_id")).limit(cells)
      .select(col("e"), col("nrm")).collect().zipWithIndex.map { case (r, i) =>
        val e = r.getSeq[Double](0); val n = r.getDouble(1)
        i -> e.map(_ / n).toSeq
      }.toSeq
    // 2 Lloyd iterations on the unit sphere (spherical k-means)
    for (_ <- 0 until 2) {
      val assigned = v.withColumn("cid", nearestCell(col("e"), centroids))
      val sums = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(sum(col("x")).as("sx"))
        .collect().groupBy(_.getAs[Int]("cid"))
      centroids = centroids.map { case (cid, old) =>
        cid -> sums.get(cid).map { rows =>
          val dims = rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("sx"))
          val n = math.sqrt(dims.map(x => x * x).sum)
          if (n > 0) dims.map(_ / n).toSeq else old
        }.getOrElse(old)
      }
    }

    def probeCells(e: Column): Column =
      slice(transform(array_sort(array(centroids.map { case (cid, c) =>
        struct((-dot(e, typedLit(c))).as("negdot"), lit(cid).as("cid"))
      }: _*)), s => s.getField("cid")), 1, nprobe)

    v.unpersist(blocking = false)
    val corpus = v.withColumn("cid", nearestCell(col("e"), centroids))
    val q = queryVecs(v)
      .withColumn("probe", explode(probeCells(col("qe"))))
    val scored = corpus.join(broadcast(q),
        col("cid") === col("probe") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(s, scored, 10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _))

  def oracleSql: Map[String, String] = Map(
    "ann_bruteforce" ->
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM (SELECT vec_id, e,
        |  sqrt(list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))) AS nrm
        |  FROM v0) WHERE nrm > 0),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm FROM v WHERE vec_id % 100 = 0),
        |scored AS (SELECT q_id, vec_id,
        |  list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |  / (qnrm * nrm) AS cos
        |  FROM v, q WHERE vec_id <> q_id),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM scored)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos6 FROM rk WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin)
}
