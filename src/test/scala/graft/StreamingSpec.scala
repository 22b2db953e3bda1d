package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.streaming._

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Physical schema of events.parquet (ts is int64 nanos on disk). */
  private val eventsRaw = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The file stream source needs a directory — stage the single
    * parquet file into a temp dir (read-only testdata stays untouched).
    */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-events")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def toMsg(df: DataFrame): DataFrame =
    df.select(
      col("event_id").cast("string").as("msg_id"),
      col("user_id").cast("string").as("key"),
      encode(col("props"), "UTF-8").as("payload"),
      concat(lit("events."), col("event_type")).as("dest"),
      TestSpark.eventsTs.as("ts"))

  test("frizzle pipeline routes valid vs dead-letter with checkpointed acks") {
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val source = FileMsgSource(eventsDir, eventsRaw, toMsg)
    val k = regexp_extract(col("payload").cast("string"), "\"k\": (-?\\d+)", 1).cast("long")
    val route = Frizzle.Route(df => df.withColumn("k", k), isValid = !(col("k") % 13 === 0))
    val q = Frizzle.run(spark, source, route,
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    val expectedDlq = EventOps.msgIngest(spark, sf).count() -
      graft.sources.Tables.events(spark, sf)
        .filter(!(regexp_extract(col("props"), "\"k\": (-?\\d+)", 1).cast("long") % 13 === 0))
        .count()
    assert(sink.get("main") + sink.get("dlq") === 1000L)
    assert(sink.get("dlq") === expectedDlq)
  }

  test("avro payloads decode IN-FLIGHT inside a routed pipeline; routing keys off decoded fields") {
    // the full consume story composed end-to-end: producer side packs
    // each message's payload as single-record Avro binary, the route
    // transform decodes it mid-stream, and BOTH the validity gate and
    // the destination come from DECODED fields — nothing downstream
    // ever sees the wire bytes
    import graft.sources.AvroCodec
    val sch = """{"type":"record","name":"Ev","fields":[
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"}]}""".stripMargin
    val ckpt = Files.createTempDirectory("graft-ckpt-avro").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def toAvroMsg(df: DataFrame): DataFrame = AvroCodec.toAvro(
      df.select(col("event_id").cast("string").as("msg_id"),
        TestSpark.eventsTs.as("ts"),
        col("event_type"), col("value")),
      sch, keep = Seq("msg_id", "ts"))
    val source = FileMsgSource(eventsDir, eventsRaw, toAvroMsg)
    val route = Frizzle.Route(
      df => AvroCodec.fromAvro(df, sch, "avro_payload", keep = Seq("msg_id", "ts"))
        .withColumn("dest", concat(lit("events."), col("event_type"))),
      isValid = col("value") >= 1.0)
    val q = Frizzle.runRouted(spark, source, route, dest = col("dest"),
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.filter(col("value") >= 1.0)
      .groupBy(concat(lit("events."), col("event_type")).as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (d, n) => assert(sink.get(d) === n, s"dest $d") }
    assert(sink.get("dlq") === ev.filter(col("value") < 1.0).count())
  }

  test("json payloads decode IN-FLIGHT; undecodable payloads route to dlq") {
    // the JSON twin of the Avro consume story (and the streaming image
    // of EventOps.msgDecodeJson): producer packs each payload as JSON
    // text with ~1% garbled in flight, the route transform decodes via
    // from_json against an explicit schema, and validity/destination
    // key off DECODED fields — undecodable rows coalesce to invalid
    // and land in the dlq without a second pass
    val ckpt = Files.createTempDirectory("graft-ckpt-json").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val jsch = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def toJsonMsg(df: DataFrame): DataFrame =
      df.select(col("event_id").cast("string").as("msg_id"),
          TestSpark.eventsTs.as("ts"),
          when(col("event_id") % 97 === 0,
            concat(lit("corrupt :"), to_json(struct(col("event_type"), col("value")))))
            .otherwise(to_json(struct(col("event_type"), col("value"))))
            .as("json_payload"))
    val source = FileMsgSource(eventsDir, eventsRaw, toJsonMsg)
    val route = Frizzle.Route(
      df => df.withColumn("m", from_json(col("json_payload"), jsch))
        .select(col("msg_id"), col("ts"),
          col("m.event_type").as("event_type"), col("m.value").as("value"))
        .withColumn("dest", concat(lit("events."), col("event_type"))),
      isValid = col("value") >= 1.0)
    val q = Frizzle.runRouted(spark, source, route, dest = col("dest"),
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    val ev = graft.sources.Tables.events(spark, sf)
    val clean = ev.filter(col("event_id") % 97 =!= 0)
    val expected = clean.filter(col("value") >= 1.0)
      .groupBy(concat(lit("events."), col("event_type")).as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (d, n) => assert(sink.get(d) === n, s"dest $d") }
    // dlq = every garbled payload (decode gave null value) + every
    // decodable row failing the business gate
    val nCorrupt = ev.filter(col("event_id") % 97 === 0).count()
    assert(nCorrupt > 0L, "fixture must exercise the corrupt branch")
    assert(sink.get("dlq") === nCorrupt + clean.filter(col("value") < 1.0).count())
  }

  test("proto payloads decode IN-FLIGHT; boundary-torn payloads pass decode and only the SEMANTIC gate catches them") {
    // the proto twin of the Avro/JSON consume stories (and the
    // streaming image of EventOps.msgDecodeProto): ~1% of payloads are
    // torn at a field boundary in flight.  Unlike JSON (decode fails →
    // null-keyed dlq) the torn proto rows DECODE CLEANLY with value at
    // its 0.0 default — so the dlq catch is the business-validity gate
    // on the decoded value, the only detection proto3 leaves you
    import graft.sources.ProtoCodec
    val psch = "1:event_type:string,2:value:double"
    val ckpt = Files.createTempDirectory("graft-ckpt-proto").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def toProtoMsg(df: DataFrame): DataFrame = {
      val base = df.select(col("event_id").cast("string").as("msg_id"),
        TestSpark.eventsTs.as("ts"), col("event_id").as("wire_id"),
        col("event_type"), col("value"))
      ProtoCodec.toProto(base, psch, keep = Seq("msg_id", "ts", "wire_id"),
          markAfterField = 1)
        .withColumn("proto_payload",
          when(col("wire_id") % 97 === 0,
            expr("substring(proto_payload, 1, wire_mark)"))
            .otherwise(col("proto_payload")))
        .drop("wire_id", "wire_mark")
    }
    val source = FileMsgSource(eventsDir, eventsRaw, toProtoMsg)
    val route = Frizzle.Route(
      df => ProtoCodec.fromProto(df, psch, keep = Seq("msg_id", "ts"))
        .withColumn("dest", concat(lit("events."), col("event_type"))),
      isValid = col("value") >= 1.0)
    val q = Frizzle.runRouted(spark, source, route, dest = col("dest"),
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    val ev = graft.sources.Tables.events(spark, sf)
    val clean = ev.filter(col("event_id") % 97 =!= 0)
    val expected = clean.filter(col("value") >= 1.0)
      .groupBy(concat(lit("events."), col("event_type")).as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (d, n) => assert(sink.get(d) === n, s"dest $d") }
    // EVERY torn row lands in dlq via the gate (decoded value 0.0),
    // plus the decodable rows that legitimately fail it
    val nCorrupt = ev.filter(col("event_id") % 97 === 0).count()
    assert(nCorrupt > 0L, "fixture must exercise the torn branch")
    assert(sink.get("dlq") === nCorrupt + clean.filter(col("value") < 1.0).count())
  }

  test("corpus maintenance stream: per-epoch appends delta-maintain the pair substrate, stream-final ≡ batch-full") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seed corpus: an exact pair (1,2) and a doc that will pair
    // cross-epoch (3) — the MaterializeSpec fixture shape
    val corpus = Files.createTempDirectory("graft-maintain-corpus").toString
    Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon"),
        (3L, "one two three four five six"))
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$corpus/documents.parquet")
    val cache = Files.createTempDirectory("graft-maintain-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("neardup_pairs")
      // base build BEFORE the stream starts — the crawl maintains an
      // existing corpus
      graft.operators.Dedup.nearDupPairs(spark, corpus).count()
      val mem = MemoryStream[(Long, String)]
      val src = mem.toDF().toDF("doc_id", "text")
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val perEpochPairs = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val ckpt = Files.createTempDirectory("graft-maintain-ckpt").toString
      val q = CorpusMaintain.maintainNearDup(spark, corpus, src, ckpt,
        (pairs, e) => { perEpochPairs.put(e, pairs.count()); epochs.add(e); () })
      // epoch 1: doc 201 = a copy of doc 3 -> new cross-epoch pair
      mem.addData((201L, "one two three four five six")); q.processAllAvailable()
      // epoch 2: a delta-internal pair
      mem.addData((202L, "omega psi chi phi upsilon"),
        (203L, "omega psi chi phi upsilon")); q.processAllAvailable()
      q.stop()
      assert(epochs.size === 2, s"expected 2 maintenance epochs, saw $epochs")
      assert(graft.sources.Materialize.deltaBuildCount("neardup_pairs") === 2,
        "each micro-batch append must take the delta path against the base")
      // the pair count grew across epochs as appends landed
      val counts = epochs.toArray(Array.empty[java.lang.Long]).map(e => perEpochPairs.get(e: Long))
      assert(counts.max > counts.min, s"pair graph must grow across epochs: ${counts.toSeq}")
      // stream-final ≡ batch-full: the artifact the stream left behind
      // is value-identical to a from-scratch rebuild of the final corpus
      def pairsOf(cacheDir: String) = {
        spark.conf.set("spark.graft.cache.dir", cacheDir)
        graft.operators.Dedup.nearDupPairs(spark, corpus)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(t => (t._1, t._2))
      }
      val streamed = pairsOf(cache)
      val batchFull = pairsOf(Files.createTempDirectory("graft-maintain-cache2").toString)
      assert(streamed === batchFull)
      val ids = streamed.map(t => (t._1, t._2))
      assert(ids.contains((3L, 201L)), "cross-epoch pair present")
      assert(ids.contains((202L, 203L)), "delta-internal pair present")
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("co-purchase maintenance: streamed order lines keep the basket graph live, stream-final equals batch-full") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-maintain-cop").toString
    Seq((10L, 1L), (10L, 2L), (20L, 4L), (20L, 5L))
      .toDF("l_orderkey", "l_partkey").repartition(1)
      .write.parquet(s"$corpus/lineitem.parquet")
    val cache = Files.createTempDirectory("graft-maintain-cop-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("copurchase_pairs")
      // base build BEFORE the stream starts — the stream maintains an
      // existing basket graph
      graft.operators.GraphOps.coPurchasePairs(spark, corpus).count()
      val mem = MemoryStream[(Long, Long)]
      val src = mem.toDF().toDF("l_orderkey", "l_partkey")
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val perEpoch = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val ckpt = Files.createTempDirectory("graft-maintain-cop-ckpt").toString
      val q = CorpusMaintain.maintainCoPurchase(spark, corpus, src, ckpt,
        (pairs, e) => { perEpoch.put(e, pairs.count()); epochs.add(e); () })
      // epoch 1: item 3 joins EXISTING order 10 → cross pairs (1,3),(2,3)
      mem.addData((10L, 3L)); q.processAllAvailable()
      // epoch 2: new order 30 repeats the base pair (4,5) — count
      // merges to 2 — and adds item 9 → new pairs (4,9),(5,9)
      mem.addData((30L, 4L), (30L, 5L), (30L, 9L)); q.processAllAvailable()
      q.stop()
      assert(epochs.size === 2, s"expected 2 maintenance epochs, saw $epochs")
      assert(graft.sources.Materialize.deltaBuildCount("copurchase_pairs") === 2,
        "each micro-batch append must take the copurchase delta path")
      val counts = epochs.toArray(Array.empty[java.lang.Long]).map(e => perEpoch.get(e: Long))
      assert(counts.max > counts.min, s"pair support must grow across epochs: ${counts.toSeq}")
      def pairsOf(cacheDir: String) = {
        spark.conf.set("spark.graft.cache.dir", cacheDir)
        graft.operators.GraphOps.coPurchasePairs(spark, corpus).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).sortBy(_._1)
      }
      val streamed = pairsOf(cache)
      val batchFull = pairsOf(Files.createTempDirectory("graft-maintain-cop-cache2").toString)
      assert(streamed === batchFull,
        "the artifact the stream leaves behind must equal a from-scratch rebuild")
      val m = streamed.toMap
      assert(m((1L, 3L)) === 1L && m((2L, 3L)) === 1L,
        "an item streamed onto an existing order must form cross pairs")
      assert(m((4L, 5L)) === 2L,
        "a base pair repeated by a streamed order must merge to support 2")
      assert(m((4L, 9L)) === 1L && m((5L, 9L)) === 1L)
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("copurchase takedown: retracting an ingested epoch delete-maintains the pair graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-cop-takedown").toString
    Seq((10L, 1L), (10L, 2L), (20L, 4L), (20L, 5L))
      .toDF("l_orderkey", "l_partkey").repartition(1)
      .write.parquet(s"$corpus/lineitem.parquet")
    val cache = Files.createTempDirectory("graft-cop-takedown-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("copurchase_pairs")
      graft.operators.GraphOps.coPurchasePairs(spark, corpus).count()
      val mem = MemoryStream[(Long, Long)]
      val src = mem.toDF().toDF("l_orderkey", "l_partkey")
      val ckpt = Files.createTempDirectory("graft-cop-takedown-ckpt").toString
      val q = CorpusMaintain.maintainCoPurchase(spark, corpus, src, ckpt)
      // epoch 0 (the one to retract): item 3 joins EXISTING order 10,
      // and a wholly-new order 77 contributes (8,9)
      mem.addData((10L, 3L), (77L, 8L), (77L, 9L)); q.processAllAvailable()
      // epoch 1: unrelated survivor order — so the post-takedown
      // snapshot (base + epoch 1) matches NO prior artifact and the
      // delete path, not a cache hit, must produce it
      mem.addData((88L, 5L), (88L, 6L)); q.processAllAvailable()
      q.stop()
      // retention reap: keep only the newest pair artifact (with the
      // full chain retained the takedown would resolve as a cheaper
      // append over the base prefix — the knn takedown discipline);
      // cop_lines chunks stay, they ARE the delete algebra's memory
      // of the removed files' lines
      val arts = new java.io.File(cache).listFiles()
        .filter(_.getName.startsWith("copurchase_pairs-")).sortBy(_.lastModified)
      arts.dropRight(1).foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
      val removed = CorpusMaintain.takedownEpoch(corpus, "lineitem.parquet", 0L)
      assert(removed >= 1, "the takedown must remove the epoch's files")
      def pairsOf() = graft.operators.GraphOps.coPurchasePairs(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).sortBy(_._1)
      val after = pairsOf()
      assert(graft.sources.Materialize.deleteBuildCount("copurchase_pairs") === 1,
        "the retraction must take the delete-maintenance path, not a full rebuild")
      val m = after.toMap
      assert(!m.contains((1L, 3L)) && !m.contains((2L, 3L)),
        "the retracted item's cross pairs must vanish")
      assert(!m.contains((8L, 9L)), "the retracted order's pairs must vanish")
      assert(m((5L, 6L)) === 1L, "epoch 1's survivor order keeps its pair")
      assert(m((4L, 5L)) === 1L, "base pairs untouched")
      // batch-over-survivors identity
      spark.conf.set("spark.graft.cache.dir",
        Files.createTempDirectory("graft-cop-takedown-cache2").toString)
      assert(after === pairsOf(),
        "takedown-maintained pairs must equal the batch build over the survivors")
      // a replayed takedown is a no-op (idempotent retraction)
      assert(CorpusMaintain.takedownEpoch(corpus, "lineitem.parquet", 0L) === 0)
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("knn maintenance: streamed embeddings keep the edge graph live, stream-final equals batch-full") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-maintain-knn").toString
    val rnd = new scala.util.Random(777)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 200L).map(i => (i, vec()))
    base.toDF("vec_id", "embedding").repartition(2)
      .write.parquet(s"$corpus/embeddings.parquet")
    val cache = Files.createTempDirectory("graft-maintain-knn-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("knn_edges")
      // base build BEFORE the stream starts — ingest maintains an
      // existing ANN corpus
      graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count()
      val mem = MemoryStream[(Long, Array[Double])]
      val src = mem.toDF().toDF("vec_id", "embedding")
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val ckpt = Files.createTempDirectory("graft-maintain-knn-ckpt").toString
      val q = CorpusMaintain.maintainKnn(spark, corpus, src, ckpt,
        (edges, e) => { edges.count(); epochs.add(e); () })
      // epoch 1: an exact copy of vec 7 — must enter 7's top-5 at
      // cos = 1, so lid 7 is provably recomputed by the delta
      mem.addData((9001L, base(6)._2)); q.processAllAvailable()
      // epoch 2: fresh vectors, new lids only
      mem.addData((9002L, vec()), (9003L, vec())); q.processAllAvailable()
      q.stop()
      assert(epochs.size === 2, s"expected 2 maintenance epochs, saw $epochs")
      assert(graft.sources.Materialize.deltaBuildCount("knn_edges") === 2,
        "each micro-batch append must take the kNN delta path")
      def edgesOf(cacheDir: String) = {
        spark.conf.set("spark.graft.cache.dir", cacheDir)
        graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
          .sortBy(t => (t._1, t._2))
      }
      val streamed = edgesOf(cache)
      val batchFull = edgesOf(
        Files.createTempDirectory("graft-maintain-knn-cache2").toString)
      assert(streamed === batchFull,
        "the artifact the stream leaves behind must equal a from-scratch rebuild")
      assert(streamed.filter(_._1 == 7L).take(1).map(t => (t._3, t._4)).toSeq
        === Seq((9001L, 1.0)), "the streamed exact-dup must displace 7's top-1")
      assert(streamed.exists(_._1 == 9001L), "streamed lids get their own edges")
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("ann index maintenance: streamed embeddings append-encode the annix tier, model carried, codes equal appendToIndex") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val S = graft.operators.Similarity
    val corpus = Files.createTempDirectory("graft-maintain-annix").toString
    val rnd = new scala.util.Random(4242)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 240L).map(i => (i, vec()))
    val b1 = (9001L to 9020L).map(i => (i, vec()))
    val b2 = (9101L to 9120L).map(i => (i, vec()))
    base.toDF("vec_id", "embedding").repartition(2)
      .write.parquet(s"$corpus/embeddings.parquet")
    val cache = Files.createTempDirectory("graft-maintain-annix-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("annix_model_ivfpq")
      graft.sources.Materialize.resetBuildCount("annix_codes_ivfpq")
      // base index built BEFORE the stream starts — ingest maintains
      // an existing serving index, it does not cold-build per epoch
      val (c0, books0, cents0, _) = S.annIndexed(spark, corpus, "ivfpq")
      c0.count()
      val mem = MemoryStream[(Long, Array[Double])]
      val src = mem.toDF().toDF("vec_id", "embedding")
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val ckpt = Files.createTempDirectory("graft-maintain-annix-ckpt").toString
      val q = CorpusMaintain.maintainAnnIndex(spark, corpus, src, ckpt, "ivfpq",
        (codes, e) => { codes.count(); epochs.add(e); () })
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()
      assert(epochs.size === 2, s"expected 2 maintenance epochs, saw $epochs")
      assert(graft.sources.Materialize.deltaBuildCount("annix_model_ivfpq") === 2,
        "the model must CARRY per epoch, never retrain")
      assert(graft.sources.Materialize.deltaBuildCount("annix_codes_ivfpq") === 2,
        "codes must encode the batch per epoch, never re-encode the corpus")
      // stream-final: model bit-identical to the base-trained one …
      val (cf, booksF, centsF, _) = S.annIndexed(spark, corpus, "ivfpq")
      assert(booksF.map(_.map(_.toSeq).toSeq).toSeq
        === books0.map(_.map(_.toSeq).toSeq).toSeq, "carried codebooks")
      assert(centsF.map(_.map(_.toSeq).toSeq) === cents0.map(_.map(_.toSeq).toSeq),
        "carried coarse centroids")
      // … and codes ≡ the PUBLIC appendToIndex algebra applied per epoch
      val got = cf.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
      val expected = S.appendToIndex(S.appendToIndex(
          S.buildIvfPqIndex(base.toDF("vec_id", "embedding")),
          b1.toDF("vec_id", "embedding")),
          b2.toDF("vec_id", "embedding")).codes
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("takedown: removing an ingested epoch delete-maintains the substrate, batch-over-survivors identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-takedown").toString
    val rnd = new scala.util.Random(4711)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 200L).map(i => (i, vec()))
    base.toDF("vec_id", "embedding").repartition(2)
      .write.parquet(s"$corpus/embeddings.parquet")
    val cache = Files.createTempDirectory("graft-takedown-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    try {
      graft.sources.Materialize.resetBuildCount("knn_edges")
      graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count()
      val mem = MemoryStream[(Long, Array[Double])]
      val src = mem.toDF().toDF("vec_id", "embedding")
      val ckpt = Files.createTempDirectory("graft-takedown-ckpt").toString
      val q = CorpusMaintain.maintainKnn(spark, corpus, src, ckpt)
      // epoch 0 plants an exact copy of vec 7 (displaces 7's top-1) —
      // the retraction must restore the original neighbor
      mem.addData((9001L, base(6)._2), (9002L, vec())); q.processAllAvailable()
      // epoch 1: unrelated survivors — so the post-takedown snapshot
      // (base + epoch 1) matches NO prior artifact and the delete
      // path, not a cache hit, must produce it
      mem.addData((9901L, vec()), (9902L, vec())); q.processAllAvailable()
      q.stop()
      val displaced = graft.operators.Similarity.knnJoinEmbeddings(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(displaced.filter(_._1 == 7L).take(1).map(_._3).toSeq === Seq(9001L))
      // artifact retention: a real cache TTL reaps superseded
      // snapshots' artifacts — keep only the newest (base+e0+e1).
      // (With the FULL chain retained, this takedown would resolve
      // even cheaper, as an append over the old base-prefix artifact
      // — the maintenance detection prefers the cheapest valid prior;
      // reaping makes the DELETE path the one under test.)
      val arts = new java.io.File(cache).listFiles()
        .filter(_.getName.startsWith("knn_edges-")).sortBy(_.lastModified)
      arts.dropRight(1).foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
      // GDPR retraction of everything epoch 0 ingested
      val removed = CorpusMaintain.takedownEpoch(corpus, "embeddings.parquet", 0L)
      assert(removed >= 1, "the takedown must remove the epoch's files")
      val after = graft.operators.Similarity.knnJoinEmbeddings(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(graft.sources.Materialize.deleteBuildCount("knn_edges") === 1,
        "the retraction must take the delete-maintenance path, not a full rebuild")
      assert(after.forall(t => t._3 != 9001L && t._3 != 9002L && t._1 != 9001L && t._1 != 9002L),
        "no retracted id may survive on either side of an edge")
      assert(after.exists(_._1 == 9901L), "epoch 1's survivors keep their edges")
      // batch-over-survivors identity: the maintained artifact must
      // equal a fresh rebuild of the surviving corpus
      spark.conf.set("spark.graft.cache.dir",
        Files.createTempDirectory("graft-takedown-cache2").toString)
      val fresh = graft.operators.Similarity.knnJoinEmbeddings(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(after === fresh,
        "takedown-maintained edges must equal the batch build over the survivors")
      // a replayed takedown is a no-op (idempotent retraction)
      assert(CorpusMaintain.takedownEpoch(corpus, "embeddings.parquet", 0L) === 0)
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("takedown purge: after the delete-maintained refresh, no retained artifact references a removed file") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-takedown-purge").toString
    val rnd = new scala.util.Random(6161)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = (1L to 200L).map(i => (i, vec()))
    base.toDF("vec_id", "embedding").repartition(2)
      .write.parquet(s"$corpus/embeddings.parquet")
    val cache = Files.createTempDirectory("graft-takedown-purge-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    def manifestsReferencing(needle: String): Seq[String] =
      new java.io.File(cache).listFiles().filter(_.isDirectory).filter { d =>
        val mf = new java.io.File(d, "_MANIFEST")
        mf.exists() &&
          new String(java.nio.file.Files.readAllBytes(mf.toPath)).contains(needle)
      }.map(_.getName).toSeq
    try {
      graft.sources.Materialize.resetBuildCount("knn_edges")
      graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count()
      // epoch 0 (the retraction target) and epoch 1 (survivors), both
      // delta-maintained — the epoch-0 snapshot's artifacts embed the
      // removed vectors' derived edges, which is what the purge must
      // remove from DISK
      CorpusMaintain.appendEpoch(
        Seq((9001L, base(6)._2), (9002L, vec())).toDF("vec_id", "embedding"),
        s"$corpus/embeddings.parquet", 0L)
      graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count()
      CorpusMaintain.appendEpoch(
        Seq((9901L, vec()), (9902L, vec())).toDF("vec_id", "embedding"),
        s"$corpus/embeddings.parquet", 1L)
      graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count()
      assert(manifestsReferencing("part-epoch0-").nonEmpty,
        "pre-purge, the epoch-0 snapshots' artifacts are retained")
      // retention reap (keep newest) so the refresh exercises the
      // DELETE path, not the emergent cheapest-prior cache hit
      val arts = new java.io.File(cache).listFiles()
        .filter(_.getName.startsWith("knn_edges-")).sortBy(_.lastModified)
      arts.dropRight(1).foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
      val (removed, purged) = CorpusMaintain.takedownEpochPurge(
        spark, corpus, "embeddings.parquet", 0L) {
        graft.operators.Similarity.knnJoinEmbeddings(spark, corpus).count(); ()
      }
      assert(removed >= 1)
      assert(graft.sources.Materialize.deleteBuildCount("knn_edges") === 1,
        "the sequenced refresh must run BEFORE the purge, off the retained prior")
      assert(purged.nonEmpty, "the pre-takedown artifact must be purged")
      assert(manifestsReferencing("part-epoch0-").isEmpty,
        "post-purge, NO retained artifact's manifest may reference a removed file")
      // the refreshed survivor artifact is untouched: the next read is
      // a pure cache hit and equals a from-scratch rebuild
      val buildsBefore = graft.sources.Materialize.buildCount("knn_edges")
      val served = graft.operators.Similarity.knnJoinEmbeddings(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(graft.sources.Materialize.buildCount("knn_edges") === buildsBefore,
        "the purge must not touch the surviving snapshot's artifact")
      assert(served.forall(t => t._1 < 9000L || t._1 >= 9900L),
        "no retracted id may survive")
      spark.conf.set("spark.graft.cache.dir",
        Files.createTempDirectory("graft-takedown-purge-cache2").toString)
      val fresh = graft.operators.Similarity.knnJoinEmbeddings(spark, corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(served === fresh)
      // idempotent replay: nothing left to remove, nothing to purge
      spark.conf.set("spark.graft.cache.dir", cache)
      val (r2, p2) = CorpusMaintain.takedownEpochPurge(
        spark, corpus, "embeddings.parquet", 0L) { fail("refresh must not run on a no-op replay") }
      assert(r2 === 0 && p2.isEmpty)
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("flag-leaf maintenance stream: epoch appends delta-maintain the funnel; a base takedown rides the delete builder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("graft-flags-stream").toString
    // seed corpus in TWO files: the removable one carries the fp-group
    // k1 winner (6) and even doc 2's only odd witness (7) — its later
    // takedown must re-elect AND flip decon, with the streamed epochs
    // retained on disk (the relaxed removed⊆base delete shape)
    Seq((2L, "alpha beta gamma delta epsilon zeta", "a"),
        (10L, "dup one text x1 x2 x3", "a"),
        (12L, "dup one text x1 x2 x3", "a"))
      .toDF("doc_id", "text", "source").repartition(1)
      .write.parquet(s"$corpus/documents.parquet")
    val stage = Files.createTempDirectory("graft-flags-stream-s").toString + "/p"
    Seq((6L, "dup one text x1 x2 x3", "a"),
        (7L, "alpha beta gamma delta epsilon seven", "b"))
      .toDF("doc_id", "text", "source").repartition(1).write.parquet(stage)
    new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-"))
      .foreach { f =>
        val to = new java.io.File(s"$corpus/documents.parquet", s"part-seedb-${f.getName.stripPrefix("part-")}")
        assert(f.renameTo(to))
      }
    val cache = Files.createTempDirectory("graft-flags-stream-cache").toString
    spark.conf.set("spark.graft.cache.dir", cache)
    spark.conf.set("spark.graft.delta.maxAppendFraction", "100")
    def flagsNow() = graft.operators.Pipeline.curationFlags(spark, corpus)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("decon"),
        r.getAs[Boolean]("k1"), r.getAs[Boolean]("k2"), r.getAs[Long]("comp")))
      .sortBy(_._1)
    try {
      graft.sources.Materialize.resetBuildCount("curation_flags")
      val base = flagsNow().map(t => t._1 -> t).toMap
      assert(base(6L)._3 === true && base(10L)._3 === false, "seed k1: 6 wins")
      assert(base(2L)._2 === true, "seed decon(2): odd 7 is the witness")
      val mem = MemoryStream[(Long, String, String)]
      val src = mem.toDF().toDF("doc_id", "text", "source")
      val ckpt = Files.createTempDirectory("graft-flags-stream-ckpt").toString
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = CorpusMaintain.maintainFlags(spark, corpus, src, ckpt,
        (_, e) => { epochs.add(e); () })
      // epoch: 8 contests the fp group (6 still wins); epoch 2: fresh doc
      mem.addData((8L, "dup one text x1 x2 x3", "a")); q.processAllAvailable()
      mem.addData((30L, "fresh six seven eight nine ten", "a")); q.processAllAvailable()
      q.stop()
      assert(epochs.size === 2)
      assert(graft.sources.Materialize.deltaBuildCount("curation_flags") === 2,
        "each micro-batch append must take the flag delta path")
      // stream-final ≡ batch-full
      val streamed = flagsNow()
      spark.conf.set("spark.graft.cache.dir",
        Files.createTempDirectory("graft-flags-stream-c2").toString)
      val batchFull = flagsNow()
      spark.conf.set("spark.graft.cache.dir", cache)
      assert(streamed === batchFull, "stream-final flags must equal a batch full build")
      // GDPR takedown of the removable SEED file, streamed epochs
      // retained — the round-17 delete builder, not a cache hit
      new java.io.File(s"$corpus/documents.parquet").listFiles()
        .filter(_.getName.startsWith("part-seedb-")).foreach(f => assert(f.delete()))
      val after = flagsNow().map(t => t._1 -> t).toMap
      assert(graft.sources.Materialize.deleteBuildCount("curation_flags") === 1,
        "the base-file takedown must run the flag delete builder")
      assert(!after.contains(6L) && !after.contains(7L))
      assert(after(8L)._3 === true && after(10L)._3 === false,
        "k1 inheritance: the streamed 8 takes the election 6 vacated")
      assert(after(2L)._2 === false, "decon(2) flips: its only witness left with the takedown")
      spark.conf.set("spark.graft.cache.dir",
        Files.createTempDirectory("graft-flags-stream-c3").toString)
      val afterFull = flagsNow().map(t => t._1 -> t).toMap
      assert(after === afterFull, "post-takedown flags must equal a batch full build on survivors")
    } finally {
      spark.conf.unset("spark.graft.cache.dir")
      spark.conf.unset("spark.graft.delta.maxAppendFraction")
    }
  }

  test("corpus maintenance append is idempotent per epoch: a replayed epoch overwrites, never duplicates") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-maintain-idem").toString
    val dataDir = s"$corpus/documents.parquet"
    Seq((1L, "seed doc")).toDF("doc_id", "text").repartition(1).write.parquet(dataDir)
    val batch = Seq((10L, "epoch doc a"), (11L, "epoch doc b")).toDF("doc_id", "text")
      .repartition(1)
    CorpusMaintain.appendEpoch(batch, dataDir, 7L)
    val once = spark.read.parquet(dataDir).count()
    // the at-least-once replay: same epoch appended again
    CorpusMaintain.appendEpoch(batch, dataDir, 7L)
    assert(spark.read.parquet(dataDir).count() === once,
      "replaying an epoch must not duplicate rows")
    assert(spark.read.parquet(dataDir).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 10L, 11L))
    // a different epoch DOES append
    CorpusMaintain.appendEpoch(batch, dataDir, 8L)
    assert(spark.read.parquet(dataDir).count() === once + 2)
  }

  test("ann serving: a persisted IVF-PQ index answers a query stream with exact batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-annserve-idx").toString
    graft.operators.Similarity.buildIvfPqIndex(emb).write(dir)
    // the deterministic query fixture, split across two micro-batches
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .orderBy(col("vec_id")).limit(64)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(queries.length >= 2)
    val (b1, b2) = queries.splitAt(queries.length / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    val src = mem.toDF().toDF("vec_id", "embedding")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val ckpt = Files.createTempDirectory("graft-annserve-ckpt").toString
    val q = AnnServe.serveFrom(spark, dir, emb, src, 10, ckpt,
      (df, epoch) => { df.collect().foreach(r => results.add(r.toString)); epochs.add(epoch); () })
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    // per-query top-k has no cross-batch state, so the streamed union
    // must equal ONE batch search over the full fixture — exactly
    val idx = graft.operators.AnnIndex.read(spark, dir)
    val qdf = queries.toSeq.toDF("vec_id", "embedding")
    val want = graft.operators.Similarity.searchIvfPqIndex(idx, emb, qdf, 10)
      .collect().map(_.toString).sorted.toSeq
    val got = results.toArray(Array.empty[String]).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
    assert(epochs.size >= 2, s"expected >=2 serving epochs, saw $epochs")
  }

  test("routed fan-out sends each destination exactly its rows, dlq the failures, across two epochs") {
    val ckpt = Files.createTempDirectory("graft-ckpt-fanout").toString
    // two copies of the file + maxFilesPerTrigger=1 → two ack epochs
    val dir = Files.createTempDirectory("graft-events-2")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val source = FileMsgSource(dir.toString, eventsRaw, toMsg,
      Map("maxFilesPerTrigger" -> "1"))
    val k = regexp_extract(col("payload").cast("string"), "\"k\": (-?\\d+)", 1).cast("long")
    val route = Frizzle.Route(df => df.withColumn("k", k), isValid = !(col("k") % 13 === 0))
    val stats = new FrizzleStats
    val q = Frizzle.runRouted(spark, source, route, dest = col("dest"),
      (df, dest, epoch) => {
        sink.merge(dest, df.count(), (a, b) => a + b); epochs.add(epoch); ()
      },
      ckpt, stats = stats)
    q.awaitTermination(120000)
    // expectations from the batch table: valid rows per events.<type>
    // destination, invalid rows to dlq — each twice (two file copies)
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (-?\\d+)", 1).cast("long"))
    val valid = ev.filter(!(col("k") % 13 === 0))
    val expectedByDest = valid.groupBy(concat(lit("events."), col("event_type")).as("d"))
      .count().collect().map(r => r.getString(0) -> 2 * r.getLong(1)).toMap
    val expectedDlq = 2 * (ev.count() - valid.count())
    expectedByDest.foreach { case (d, n) =>
      assert(sink.get(d) === n, s"dest $d")
    }
    assert(sink.get("dlq") === expectedDlq)
    assert(sink.keySet().size === expectedByDest.size + 1)
    assert(epochs.size >= 2, s"expected >=2 ack epochs, saw $epochs")
    assert(stats.unAcked === 0)
    assert(stats.ackedCount === 2 * ev.count())
  }

  test("dlq retry loop: failures re-ingest and land in main under a corrected route") {
    val ckpt1 = Files.createTempDirectory("graft-ckpt-r1").toString
    val ckpt2 = Files.createTempDirectory("graft-ckpt-r2").toString
    val dlqDir = Files.createTempDirectory("graft-dlq").toString
    val source = FileMsgSource(eventsDir, eventsRaw, toMsg)
    val k = regexp_extract(col("payload").cast("string"), "\"k\": (-?\\d+)", 1).cast("long")
    // pass 1: strict route; failures parked as parquet in the DLQ dir
    val strict = Frizzle.Route(df => df.withColumn("k", k), isValid = !(col("k") % 13 === 0))
    val mainCount = new java.util.concurrent.atomic.AtomicLong
    val q1 = Frizzle.run(spark, source, strict,
      (df, dest, _) =>
        if (dest == "dlq") df.write.mode("append").parquet(dlqDir)
        else { mainCount.addAndGet(df.count()); () },
      ckpt1)
    q1.awaitTermination(120000)
    val parked = spark.read.parquet(dlqDir).count()
    assert(parked > 0)
    // pass 2: corrected route accepts everything; retry source re-reads
    // the parked envelope unchanged
    val dlqSchema = spark.read.parquet(dlqDir).schema
    val retried = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val q2 = Frizzle.run(spark,
      Frizzle.retryDlq(dlqDir, dlqSchema), Frizzle.Route(identity, lit(true)),
      (df, dest, _) => { retried.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt2)
    q2.awaitTermination(120000)
    assert(retried.getOrDefault("main", 0L) === parked)
    assert(retried.getOrDefault("dlq", 0L) === 0L)
    assert(mainCount.get() + parked === 1000L)
  }

  test("streaming tumbling window agrees with the batch image") {
    val src = spark.readStream.schema(eventsRaw).parquet(eventsDir)
      .select(TestSpark.eventsTs.as("ts"), col("event_type"), col("value"))
    val agg = src.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_stream")
      .select(unix_timestamp(col("window.start")).as("wstart"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventOps.winTumbling(spark, sf)
      .select(col("wstart"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("streaming spike monitor flags exactly the batch audit's (type, day) set") {
    val batchEvents = spark.read.schema(eventsRaw).parquet(eventsDir)
      .select(col("event_type"), TestSpark.eventsTs.as("ts"))
    val stats = EventOps.spikeStats(batchEvents)
    val src = spark.readStream.schema(eventsRaw).parquet(eventsDir)
      .select(col("event_type"), TestSpark.eventsTs.as("ts"))
    val q = Stateful.spikeMonitor(src, stats)
      .writeStream.outputMode("complete")
      .format("memory").queryName("spike_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("spike_stream")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("n_events"), r.getAs[Double]("mean_daily"), r.getAs[Double]("z")))
    // baseline trained on history ≡ batch audit over the same events:
    // identical flags AND identical reported statistics
    val batch = EventOps.spikeOver(batchEvents).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("n_events"), r.getAs[Double]("mean_daily"), r.getAs[Double]("z")))
    assert(streamed.map(t => (t._1, t._2, t._3)).toSet ===
      batch.map(t => (t._1, t._2, t._3)).toSet)
    assert(batch.nonEmpty)
    val sMap = streamed.map(t => (t._1, t._2) -> (t._4, t._5)).toMap
    batch.foreach { case (ty, day, _, m, zz) =>
      val (sm, sz) = sMap((ty, day))
      assert(sm === m); assert(sz === zz)
    }
  }

  test("streaming contamination gate equals the batch bloom audit on the same corpus") {
    val docsRaw = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val d = Files.createTempDirectory("graft-docs")
    Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
      d.resolve("documents.parquet"))
    val batchDocs = spark.read.schema(docsRaw).parquet(d.toString)
    val bf = graft.operators.Dedup.shingleBloom(batchDocs.filter(col("doc_id") % 2 === 0))
    val src = spark.readStream.schema(docsRaw).parquet(d.toString)
      .filter(col("doc_id") % 2 === 1)
    val q = Stateful.contaminationGate(src, bf)
      .writeStream.outputMode("append")
      .format("memory").queryName("contamination_gate")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("contamination_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // in-flight annotation ≡ the batch audit (same sketch, same probe):
    // flagged set AND hit counts identical; clean docs ride with 0
    val batch = graft.operators.Dedup.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hit"))).toSet
    assert(batch.nonEmpty)
    assert(streamed.filter(_._3 > 0) === batch)
    // every train doc passed through the gate exactly once
    assert(streamed.size.toLong ===
      batchDocs.filter(col("doc_id") % 2 === 1).count())
  }

  test("watermark drops late rows from windowed aggregation") {
    import spark.implicits._
    val watched = Files.createTempDirectory("graft-late")
    def writeFile(name: String, tsSeconds: Seq[Long], mtime: Long): Unit = {
      val out = Files.createTempDirectory(s"graft-late-$name")
      tsSeconds.map(s => Tuple1(new java.sql.Timestamp(s * 1000L))).toDF("ts")
        .coalesce(1).write.mode("overwrite").parquet(out.toString)
      val part = Files.list(out).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = watched.resolve(s"$name.parquet")
      Files.copy(part, dest)
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = 1700000000L // absolute value doesn't matter
    // Spark filters LATE EVENTS with the PREVIOUS batch's watermark
    // (state eviction uses the current one), so the late row must
    // arrive two batches after the rows that advanced the watermark:
    // batch 1 advances it to t0+20min, batch 2 is a spacer, batch 3
    // carries the 60-min-late row (must drop) plus a live row
    writeFile("a", Seq(t0, t0 + 1800), 1000000L)
    writeFile("b", Seq(t0 + 2400), 2000000L)
    writeFile("c", Seq(t0 - 3600, t0 + 3000), 3000000L)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(watched.toString)
    // append mode: a window emits once the watermark passes its end,
    // and input rows whose window already closed are dropped — the
    // strict late-data contract (update mode still upserts late rows)
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes")).count()
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val starts = spark.table("late_stream")
      .select(unix_timestamp(col("window.start")).as("ws"))
      .collect().map(_.getLong(0)).toSet
    def winStart(s: Long): Long = s / 300 * 300
    // the t0 and t0+1800 windows closed and emitted; the t0−3600
    // window closed long before its row arrived, so that row must
    // have been dropped — if it leaked, its window would have emitted
    assert(starts.contains(winStart(t0)))
    assert(starts.contains(winStart(t0 + 1800)))
    assert(!starts.contains(winStart(t0 - 3600)), "late row leaked past the watermark")
    // the state operator itself must report the drop
    assert(q.recentProgress.exists(_.stateOperators.exists(_.numRowsDroppedByWatermark > 0)))
  }

  test("streaming dropDuplicates holds effectively-once across epochs") {
    import spark.implicits._
    val watched = Files.createTempDirectory("graft-dedup-stream")
    def writeIds(name: String, ids: Seq[Long], mtime: Long): Unit = {
      val out = Files.createTempDirectory(s"graft-dedup-$name")
      ids.map(Tuple1(_)).toDF("msg_id").coalesce(1).write.mode("overwrite").parquet(out.toString)
      val part = Files.list(out).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = watched.resolve(s"$name.parquet")
      Files.copy(part, dest)
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // at-least-once redelivery: batch 2 re-delivers ids 6–10
    writeIds("a", 1L to 10L, 1000000L)
    writeIds("b", 6L to 15L, 2000000L)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("msg_id", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(watched.toString)
    val q = src.dropDuplicates("msg_id")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (1L to 15L), "redelivered ids must appear exactly once")
  }

  test("idempotent parquet sink makes epoch replays exactly-once") {
    val ckpt = Files.createTempDirectory("graft-ckpt-idem").toString
    val out = Files.createTempDirectory("graft-out-idem").toString
    val source = FileMsgSource(eventsDir, eventsRaw, toMsg)
    val route = Frizzle.Route(identity, isValid = col("payload").isNotNull)
    val q = Frizzle.runRouted(spark, source, route, dest = col("dest"),
      Sinks.idempotentParquet(out), ckpt)
    q.awaitTermination(120000)
    val once = spark.read.parquet(s"$out/events.click").count()
    assert(once > 0)
    // simulate an epoch replay: re-deliver the same batch to the same
    // (dest, epoch) — the overwrite mode must leave counts unchanged
    val batch = toMsg(spark.read.schema(eventsRaw).parquet(eventsDir))
      .filter(col("dest") === "events.click")
    Sinks.idempotentParquet(out)(batch, "events.click", 0L)
    assert(spark.read.parquet(s"$out/events.click").count() === once)
    // total across destinations is conserved
    val dests = new java.io.File(out).listFiles().map(_.getName)
    val total = dests.map(d => spark.read.parquet(s"$out/$d").count()).sum
    assert(total === 1000L)
  }

  test("epoch replay after a write failure drains stats to zero (no double count)") {
    val ckpt = Files.createTempDirectory("graft-ckpt-replay").toString
    val source = FileMsgSource(eventsDir, eventsRaw, toMsg)
    val route = Frizzle.Route(identity, isValid = col("payload").isNotNull)
    val stats = new FrizzleStats
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val delivered = new java.util.concurrent.atomic.AtomicLong
    def sink(df: org.apache.spark.sql.DataFrame, dest: String, epoch: Long): Unit = {
      if (failedOnce.compareAndSet(false, true))
        throw new RuntimeException("transient sink failure")
      delivered.addAndGet(df.count()); ()
    }
    // attempt 1: the sink throws mid-epoch → the query fails with the
    // epoch un-acked
    val q1 = Frizzle.runRouted(spark, source, route, dest = col("dest"), sink _, ckpt, stats = stats)
    intercept[Exception] { q1.awaitTermination(120000) }
    assert(stats.unAcked > 0, "failed epoch must stay pending")
    assert(stats.ackedCount === 0)
    // attempt 2: same checkpoint → Structured Streaming replays the
    // epoch; begin() for the same epoch must overwrite, not add
    val q2 = Frizzle.runRouted(spark, source, route, dest = col("dest"), sink _, ckpt, stats = stats)
    q2.awaitTermination(120000)
    assert(stats.unAcked === 0, s"unAcked=${stats.unAcked} after successful replay")
    assert(stats.ackedCount === 1000L)
    // at-least-once: destination writes run concurrently, so dests
    // whose write completed before the epoch failed receive the batch
    // AGAIN on replay — duplicates the idempotent sink contract
    // absorbs.  Stats still count the epoch exactly once (above);
    // delivery is ≥ the batch, never less.
    assert(delivered.get() >= 1000L)
  }

  test("per-key ordering: source order survives a narrow route into each destination write") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-order")
    val ckpt = Files.createTempDirectory("graft-ckpt-order").toString
    // ONE source partition (single file): offsets 0..199 interleaved
    // round-robin over 4 keys — the Kafka image, where a key lives in
    // exactly one partition and offsets increase within it
    (0L until 200L).map(o => (o, s"k${o % 4}", s"payload-$o"))
      .toDF("offset", "key", "body")
      .coalesce(1).write.parquet(dir.resolve("in").toString)
    val raw = StructType(Seq(StructField("offset", LongType),
      StructField("key", StringType), StructField("body", StringType)))
    def asMsg(df: DataFrame): DataFrame = df.select(
      col("offset").cast("string").as("msg_id"),
      col("key"),
      encode(col("body"), "UTF-8").as("payload"),
      when(col("key").isin("k0", "k1"), "t.a").otherwise("t.b").as("dest"),
      lit(null).cast("timestamp").as("ts"))
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Array[(String, Long)]]()
    val q = Frizzle.runRouted(spark,
      FileMsgSource(dir.resolve("in").toString, raw, asMsg),
      Frizzle.Route(identity, lit(true)), col("dest"),
      (df, dest, _) => {
        seen.put(dest, df.select("key", "msg_id").collect()
          .map(r => (r.getString(0), r.getString(1).toLong)))
        ()
      }, ckpt)
    q.awaitTermination(120000)
    assert(seen.size === 2)
    seen.values.forEach { rows =>
      rows.groupBy(_._1).values.foreach { perKey =>
        val offs = perKey.map(_._2).toSeq
        assert(offs === offs.sorted, s"per-key source order broken: $offs")
      }
    }
    val all = {
      val b = Seq.newBuilder[Long]
      seen.values.forEach(rows => b ++= rows.map(_._2))
      b.result()
    }
    assert(all.toSet === (0L until 200L).toSet)
  }

  test("destination writes run concurrently: epoch latency ~max, not ~sum") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-par")
    val ckpt = Files.createTempDirectory("graft-ckpt-par").toString
    (0L until 60L).map(i => (i, s"d${i % 6}"))
      .toDF("offset", "dest0")
      .coalesce(1).write.parquet(dir.resolve("in").toString)
    val raw = StructType(Seq(StructField("offset", LongType), StructField("dest0", StringType)))
    def asMsg(df: DataFrame): DataFrame = df.select(
      col("offset").cast("string").as("msg_id"),
      col("dest0").as("key"),
      encode(col("dest0"), "UTF-8").as("payload"),
      col("dest0").as("dest"),
      lit(null).cast("timestamp").as("ts"))
    val spans = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val q = Frizzle.runRouted(spark,
      FileMsgSource(dir.resolve("in").toString, raw, asMsg),
      Frizzle.Route(identity, lit(true)), col("dest"),
      (df, dest, _) => {
        val t0 = System.nanoTime()
        df.count()
        Thread.sleep(700)
        spans.put(dest, (t0, System.nanoTime()))
        ()
      }, ckpt)
    q.awaitTermination(120000)
    assert(spans.size === 6)
    var minStart = Long.MaxValue
    var maxEnd = Long.MinValue
    spans.values.forEach { case (a, b) =>
      minStart = math.min(minStart, a); maxEnd = math.max(maxEnd, b)
    }
    val wall = (maxEnd - minStart) / 1e9
    // six 0.7s writes sequentially are >= 4.2s; concurrent execution
    // must land well under that (generous bound for scheduler noise)
    assert(wall < 3.0, s"destination writes look sequential: wall=$wall s")
  }

  test("kafka source fails loudly when the connector jar is absent") {
    assume(!KafkaMsgSource.connectorAvailable,
      "connector present on this classpath — covered by the e2e test instead")
    val e = intercept[IllegalArgumentException] {
      KafkaMsgSource(KafkaPipeConfig.fromEnv(Map(
        "KAFKA_BROKERS" -> "b:9092", "KAFKA_TOPICS" -> "t"))).receive(spark)
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
  }

  test("kafka transport end-to-end (env-gated: real broker + connector required)") {
    assume(sys.env.contains("KAFKA_BROKERS"),
      "KAFKA_BROKERS not set — no broker in this container")
    assume(KafkaMsgSource.connectorAvailable,
      "spark-sql-kafka connector not on the classpath")
    val conf = KafkaPipeConfig.fromEnv()
    assume(conf.topics.nonEmpty, "KAFKA_TOPICS not set")
    val ckpt = Files.createTempDirectory("graft-ckpt-kafka").toString
    val n = new java.util.concurrent.atomic.AtomicLong
    val q = Frizzle.runRouted(spark, KafkaMsgSource(conf),
      Frizzle.Route(identity, col("payload").isNotNull), col("dest"),
      (df, _, _) => { n.addAndGet(df.count()); () }, ckpt)
    q.awaitTermination(120000)
    // drained whatever the topics held without error; the envelope
    // mapping and ack path ran against a real broker
    assert(n.get() >= 0L)
  }

  test("delivery reports: a failed destination reports per-message failure and is contained") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val src = new MsgSource {
      def receive(s: org.apache.spark.sql.SparkSession): DataFrame =
        mem.toDF().toDF("msg_id", "key", "dest")
    }
    mem.addData(("m1", "k1", "good"), ("m2", "k2", "evil"),
      ("m3", "k3", "good"), ("m4", "k4", "evil"))
    val ckpt = Files.createTempDirectory("graft-ckpt-dlvr").toString
    val written = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, String, Boolean, Option[String])]()
    val inner: (DataFrame, String, Long) => Unit = (df, dest, _) => {
      if (dest == "evil") throw new IllegalStateException("broker rejected batch")
      written.merge(dest, df.count(), (a, b) => a + b); ()
    }
    val sink = Sinks.withDeliveryReports(inner) { (rep, _, _) =>
      rep.collect().foreach(r => reports.add((r.getString(0), r.getString(1),
        r.getAs[String]("dest"), r.getAs[Boolean]("ok"),
        Option(r.getAs[String]("error")))))
      ()
    }
    val stats = new FrizzleStats
    val q = Frizzle.runRouted(spark, src, Frizzle.Route(identity, col("msg_id").isNotNull),
      col("dest"), sink, ckpt, stats = stats)
    q.awaitTermination(120000)
    // containment: the failed destination did not fail the epoch —
    // siblings wrote, the epoch committed (acks drained)
    assert(written.get("good") === 2L)
    assert(stats.unAcked === 0, "the epoch must commit despite the failed destination")
    // per-message reports: exactly one per message, ok keyed by its
    // destination's outcome, the error carried verbatim on failures
    val byMsg = reports.toArray(Array.empty[(String, String, String, Boolean, Option[String])])
      .map(t => t._1 -> t).toMap
    assert(byMsg.keySet === Set("m1", "m2", "m3", "m4"))
    assert(byMsg("m1")._4 && byMsg("m3")._4 && byMsg("m1")._5.isEmpty)
    assert(!byMsg("m2")._4 && !byMsg("m4")._4)
    assert(byMsg("m2")._3 === "evil" && byMsg("m2")._2 === "k2")
    assert(byMsg("m2")._5.exists(_.contains("broker rejected batch")))
  }

  // ───────── consumer-group semantics (the CI-pinnable half of the
  // frafka transport contract; the wire leg stays env-gated above) ─────────

  test("consumer group: two members split the partitions disjointly and cover the topic") {
    val log = new GroupLog(4)
    (0 until 40).foreach(i => log.append(s"k$i", Array(i.toByte)))
    val coord = new GroupCoordinator(log)
    val a = new GroupMember(coord, "a")
    val b = new GroupMember(coord, "b")
    val pa = coord.assignment("a").toSet
    val pb = coord.assignment("b").toSet
    assert((pa & pb).isEmpty, s"owners overlap: $pa vs $pb")
    assert((pa | pb) === (0 until 4).toSet, "every partition must have an owner")
    // each member's poll sees ONLY its partitions, and together they
    // drain the whole topic exactly once
    val ra = a.poll(spark).collect().map(r => (r.getInt(3), r.getLong(4)))
    val rb = b.poll(spark).collect().map(r => (r.getInt(3), r.getLong(4)))
    assert(ra.forall(t => pa.contains(t._1)) && rb.forall(t => pb.contains(t._1)))
    assert(ra.length + rb.length === 40)
    assert((ra ++ rb).distinct.length === 40, "no message may deliver to both members")
    // per-partition delivery order is offset order
    (ra ++ rb).groupBy(_._1).foreach { case (p, ms) =>
      assert(ms.map(_._2).toSeq === ms.map(_._2).sorted.toSeq, s"partition $p out of order")
    }
    a.close(); b.close()
  }

  test("consumer group rebalance: handoff resumes from committed offsets, acked never redelivered") {
    val log = new GroupLog(2)
    // keys pinned to known partitions so the scenario is deterministic
    val keyFor = (p: Int) => Iterator.from(0).map("m" + _)
      .find(k => math.floorMod(k.hashCode, 2) == p).get
    val k0 = keyFor(0); val k1 = keyFor(1)
    (0 until 6).foreach(_ => log.append(k0, Array[Byte](0)))
    (0 until 6).foreach(_ => log.append(k1, Array[Byte](1)))
    val coord = new GroupCoordinator(log)
    val a = new GroupMember(coord, "a")
    val b = new GroupMember(coord, "b")
    // a owns p0, b owns p1 (range over sorted {a,b})
    assert(coord.assignment("a") === Seq(0) && coord.assignment("b") === Seq(1))
    assert(a.poll(spark).count() === 6)
    a.ack(0, 3L) // offsets 0..3 committed; 4..5 delivered but UNACKED
    assert(b.poll(spark).count() === 6)
    b.ack(1, 5L)
    // a crashes/leaves → rebalance: b inherits p0 at the COMMITTED
    // watermark — the unacked tail redelivers (at-least-once), the
    // acked prefix never does
    a.close()
    val handed = b.poll(spark).collect()
      .map(r => (r.getInt(3), r.getLong(4))).sortBy(_._2)
    assert(handed.forall(_._1 == 0), "only the inherited partition has pending data")
    assert(handed.map(_._2).toSeq === Seq(4L, 5L),
      s"handoff must resume at the committed offset: $handed")
    // b's OWN partition does not re-deliver acked messages either
    // (positions reset to committed, and committed == end)
    assert(!handed.exists(_._1 == 1))
    b.ack(0, 5L)
    assert(b.poll(spark).count() === 0, "everything acked: the group is drained")
    b.close()
  }

  test("consumer group fencing: a stale-generation ack throws instead of double-committing") {
    val log = new GroupLog(2)
    (0 until 4).foreach(i => log.append(s"k$i", Array(i.toByte)))
    val coord = new GroupCoordinator(log)
    val a = new GroupMember(coord, "a")
    a.poll(spark).count()
    val genBefore = a.generation
    // membership change a has not observed yet
    val c = new GroupMember(coord, "c")
    val e = intercept[IllegalArgumentException] { a.ack(0, 0L) }
    assert(e.getMessage.contains("stale generation"))
    assert(coord.committedOffset(0) === 0L, "the fenced commit must not move the offset")
    assert(a.generation === genBefore, "fencing happens server-side, before any refresh")
    // after re-polling (the rebalance callback image) the SAME ack is
    // legal iff a still owns the partition in the new generation
    a.poll(spark).count()
    if (coord.assignment("a").contains(0)) { a.ack(0, 0L); assert(coord.committedOffset(0) === 1L) }
    else intercept[IllegalArgumentException] { a.ack(0, 0L) }
    a.close(); c.close()
  }

  test("group_rebalance: key routing IS event_id % 4, and the audit equals a sequential replay") {
    // the oracle's load-bearing equivalence: single-char keys "0".."3"
    // have consecutive hashCodes 48..51, so floorMod(hashCode, 4) = the
    // digit itself — pinned against the real GroupLog partitioner
    val log = new GroupLog(4)
    (0 to 3).foreach { d =>
      val (p, _) = log.append(d.toString, Array(d.toByte))
      assert(p === d, s"key '$d' must route to partition $d")
    }
    // sequential replay of the drill on the sf0.001 events table:
    // offsets by event_id order within event_id%4; redelivered =
    // the acked-gap offsets [600, 1499] that exist
    val feed = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id")).limit(20000)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byPart = feed.groupBy { case (id, _) => id % 4 }
    val expected = scala.collection.mutable.Map.empty[String, (Long, Long)] // (n, redeliv)
    byPart.values.foreach { msgs =>
      msgs.zipWithIndex.foreach { case ((_, et), o) =>
        val (n, rd) = expected.getOrElse(et, (0L, 0L))
        expected(et) = (n + 1, rd + (if (o >= 600 && o <= 1499) 1 else 0))
      }
    }
    val got = graft.operators.EventOps.groupRebalance(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (et, (n, rd)) =>
      assert(got(et) === ((n, n + rd, rd)), s"event_type $et")
    }
  }

  test("delivery_report_audit: one report per message, broken destination contained") {
    val rows = graft.operators.EventOps.deliveryReportAudit(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_msgs")).sum
    assert(total === graft.sources.Tables.events(spark, sf)
        .filter(col("event_id") % 10 === 0).count(),
      "every sampled message reports exactly once across destinations")
    rows.foreach { r =>
      val dest = r.getString(0)
      assert(r.getAs[Long]("n_msgs") === r.getAs[Long]("n_distinct_msgs"),
        s"double-reported messages under $dest")
      if (dest == "events.error") {
        assert(r.getAs[Int]("ok") === 0)
        assert(r.getAs[Long]("n_err") === r.getAs[Long]("n_msgs"),
          "every failed message carries its error")
      } else {
        assert(r.getAs[Int]("ok") === 1)
        assert(r.getAs[Long]("n_err") === 0L)
      }
    }
    // containment: the broken destination wrote NOTHING, siblings wrote
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_delivery_" + new java.io.File(sf).getName)
    assert(!new java.io.File(base, "out/events.error").exists,
      "failed sink must not leave partial output")
    assert(new java.io.File(base, "out").listFiles.nonEmpty,
      "sibling destinations proceed through the failure")
  }

  test("kafka config plumbing maps frafka env vars") {
    val conf = KafkaPipeConfig.fromEnv(Map(
      "KAFKA_BROKERS" -> "b1:9092,b2:9092",
      "KAFKA_TOPICS" -> "in1, in2",
      "KAFKA_CONSUMER_GROUP" -> "g1",
      "KAFKA_MAX_BUFFER_KB" -> "1024"))
    val opts = conf.sourceOptions
    assert(opts("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(opts("subscribe") === "in1,in2")
    assert(opts("kafka.group.id") === "g1")
    assert(opts("maxOffsetsPerTrigger").toLong > 0)
    assert(conf.sinkOptions("out")("topic") === "out")
  }
}
