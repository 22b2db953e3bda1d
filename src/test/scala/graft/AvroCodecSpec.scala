package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroCodec, Tables}

class AvroCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val eventSchema =
    """{"type":"record","name":"Event","namespace":"graft","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"props","type":["null","string"],"default":null}]}""".stripMargin

  test("avro round-trip is the identity on the events subset") {
    val base = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    val back = AvroCodec.fromAvro(AvroCodec.toAvro(base, eventSchema), eventSchema)
    assert(back.schema.fieldNames.toSeq ===
      Seq("event_id", "user_id", "event_type", "value", "props"))
    val a = base.orderBy("event_id").collect().map(_.toString).toSeq
    val b = back.orderBy("event_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("wire format matches the Avro spec byte-for-byte (golden vector)") {
    // {"id": 3, "name": "ab"} under {id: long, name: string}:
    //   long 3  → zigzag(3)=6            → varint 0x06
    //   "ab"    → length zigzag(2)=4     → 0x04, then bytes 0x61 0x62
    // (Avro 1.x binary encoding spec, "Primitive Types") — pins that
    // toAvro emits REAL single-record Avro binary, not a private format
    val sch = """{"type":"record","name":"T","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(3L, "ab")),
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    val bytes = AvroCodec.toAvro(df, sch).head.getAs[Array[Byte]]("avro_payload")
    assert(bytes.toSeq === Seq[Byte](0x06, 0x04, 0x61, 0x62))
  }

  test("nullable union fields carry nulls through the round trip") {
    val sch = """{"type":"record","name":"N","fields":[
      |{"name":"k","type":"long"},
      |{"name":"s","type":["null","string"],"default":null},
      |{"name":"d","type":["null","double"],"default":null}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "x", java.lang.Double.valueOf(2.5)), Row(2L, null, null)),
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType), StructField("d", DoubleType))))
    val back = AvroCodec.fromAvro(AvroCodec.toAvro(df, sch), sch)
      .orderBy("k").collect()
    assert(back(0) === Row(1L, "x", 2.5))
    assert(back(1) === Row(2L, null, null))
  }

  test("keep columns pass through both directions") {
    val sch = """{"type":"record","name":"K","fields":[
      |{"name":"v","type":"double"}]}""".stripMargin
    val base = Tables.events(spark, sf).limit(10)
      .select(col("event_id"), col("value").as("v"))
    val enc = AvroCodec.toAvro(base, sch, keep = Seq("event_id"))
    assert(enc.schema.fieldNames.toSeq === Seq("event_id", "avro_payload"))
    val dec = AvroCodec.fromAvro(enc, sch, keep = Seq("event_id"))
    assert(dec.schema.fieldNames.toSeq === Seq("event_id", "v"))
    assert(dec.orderBy("event_id").collect().toSeq ===
      base.orderBy("event_id").collect().toSeq)
  }

  test("property: random scalar records round-trip bit-exactly (fixed-seed scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val sch = """{"type":"record","name":"P","fields":[
      |{"name":"b","type":"boolean"},
      |{"name":"i","type":"int"},
      |{"name":"l","type":"long"},
      |{"name":"f","type":"float"},
      |{"name":"d","type":"double"},
      |{"name":"s","type":["null","string"],"default":null},
      |{"name":"y","type":"bytes"}]}""".stripMargin
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("y", BinaryType)))
    // extreme values on purpose: varint boundaries, subnormals, NaN
    // payloads, empty/None strings, empty byte arrays
    val row: Gen[Row] = for {
      b <- Gen.oneOf(true, false)
      i <- Gen.oneOf(Gen.const(Int.MinValue), Gen.const(Int.MaxValue), Gen.chooseNum(-1000, 1000))
      l <- Gen.oneOf(Gen.const(Long.MinValue), Gen.const(Long.MaxValue), Gen.chooseNum(-1000000L, 1000000L))
      f <- Gen.oneOf(Gen.const(Float.NaN), Gen.const(Float.MinPositiveValue), Gen.chooseNum(-1e30f, 1e30f))
      d <- Gen.oneOf(Gen.const(Double.NaN), Gen.const(java.lang.Double.MIN_VALUE), Gen.chooseNum(-1e300, 1e300))
      s <- Gen.oneOf(Gen.const(null: String), Gen.const(""), Gen.listOf(Gen.alphaNumChar).map(_.mkString))
      y <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    } yield Row(b, i, l, f, d, s, y)
    (1 to 6).foreach { round =>
      val rows = Gen.listOfN(25, row)
        .apply(org.scalacheck.Gen.Parameters.default, Seed(0xa55e7L ^ round)).get
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      val back = AvroCodec.fromAvro(AvroCodec.toAvro(df, sch), sch).collect()
      // compare via bit patterns so NaN == NaN and -0.0 != 0.0
      def key(r: Row) = (r.getBoolean(0), r.getInt(1), r.getLong(2),
        java.lang.Float.floatToRawIntBits(r.getFloat(3)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        Option(r.getString(5)),
        r.getAs[Array[Byte]](6).toSeq)
      assert(back.map(key).sortBy(_.toString).toSeq ===
        rows.map(key).sortBy(_.toString).toSeq, s"round $round")
    }
  }

  test("schema subset is enforced at parse time, not row time") {
    val nested = """{"type":"record","name":"Bad","fields":[
      |{"name":"inner","type":{"type":"record","name":"I","fields":[
      |{"name":"x","type":"long"}]}}]}""".stripMargin
    val e = intercept[IllegalArgumentException](AvroCodec.parseSchema(nested))
    assert(e.getMessage.contains("inner"))
    val arr = """{"type":"array","items":"long"}"""
    assert(intercept[IllegalArgumentException](
      AvroCodec.parseSchema(arr)).getMessage.contains("record"))
  }

  test("decode runs on a STREAMING frame — the frizzle Data() consume path") {
    // the codec seam is mapPartitions over an Encoders.row dataset,
    // which Structured Streaming plans per micro-batch like any other
    // narrow op — this pins that the consume-side decode needs no
    // batch-only machinery
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sch = """{"type":"record","name":"M","fields":[
      |{"name":"k","type":"long"},{"name":"v","type":"double"}]}""".stripMargin
    // wire bytes produced by the batch encoder — same single-record
    // format a Kafka value would carry
    val payloads = {
      val df = spark.createDataFrame(
        java.util.List.of(Row(1L, 1.5), Row(2L, 2.5), Row(3L, 3.5)),
        StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))))
      AvroCodec.toAvro(df, sch, keep = Seq("k"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("avro_payload")))
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(payloads.toIndexedSeq: _*)
    val q = AvroCodec.fromAvro(
        mem.toDF.toDF("msg_id", "avro_payload"), sch, keep = Seq("msg_id"))
      .writeStream.outputMode("append").format("memory").queryName("avro_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("avro_stream").orderBy("k").collect()
      .map(r => (r.getAs[Long]("msg_id"), r.getAs[Long]("k"), r.getAs[Double]("v")))
    assert(got.toSeq === Seq((1L, 1L, 1.5), (2L, 2L, 2.5), (3L, 3L, 3.5)))
  }

  test("avro container files: write, re-ingest with provenance, schema evolution") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrofiles")
    val writerSch = """{"type":"record","name":"W","fields":[
      |{"name":"k","type":"long"},
      |{"name":"extra","type":"string"},
      |{"name":"v","type":"double"}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "a", 1.5), Row(2L, "b", 2.5), Row(3L, "c", 3.5)),
      StructType(Seq(StructField("k", LongType),
        StructField("extra", StringType), StructField("v", DoubleType))))
    AvroCodec.writeAvroFile(df.filter(col("k") < 3), writerSch, s"$dir/p0.avro")
    AvroCodec.writeAvroFile(df.filter(col("k") === 3), writerSch, s"$dir/p1.avro")
    // same-schema read: all rows back, src_file carries which file
    val full = AvroCodec.readAvroFiles(spark, dir.toString, writerSch)
    assert(full.schema.fieldNames.toSeq === Seq("src_file", "k", "extra", "v"))
    val rows = full.collect().map(r =>
      (r.getAs[String]("src_file").split('/').last, r.getAs[Long]("k"),
        r.getAs[String]("extra"), r.getAs[Double]("v"))).sortBy(_._2)
    assert(rows.toSeq === Seq(("p0.avro", 1L, "a", 1.5),
      ("p0.avro", 2L, "b", 2.5), ("p1.avro", 3L, "c", 3.5)))
    // evolution: a narrower, REORDERED reader schema resolves against
    // each file's embedded writer schema by field name
    val readerSch = """{"type":"record","name":"W","fields":[
      |{"name":"v","type":"double"},{"name":"k","type":"long"}]}""".stripMargin
    val narrow = AvroCodec.readAvroFiles(spark, dir.toString, readerSch)
      .orderBy("k").collect().map(r => (r.getAs[Double]("v"), r.getAs[Long]("k")))
    assert(narrow.toSeq === Seq((1.5, 1L), (2.5, 2L), (3.5, 3L)))
  }

  test("confluent framing: header is exactly magic 0x00 + big-endian schema id") {
    val sch = """{"type":"record","name":"F","fields":[
      |{"name":"k","type":"long"}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(150L)),
      StructType(Seq(StructField("k", LongType))))
    val framed = AvroCodec.frameConfluent(AvroCodec.toAvro(df, sch), 0x01020304)
      .collect()(0).getAs[Array[Byte]]("avro_payload")
    assert(framed.take(5).toSeq === Seq[Byte](0, 1, 2, 3, 4))
    // body after the header is the unframed wire image (Avro long =
    // zigzag varint: 150 → 300 → 0xAC 0x02)
    assert(framed.drop(5).toSeq === Seq[Byte](-84, 2))
  }

  test("confluent framing round trip; registry lookup resolves writer→reader per id") {
    // two producer generations live on one topic: v1 writes (k, v); v2
    // added a field and reordered — the reader schema stays v1-shaped
    // and Avro schema resolution reconciles each id's writer layout
    val v1 = """{"type":"record","name":"E","fields":[
      |{"name":"k","type":"long"},{"name":"v","type":"double"}]}""".stripMargin
    val v2 = """{"type":"record","name":"E","fields":[
      |{"name":"note","type":"string"},{"name":"v","type":"double"},
      |{"name":"k","type":"long"}]}""".stripMargin
    val s1 = StructType(Seq(StructField("k", LongType), StructField("v", DoubleType)))
    val s2 = StructType(Seq(StructField("note", StringType),
      StructField("v", DoubleType), StructField("k", LongType)))
    val w1 = AvroCodec.frameConfluent(AvroCodec.toAvro(
      spark.createDataFrame(java.util.List.of(Row(1L, 1.5)), s1), v1), 1)
    val w2 = AvroCodec.frameConfluent(AvroCodec.toAvro(
      spark.createDataFrame(java.util.List.of(Row("x", 2.5, 2L)), s2), v2), 2)
    val got = AvroCodec.fromFramedAvro(w1.unionAll(w2), v1, Map(1 -> v1, 2 -> v2))
      .orderBy("k").collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("v")))
    assert(got.toSeq === Seq((1L, 1.5), (2L, 2.5)))
  }

  test("confluent framing faults: unknown schema id and bad magic both throw") {
    val sch = """{"type":"record","name":"F","fields":[
      |{"name":"k","type":"long"}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L)), StructType(Seq(StructField("k", LongType))))
    val framed = AvroCodec.frameConfluent(AvroCodec.toAvro(df, sch), 9)
    val unknown = intercept[org.apache.spark.SparkException] {
      AvroCodec.fromFramedAvro(framed, sch, Map(1 -> sch)).collect()
    }
    assert(unknown.getMessage.contains("schema id") ||
      unknown.getCause.getMessage.contains("schema id"))
    val badMagic = intercept[org.apache.spark.SparkException] {
      AvroCodec.fromFramedAvro(AvroCodec.toAvro(df, sch), sch, Map(9 -> sch)).collect()
    }
    assert(badMagic.getMessage.contains("Confluent") ||
      badMagic.getCause.getMessage.contains("Confluent"))
  }

  test("bytes fields round-trip as fresh arrays (no record-reuse aliasing)") {
    val sch = """{"type":"record","name":"B","fields":[
      |{"name":"k","type":"long"},{"name":"p","type":"bytes"}]}""".stripMargin
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, Array[Byte](1, 2)), Row(2L, Array[Byte](3, 4, 5))),
      StructType(Seq(StructField("k", LongType), StructField("p", BinaryType))))
    val back = AvroCodec.fromAvro(AvroCodec.toAvro(df, sch), sch)
      .orderBy("k").collect()
    assert(back(0).getAs[Array[Byte]]("p").toSeq === Seq[Byte](1, 2))
    assert(back(1).getAs[Array[Byte]]("p").toSeq === Seq[Byte](3, 4, 5))
  }
}
