package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro payload encode/decode over DataFrame columns — the structured-
  * payload edge for the messaging surface: a frizzle `Msg.Data()` is
  * opaque bytes, and the FIRST thing a pipeline consumer does is decode
  * them against a schema (reference: qntfy/frizzle README's
  * producer/consumer examples leave payload interpretation to the
  * user — Avro is the de-facto Kafka payload schema system).
  *
  * Spark's own `from_avro`/`to_avro` live in the external spark-avro
  * module, which this zero-egress container does not ship — but the
  * PLAIN Java Avro library (`avro-1.12.1.jar`) is on the unmanaged
  * classpath, so the binary format itself is fully available.  These
  * adapters bridge it to DataFrames through the same partition-
  * parallel codec seam as [[graft.operators.ImageCodec]]: one
  * `mapPartitions` pass, per-partition reader/writer reuse (the Avro
  * perf idiom — `BinaryEncoder`/`BinaryDecoder` are explicitly
  * designed for reuse), constant memory, no shuffle.  At 100 TB the
  * codec cost is embarrassingly parallel and pipelined with the scan.
  *
  * Scope: Avro RECORDS whose fields are the scalar types a message
  * payload actually uses — boolean/int/long/float/double/string/bytes,
  * each optionally nullable via the `["null", T]` union idiom.  Nested
  * records/arrays/maps/enums are out of scope HERE (a payload that
  * structured should land in parquet, not ride opaque in a message
  * envelope) and are rejected at schema-parse time, not at row time.
  *
  * Wire format: standard single-record Avro binary (no container file,
  * no schema fingerprint prefix) — the shape Kafka values carry under
  * an external schema registry, and byte-compatible with any Avro
  * implementation given the same writer schema.
  */
object AvroCodec {

  /** Parse + validate against the supported subset; the error names the
    * offending field up front instead of a per-row ClassCastException
    * three stages later.
    */
  def parseSchema(json: String): Schema = {
    val sch = new Schema.Parser().parse(json)
    require(sch.getType == Schema.Type.RECORD, s"top-level Avro type must be a record, got ${sch.getType}")
    sch.getFields.asScala.foreach { f =>
      val t = unwrapNullable(f.schema())._1.getType
      require(ScalarTypes.contains(t),
        s"field '${f.name}': unsupported Avro type $t (supported: ${ScalarTypes.mkString(", ")})")
    }
    sch
  }

  private val ScalarTypes = Set(Schema.Type.BOOLEAN, Schema.Type.INT,
    Schema.Type.LONG, Schema.Type.FLOAT, Schema.Type.DOUBLE,
    Schema.Type.STRING, Schema.Type.BYTES)

  /** (payload schema, nullable) for plain `T` or the `["null", T]` union. */
  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala
      require(branches.size == 2 && branches.exists(_.getType == Schema.Type.NULL),
        s"only the [\"null\", T] union is supported, got $s")
      (branches.find(_.getType != Schema.Type.NULL).get, true)
    }

  private def sparkType(t: Schema.Type): DataType = t match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  /** Spark schema equivalent of a (subset-validated) Avro record. */
  def sparkSchema(avro: Schema): StructType =
    StructType(avro.getFields.asScala.map { f =>
      val (t, nullable) = unwrapNullable(f.schema())
      StructField(f.name, sparkType(t.getType), nullable)
    }.toArray)

  /** Encode each row's schema-named columns into one Avro binary column
    * `avro_payload`, keeping `keep` passthrough columns.  Field values
    * are read from the DataFrame columns OF THE SAME NAME (schema
    * evolution by naming, the Avro contract); the input must carry
    * every schema field, pre-cast to the matching Spark type — a
    * mismatch is a per-field error at first row, named by the Avro
    * runtime.
    */
  def toAvro(df: DataFrame, schemaJson: String, keep: Seq[String] = Nil): DataFrame = {
    val avro = parseSchema(schemaJson)
    val fieldNames = avro.getFields.asScala.map(_.name).toSeq
    val in = df.select((keep ++ fieldNames).map(col): _*)
    val outSchema = StructType(
      keep.map(k => in.schema(k)).toArray :+ StructField("avro_payload", BinaryType, nullable = false))
    val nKeep = keep.length
    val nFields = fieldNames.length
    in.mapPartitions { it =>
      // parse once per partition (Schema itself is not serializable-
      // stable across Avro versions; the JSON string is), reuse the
      // writer/encoder/record across rows — the Avro throughput idiom
      val sch = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](sch)
      val baos = new java.io.ByteArrayOutputStream(128)
      var enc: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < nFields) {
          rec.put(i, toAvroValue(row.get(nKeep + i)))
          i += 1
        }
        baos.reset()
        enc = EncoderFactory.get().binaryEncoder(baos, enc)
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq((0 until nKeep).map(row.get) :+ baos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode binary column `binCol` (single-record Avro binary under
    * `schemaJson`) into the schema's fields as top-level columns,
    * keeping `keep` passthrough columns.  Undecodable payloads THROW
    * (a corrupt message in a schema'd stream is a pipeline fault, not
    * a row to drop silently — route bytes through a dead-letter split
    * BEFORE decode if drops are the policy).
    */
  def fromAvro(df: DataFrame, schemaJson: String, binCol: String = "avro_payload",
      keep: Seq[String] = Nil): DataFrame = {
    val avro = parseSchema(schemaJson)
    val decoded = sparkSchema(avro)
    val in = df.select(keep.map(col) :+ col(binCol): _*)
    val outSchema = StructType(keep.map(k => in.schema(k)).toArray ++ decoded.fields)
    val nKeep = keep.length
    val nFields = decoded.length
    in.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](sch)
      var dec: org.apache.avro.io.BinaryDecoder = null
      var rec: GenericRecord = null
      it.map { row =>
        dec = DecoderFactory.get().binaryDecoder(row.getAs[Array[Byte]](nKeep), dec)
        rec = reader.read(rec, dec)
        val out = new Array[Any](nKeep + nFields)
        var k = 0
        while (k < nKeep) { out(k) = row.get(k); k += 1 }
        var i = 0
        while (i < nFields) { out(nKeep + i) = fromAvroValue(rec.get(i)); i += 1 }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(Encoders.row(outSchema))
  }

  /** Confluent-style schema-registry framing: real Kafka consumers see
    * Avro values wrapped in the registry envelope — magic byte `0x00`,
    * then the schema id as a BIG-ENDIAN int32, then the single-record
    * Avro body (the public Confluent wire-format spec).  Framing is a
    * pure byte prepend, so it stays a codegen'd `concat` over the
    * binary column — no mapPartitions pass, no shuffle.
    */
  def frameConfluent(df: DataFrame, schemaId: Int,
      binCol: String = "avro_payload"): DataFrame = {
    val header = Array[Byte](0,
      (schemaId >>> 24).toByte, (schemaId >>> 16).toByte,
      (schemaId >>> 8).toByte, schemaId.toByte)
    df.withColumn(binCol,
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit(header), col(binCol)))
  }

  /** Decode Confluent-framed Avro: check the magic byte, read the
    * schema id, look the WRITER schema up in `schemasById` (the
    * consumer's registry snapshot), and resolve it against the fixed
    * `readerSchemaJson` — so a topic whose producers upgraded through
    * several schema versions decodes into ONE output shape, the Avro
    * evolution contract registries exist for.  Readers are built once
    * per (partition, id); a bad magic byte or an id absent from the
    * map THROWS (the [[fromAvro]] fault contract — an unknown schema
    * id is a registry-sync fault, not a row to drop).
    */
  def fromFramedAvro(df: DataFrame, readerSchemaJson: String,
      schemasById: Map[Int, String], binCol: String = "avro_payload",
      keep: Seq[String] = Nil): DataFrame = {
    val reader = parseSchema(readerSchemaJson)
    val decoded = sparkSchema(reader)
    schemasById.values.foreach(parseSchema(_)) // validate subset up front
    val in = df.select(keep.map(col) :+ col(binCol): _*)
    val outSchema = StructType(keep.map(k => in.schema(k)).toArray ++ decoded.fields)
    val nKeep = keep.length
    val nFields = decoded.length
    in.mapPartitions { it =>
      val readerSch = new Schema.Parser().parse(readerSchemaJson)
      val readers = new java.util.HashMap[Int, GenericDatumReader[GenericRecord]]()
      var dec: org.apache.avro.io.BinaryDecoder = null
      var rec: GenericRecord = null
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](nKeep)
        require(bytes.length >= 5 && bytes(0) == 0,
          s"not a Confluent-framed payload (len=${bytes.length}, magic=${if (bytes.nonEmpty) bytes(0) else -1})")
        val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
          ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
        var r = readers.get(id)
        if (r == null) {
          val writerJson = schemasById.getOrElse(id,
            throw new IllegalArgumentException(s"schema id $id not in the registry snapshot"))
          r = new GenericDatumReader[GenericRecord](
            new Schema.Parser().parse(writerJson), readerSch)
          readers.put(id, r)
        }
        dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, dec)
        rec = r.read(null, dec)
        val out = new Array[Any](nKeep + nFields)
        var k = 0
        while (k < nKeep) { out(k) = row.get(k); k += 1 }
        var i = 0
        while (i < nFields) { out(nKeep + i) = fromAvroValue(rec.get(i)); i += 1 }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(Encoders.row(outSchema))
  }

  /** Avro CONTAINER FILES (the `.avro` object-container format — what
    * export jobs and Kafka Connect sinks actually emit, magic bytes
    * `Obj\x01`, embedded writer schema, deflate/null codecs) decoded
    * to rows through the [[Formats.readBinaryFiles]] edge: one row per
    * record, with the source path attached as `src_file` provenance.
    * The READER schema is the caller's (same subset contract as the
    * single-record codec) and Avro's standard schema resolution
    * reconciles it with each file's embedded writer schema — so files
    * written with extra fields or reordered fields still decode, the
    * Avro evolution story.
    *
    * Parallelism is PER FILE (the binaryFile contract): fine for the
    * many-files layout container corpora ship in, wrong for one
    * monolithic multi-GB file — that needs a splittable input format,
    * and this reader's `maxBytes` guard (from readBinaryFiles)
    * excludes such files rather than OOMing an executor; audit drops
    * with [[Formats.oversizedFiles]].  Decode streams record-by-record
    * (DataFileStream) — constant memory per file regardless of record
    * count.
    */
  def readAvroFiles(s: org.apache.spark.sql.SparkSession, path: String,
      schemaJson: String, globFilter: String = "*.avro",
      maxBytes: Long = 256L << 20): DataFrame = {
    val avro = parseSchema(schemaJson)
    val decoded = sparkSchema(avro)
    val outSchema = StructType(
      StructField("src_file", StringType, nullable = false) +: decoded.fields)
    val nFields = decoded.length
    val files = Formats.readBinaryFiles(s, path, globFilter, maxBytes)
      .select(col("path"), col("content"))
    files.flatMap { row =>
      val sch = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord]()
      reader.setExpected(sch) // resolve writer schema -> caller's reader schema
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("content")), reader)
      val src = row.getAs[String]("path")
      new Iterator[Row] {
        def hasNext: Boolean = { val h = stream.hasNext; if (!h) stream.close(); h }
        def next(): Row = {
          val rec = stream.next()
          val out = new Array[Any](1 + nFields)
          out(0) = src
          var i = 0
          while (i < nFields) { out(1 + i) = fromAvroValue(rec.get(i)); i += 1 }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** [[readAvroFiles]]' write half, for tests and small exports: the
    * frame's schema-named columns into ONE container file (driver-side
    * stream — a distributed writer would need executor-direct file
    * commits, which parquet already does better; big exports should
    * stay parquet and this exists to round-trip the ingest edge).
    */
  def writeAvroFile(df: DataFrame, schemaJson: String, file: String): Unit = {
    val avro = parseSchema(schemaJson)
    val fieldNames = avro.getFields.asScala.map(_.name).toSeq
    val rows = df.select(fieldNames.map(col): _*).collect()
    val writer = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    writer.create(avro, new java.io.File(file))
    try rows.foreach { r =>
      val rec = new GenericData.Record(avro)
      var i = 0
      while (i < fieldNames.length) { rec.put(i, toAvroValue(r.get(i))); i += 1 }
      writer.append(rec)
    } finally writer.close()
  }

  /** External Row value → Avro runtime value (bytes ride as ByteBuffer). */
  private def toAvroValue(v: Any): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef]
  }

  /** Avro runtime value → external Row value (Utf8 → String, buffer →
    * fresh array: the reused record would otherwise alias it away).
    */
  private def fromAvroValue(v: Any): Any = v match {
    case null => null
    case s: CharSequence => s.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other
  }
}
