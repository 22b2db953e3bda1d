package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** proto3 wire-format encode/decode over DataFrame columns — the fourth
  * wire format next to Avro/JSON/CSV ([[AvroCodec]],
  * [[graft.operators.EventOps.msgDecodeJson]]), and with Avro the other
  * dominant Kafka value encoding.  No protobuf-java artifact ships in
  * this zero-egress container, but the proto3 WIRE FORMAT is a small
  * public spec (protobuf.dev/programming-guides/encoding): base-128
  * varints, zigzag for sint, little-endian fixed 32/64, and
  * length-delimited byte runs under a (field_number << 3 | wire_type)
  * tag — implemented here in pure JDK, the [[AvroCodec]] treatment.
  *
  * Same codec seam as Avro: one `mapPartitions` pass per direction,
  * per-partition buffer reuse, constant memory, no shuffle — at 100 TB
  * both passes pipeline with the scan.
  *
  * Scope mirrors [[AvroCodec]]: flat records of scalar fields —
  * int64 (varint), sint64 (zigzag varint), double, float, bool,
  * string, bytes.  Nested messages/repeated fields are out of scope
  * (that structured a payload belongs in parquet) and rejected at
  * schema-parse time.  The schema is a compact
  * `"number:name:type,..."` string — proto3 semantics don't need more
  * (names never hit the wire; numbers and types do).
  *
  * proto3 semantics implemented faithfully, because they're the
  * interesting DLQ contrast with the other three formats:
  *  - default-valued fields (0, 0.0, false, "", empty bytes — and null
  *    columns, proto3 has no null) are OMITTED on the wire;
  *  - missing fields decode to their defaults, NOT nulls;
  *  - unknown field numbers are skipped by wire type (forward compat);
  *  - ⇒ a payload truncated AT A FIELD BOUNDARY decodes cleanly with
  *    trailing fields at defaults — silent partial data, no decode
  *    error to key a DLQ on.  Detection must be semantic (a validity
  *    gate on decoded fields), which is exactly what
  *    `msg_decode_proto` and its streaming twin pin.
  */
object ProtoCodec {

  final case class ProtoField(number: Int, name: String, ptype: String)

  private val Types = Set("int64", "sint64", "double", "float", "bool", "string", "bytes")

  /** Parse + validate the `"number:name:type,..."` schema string; field
    * numbers must be unique and in the proto-legal range.
    */
  def parseSchema(s: String): Seq[ProtoField] = {
    val fields = s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val bits = part.split(":")
      require(bits.length == 3, s"schema field '$part' is not number:name:type")
      val f = ProtoField(bits(0).toInt, bits(1), bits(2))
      require(Types.contains(f.ptype),
        s"field '${f.name}': unsupported proto type ${f.ptype} (supported: ${Types.mkString(", ")})")
      require(f.number >= 1 && f.number <= 536870911 && !(f.number >= 19000 && f.number <= 19999),
        s"field '${f.name}': illegal proto field number ${f.number}")
      f
    }
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")
    fields.sortBy(_.number)
  }

  def sparkType(ptype: String): DataType = ptype match {
    case "int64" | "sint64" => LongType
    case "double"           => DoubleType
    case "float"            => FloatType
    case "bool"             => BooleanType
    case "string"           => StringType
    case "bytes"            => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported proto type $other")
  }

  /** Spark schema of the decoded record: every field non-nullable in
    * spirit (proto3 has no null — absent decodes to the default), but
    * declared nullable=false only for what Spark enforces cheaply.
    */
  def sparkSchema(fields: Seq[ProtoField]): StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f.ptype), nullable = false)))

  // ---- wire primitives (spec-pinned against the published examples) ----

  private[graft] def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)
  private[graft] def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private[graft] def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, number: Int, wt: Int): Unit =
    writeVarint(out, (number.toLong << 3) | wt)

  private def writeLe(out: java.io.ByteArrayOutputStream, bits: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Encode one row's values (aligned with `fields`) in ascending
    * field-number order, proto3 default-elision included.  Returns the
    * byte offset after the last field with number ≤ `markAfterField`
    * (-1 disables) — the deterministic field-boundary a torn-write
    * simulation truncates at.
    */
  private[graft] def encodeRecord(out: java.io.ByteArrayOutputStream,
      fields: Seq[ProtoField], values: Seq[Any], markAfterField: Int): Int = {
    var mark = 0
    fields.zip(values).foreach { case (f, v) =>
      val dflt = v == null || (f.ptype match {
        case "int64" | "sint64" => v.asInstanceOf[Long] == 0L
        case "double" => java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]) == 0L
        case "float"  => java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]) == 0
        case "bool"   => !v.asInstanceOf[Boolean]
        case "string" => v.asInstanceOf[String].isEmpty
        case "bytes"  => v.asInstanceOf[Array[Byte]].isEmpty
      })
      if (!dflt) f.ptype match {
        case "int64"  => writeTag(out, f.number, 0); writeVarint(out, v.asInstanceOf[Long])
        case "sint64" => writeTag(out, f.number, 0); writeVarint(out, zigzagEncode(v.asInstanceOf[Long]))
        case "bool"   => writeTag(out, f.number, 0); writeVarint(out, 1L)
        case "double" => writeTag(out, f.number, 1)
          writeLe(out, java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]), 8)
        case "float"  => writeTag(out, f.number, 5)
          writeLe(out, java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
        case "string" =>
          val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          writeTag(out, f.number, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case "bytes"  =>
          val b = v.asInstanceOf[Array[Byte]]
          writeTag(out, f.number, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      }
      if (f.number <= markAfterField) mark = out.size()
    }
    mark
  }

  /** Parse one record; `slots` is filled by field number (unknown
    * numbers skipped by wire type — the proto3 forward-compat
    * contract).  Throws on malformed bytes (truncated varint, length
    * overrun) — which, per the spec, can only happen on truncation
    * INSIDE a field, never at a field boundary.
    */
  private[graft] def decodeRecord(bytes: Array[Byte], fields: Seq[ProtoField]): Array[Any] = {
    val byNumber = fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
    val out = new Array[Any](fields.length)
    // proto3 defaults for absent fields
    fields.zipWithIndex.foreach { case (f, i) =>
      out(i) = f.ptype match {
        case "int64" | "sint64" => 0L
        case "double" => 0.0
        case "float"  => 0.0f
        case "bool"   => false
        case "string" => ""
        case "bytes"  => Array.emptyByteArray
      }
    }
    var pos = 0
    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        require(pos < bytes.length, s"truncated varint at offset $pos")
        val b = bytes(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "varint exceeds 10 bytes")
      }
      acc
    }
    def readLe(n: Int): Long = {
      require(pos + n <= bytes.length, s"truncated fixed$n at offset $pos")
      var acc = 0L; var i = 0
      while (i < n) { acc |= (bytes(pos + i).toLong & 0xff) << (8 * i); i += 1 }
      pos += n
      acc
    }
    while (pos < bytes.length) {
      val tag = readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(number) match {
        case Some((f, i)) => f.ptype match {
          case "int64"  => require(wt == 0, s"field $number: wire type $wt, want varint"); out(i) = readVarint()
          case "sint64" => require(wt == 0, s"field $number: wire type $wt, want varint"); out(i) = zigzagDecode(readVarint())
          case "bool"   => require(wt == 0, s"field $number: wire type $wt, want varint"); out(i) = readVarint() != 0L
          case "double" => require(wt == 1, s"field $number: wire type $wt, want fixed64")
            out(i) = java.lang.Double.longBitsToDouble(readLe(8))
          case "float"  => require(wt == 5, s"field $number: wire type $wt, want fixed32")
            out(i) = java.lang.Float.intBitsToFloat(readLe(4).toInt)
          case "string" =>
            require(wt == 2, s"field $number: wire type $wt, want length-delimited")
            val len = readVarint().toInt
            require(pos + len <= bytes.length, s"string field $number overruns payload")
            out(i) = new String(bytes, pos, len, java.nio.charset.StandardCharsets.UTF_8); pos += len
          case "bytes"  =>
            require(wt == 2, s"field $number: wire type $wt, want length-delimited")
            val len = readVarint().toInt
            require(pos + len <= bytes.length, s"bytes field $number overruns payload")
            out(i) = java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len
        }
        case None => wt match { // unknown field: skip by wire type
          case 0 => readVarint(); ()
          case 1 => readLe(8); ()
          case 2 => val len = readVarint().toInt
            require(pos + len <= bytes.length, s"unknown field $number overruns payload"); pos += len
          case 5 => readLe(4); ()
          case other => throw new IllegalArgumentException(s"unsupported wire type $other")
        }
      }
    }
    out
  }

  // ---- Confluent registry framing (the AvroCodec.frameConfluent twin) ----

  /** The Confluent protobuf value envelope (public wire-format spec):
    * magic `0x00`, schema id as big-endian int32, then the
    * MESSAGE-INDEXES list — a varint count followed by that many
    * varint indexes locating the message type inside the schema file
    * (the common first-message case serializes as the single byte
    * 0x00), then the proto body.  A pure byte prepend ⇒ codegen'd
    * concat, no mapPartitions.
    */
  def frameConfluent(df: DataFrame, schemaId: Int,
      messageIndexes: Seq[Int] = Seq(0),
      binCol: String = "proto_payload"): DataFrame = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
    out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
    // indexes ride as ZIGZAG varints (the Confluent spec's choice, NOT
    // plain proto varints); the plain first message [0] has the
    // spec-blessed single-0x00 short form (zigzag(0) = 0 = empty list)
    if (messageIndexes == Seq(0)) out.write(0)
    else {
      writeVarint(out, zigzagEncode(messageIndexes.length.toLong))
      messageIndexes.foreach(i => writeVarint(out, zigzagEncode(i.toLong)))
    }
    val header = out.toByteArray
    df.withColumn(binCol,
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit(header), col(binCol)))
  }

  /** Decode Confluent-framed proto: validate magic, read the schema id
    * (must be in `knownIds` — an id outside the consumer's registry
    * snapshot is a sync fault and THROWS, the
    * [[AvroCodec.fromFramedAvro]] contract), skip the message-indexes
    * list, decode the body against `readerSchema`.  Unlike Avro there
    * is no negotiated reader/writer resolution step — proto3's wire
    * format IS the resolution mechanism (unknown field numbers skip,
    * missing fields default), so one reader schema covers every writer
    * generation and the id's job is validation + metrics.
    */
  def fromFramedProto(df: DataFrame, readerSchema: String, knownIds: Set[Int],
      binCol: String = "proto_payload", keep: Seq[String] = Nil): DataFrame = {
    val fields = parseSchema(readerSchema)
    val decoded = sparkSchema(fields)
    val in = df.select(keep.map(col) :+ col(binCol): _*)
    val outSchema = StructType(keep.map(k => in.schema(k)).toArray ++ decoded.fields)
    val nKeep = keep.length
    in.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](nKeep)
        require(bytes.length >= 6 && bytes(0) == 0,
          s"not a Confluent-framed proto payload (len=${bytes.length})")
        val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
          ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
        require(knownIds.contains(id), s"schema id $id not in the registry snapshot")
        // skip message-indexes: zigzag-varint count (0 = the
        // plain-first-message short form), then `count` zigzag indexes
        var pos = 5
        def varintAt(): Long = {
          var shift = 0; var acc = 0L; var done = false
          while (!done) {
            require(pos < bytes.length, "truncated message-indexes varint")
            val b = bytes(pos); pos += 1
            acc |= (b & 0x7fL) << shift
            if ((b & 0x80) == 0) done = true else shift += 7
          }
          acc
        }
        val count = zigzagDecode(varintAt())
        var i = 0L
        while (i < count) { varintAt(); i += 1 }
        val rec = decodeRecord(
          java.util.Arrays.copyOfRange(bytes, pos, bytes.length), fields)
        val out = new Array[Any](nKeep + rec.length)
        var k = 0
        while (k < nKeep) { out(k) = row.get(k); k += 1 }
        System.arraycopy(rec, 0, out, nKeep, rec.length)
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(Encoders.row(outSchema))
  }

  // ---- DataFrame adapters (the AvroCodec seam) ----

  /** Encode each row's schema-named columns into one binary column
    * `proto_payload`, keeping `keep` passthrough columns.  When
    * `markAfterField` ≥ 1, an extra int column `wire_mark` carries the
    * byte offset after the last field with that number or lower — the
    * deterministic truncation boundary for torn-write simulations.
    */
  def toProto(df: DataFrame, schema: String, keep: Seq[String] = Nil,
      markAfterField: Int = -1): DataFrame = {
    val fields = parseSchema(schema)
    val names = fields.map(_.name)
    val in = df.select((keep ++ names).map(col): _*)
    val withMark = markAfterField >= 1
    val outSchema = StructType(
      keep.map(k => in.schema(k)).toArray ++
        (StructField("proto_payload", BinaryType, nullable = false) +:
          (if (withMark) Seq(StructField("wire_mark", IntegerType, nullable = false)) else Nil)))
    val nKeep = keep.length
    val nFields = names.length
    in.mapPartitions { it =>
      val baos = new java.io.ByteArrayOutputStream(128)
      it.map { row =>
        baos.reset()
        val values = (0 until nFields).map(i => row.get(nKeep + i))
        val mark = encodeRecord(baos, fields, values, markAfterField)
        val base = (0 until nKeep).map(row.get) :+ (baos.toByteArray: Any)
        Row.fromSeq(if (withMark) base :+ (mark: Any) else base)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode binary column `binCol` into the schema's fields as
    * top-level columns, keeping `keep` passthrough columns.  Absent
    * fields come back as proto3 DEFAULTS (never null); malformed bytes
    * THROW, the [[AvroCodec.fromAvro]] contract — but note that
    * boundary-truncated payloads are NOT malformed under proto3, they
    * are silently partial (see object doc).
    */
  def fromProto(df: DataFrame, schema: String, binCol: String = "proto_payload",
      keep: Seq[String] = Nil): DataFrame = {
    val fields = parseSchema(schema)
    val decoded = sparkSchema(fields)
    val in = df.select(keep.map(col) :+ col(binCol): _*)
    val outSchema = StructType(keep.map(k => in.schema(k)).toArray ++ decoded.fields)
    val nKeep = keep.length
    in.mapPartitions { it =>
      it.map { row =>
        val rec = decodeRecord(row.getAs[Array[Byte]](nKeep), fields)
        val out = new Array[Any](nKeep + rec.length)
        var k = 0
        while (k < nKeep) { out(k) = row.get(k); k += 1 }
        System.arraycopy(rec, 0, out, nKeep, rec.length)
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(Encoders.row(outSchema))
  }
}
