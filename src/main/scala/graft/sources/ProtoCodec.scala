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
  * Scope: records of scalar fields — int64 (varint), sint64 (zigzag
  * varint), double, float, bool, string, bytes — plus ONE level of
  * structure, the shapes real Kafka proto topics actually carry:
  * message-typed fields (wire type 2, the same length-delimited
  * machinery as string/bytes; decode to a struct column, absent ⇒
  * NULL — message fields are proto3's one explicit-presence scalar
  * case) and repeated fields (scalars encode PACKED per the proto3
  * default and decode both packed and expanded; strings/bytes/
  * messages are one length-delimited element per tag; decode to an
  * array column, absent ⇒ empty array), plus the two remaining shapes
  * routine on real topics: ENUM fields (open proto3 enums — int32
  * varints with unknown values preserved, which an IntegerType column
  * represents losslessly) and MAP fields (`map<K,V>` — wire-encoded
  * as repeated synthetic (key=1, value=2) entry messages, decoded to
  * a MapType column with the spec's last-one-wins duplicate-key
  * merge; a bounded special case of the depth rule, since the entry
  * message is generated and never user-nested — message-typed VALUES
  * (`map<string,{...}>`) are the one legal depth-2 value case, ridden
  * on the same struct machinery inside the synthetic entry), and
  * ONEOF groups (wire-PLAIN fields — a oneof never appears as a tag
  * itself; its members are ordinary fields where the LAST member seen
  * on the wire wins and clears the others, and a set member
  * serializes EVEN AT its default value, proto3's explicit-presence
  * rule for oneof — decoded to nullable columns, exactly one non-null
  * per group).  Messages nested inside messages stay rejected at
  * schema-parse time (depth > 1 structure belongs in parquet).  The
  * schema is a compact `"number:name:type,..."` string — proto3
  * semantics don't need more (names never hit the wire; numbers and
  * types do); `type` extends to `int64[]` (repeated),
  * `{1:street:string;2:zip:int64}` (message), `{...}[]` (repeated
  * message), `enum`, `map<string,int64>`, `map<string,{...}>`
  * (message-valued map), and `string@contact` (member of oneof group
  * `contact`).
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

  /** `ptype` is the scalar kind, `"message"` (then `sub` carries the
    * one-level nested fields) or `"map"` (then `sub` is the synthetic
    * entry message: key = field 1, value = field 2 — the spec's map
    * encoding; the value field may itself be `"message"`, the bounded
    * depth-2 case); `repeated` wraps scalars/messages in an array
    * (maps cannot be repeated, per the spec); `oneof` names the
    * field's oneof group, if any — members get explicit presence
    * (nullable column, serialized even at the default value) and
    * last-member-seen-wins decode within the group.
    */
  final case class ProtoField(number: Int, name: String, ptype: String,
      repeated: Boolean = false, sub: Seq[ProtoField] = Nil,
      oneof: Option[String] = None)

  /** `enum` is proto3's open enum: an int32 varint on the wire, with
    * UNKNOWN values preserved as their integer (the proto3
    * unknown-value contract) — which is exactly what an int column
    * gives, so the Spark type is IntegerType and no name table exists
    * to lose values through.
    *
    * Round 15 completes the SCALAR MATRIX — every proto3 scalar
    * encoding the spec defines: the 32-bit varints (`int32` —
    * negatives sign-extend to the 10-byte form, parsers take the low
    * 32 bits; `sint32` — 32-bit zigzag, ≤ 5 bytes; `uint32` — LongType
    * column, the unsigned range doesn't fit an int), the unsigned
    * 64-bit varint (`uint64` — LongType REINTERPRETED: the wire bits
    * equal int64's, only the interpretation differs, and Spark has no
    * unsigned long — documented, the standard JVM convention), and
    * the fixed-width family (`fixed64`/`sfixed64` — 8-byte LE, wire
    * type 1; `fixed32` — 4-byte LE unsigned, LongType; `sfixed32` —
    * 4-byte LE signed, IntegerType; wire type 5).  All pack/unpack in
    * repeated fields like any numeric scalar.
    */
  private val Types = Set("int64", "sint64", "double", "float", "bool", "string", "bytes", "enum",
    "int32", "sint32", "uint32", "uint64", "fixed64", "sfixed64", "fixed32", "sfixed32")

  /** Legal map key kinds (the spec: any integral or string type; no
    * float/bytes/enum/message keys).
    */
  private val MapKeyTypes = Set("int64", "sint64", "bool", "string",
    "int32", "sint32", "uint32", "uint64", "fixed64", "sfixed64", "fixed32", "sfixed32")

  /** Parse + validate the `"number:name:type,..."` schema string; field
    * numbers must be unique and in the proto-legal range.  Message
    * types use `{...;...}` with ';'-separated sub-fields (scalar or
    * repeated-scalar only — depth > 1 is rejected); a trailing `[]`
    * on any type means repeated.
    */
  def parseSchema(s: String): Seq[ProtoField] =
    parseFields(s, ',', allowMessage = true)

  /** Split on `sep` at bracket depth 0 only, so message sub-schemas
    * (`{...}`) and map type arguments (`map<K,V>`) ride inside one
    * top-level field part.
    */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '{' => depth += 1; cur += '{'
      case '}' => depth -= 1; require(depth >= 0, s"unbalanced braces in schema '$s'"); cur += '}'
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; require(depth >= 0, s"unbalanced brackets in schema '$s'"); cur += '>'
      case c if c == sep && depth == 0 => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    require(depth == 0, s"unbalanced brackets in schema '$s'")
    parts += cur.result()
    parts.toSeq
  }

  /** Index of the first '@' at bracket depth 0, or -1 — the oneof
    * group separator, which must not match '@' inside a nested message
    * sub-schema (whose own fields may carry their own groups).
    */
  private def atTop(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '{' | '<' => depth += 1
        case '}' | '>' => depth -= 1
        case '@' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def parseFields(s: String, sep: Char, allowMessage: Boolean): Seq[ProtoField] = {
    val fields = splitTop(s, sep).map(_.trim).filter(_.nonEmpty).map { part =>
      val bits = part.split(":", 3)
      require(bits.length == 3, s"schema field '$part' is not number:name:type")
      // a depth-0 '@' suffixes the oneof group name; it never occurs
      // inside {...} or <...> (sub-schemas re-enter parseFields, where
      // their own depth-0 '@' is theirs)
      val (typeAndRep, oneof) = atTop(bits(2)) match {
        case -1 => (bits(2), None)
        case at =>
          val g = bits(2).substring(at + 1)
          require(g.nonEmpty, s"field '${bits(1)}': empty oneof group name")
          (bits(2).substring(0, at), Some(g))
      }
      val (typeStr, repeated) =
        if (typeAndRep.endsWith("[]")) (typeAndRep.dropRight(2), true) else (typeAndRep, false)
      require(oneof.isEmpty || !repeated,
        s"field '${bits(1)}': oneof members cannot be repeated (spec rule)")
      require(oneof.isEmpty || !typeStr.startsWith("map<"),
        s"field '${bits(1)}': oneof members cannot be maps (spec rule)")
      val f =
        if (typeStr.startsWith("map<")) {
          // map<K,V> is wire-encoded as a repeated SYNTHETIC message of
          // (key = 1, value = 2) entries — a bounded special case of
          // the depth rule, not a general depth-2 opening: the entry
          // message is generated here, and its fields are scalar-only
          require(allowMessage,
            s"field '${bits(1)}': map fields are top-level only")
          require(typeStr.endsWith(">"), s"schema field '$part': unterminated map type")
          require(!repeated, s"field '${bits(1)}': map fields cannot be repeated (spec rule)")
          val kv = splitTop(typeStr.substring(4, typeStr.length - 1), ',').map(_.trim)
          require(kv.length == 2 && kv.forall(_.nonEmpty),
            s"field '${bits(1)}': map type needs map<keytype,valuetype>")
          require(MapKeyTypes.contains(kv(0)),
            s"field '${bits(1)}': illegal map key type ${kv(0)} (allowed: ${MapKeyTypes.mkString(", ")})")
          // message-typed values are the one legal depth-2 case: the
          // entry's value field is itself a length-delimited message,
          // riding the existing depth-1 struct machinery inside the
          // synthetic entry (its own sub-fields stay scalar-only)
          val valueField =
            if (kv(1).startsWith("{")) {
              require(kv(1).endsWith("}"),
                s"field '${bits(1)}': unterminated map value message type")
              val vsub = parseFields(kv(1).substring(1, kv(1).length - 1), ';',
                allowMessage = false)
              require(vsub.nonEmpty, s"field '${bits(1)}': empty map value message type")
              ProtoField(2, "value", "message", repeated = false, vsub)
            } else {
              require(Types.contains(kv(1)),
                s"field '${bits(1)}': unsupported map value type ${kv(1)} " +
                  "(scalars or one {...} message level)")
              ProtoField(2, "value", kv(1))
            }
          ProtoField(bits(0).trim.toInt, bits(1).trim, "map", repeated = false,
            sub = Seq(ProtoField(1, "key", kv(0)), valueField))
        } else if (typeStr.startsWith("{")) {
          require(allowMessage,
            s"field '${bits(1)}': nested messages beyond one level are not supported " +
              "(deeper structure belongs in parquet)")
          require(typeStr.endsWith("}"), s"schema field '$part': unterminated message type")
          val sub = parseFields(typeStr.substring(1, typeStr.length - 1), ';',
            allowMessage = false)
          require(sub.nonEmpty, s"field '${bits(1)}': empty message type")
          ProtoField(bits(0).trim.toInt, bits(1).trim, "message", repeated, sub, oneof)
        } else {
          require(Types.contains(typeStr),
            s"field '${bits(1)}': unsupported proto type $typeStr (supported: ${Types.mkString(", ")}, [], {...})")
          ProtoField(bits(0).trim.toInt, bits(1).trim, typeStr, repeated, Nil, oneof)
        }
      require(f.number >= 1 && f.number <= 536870911 && !(f.number >= 19000 && f.number <= 19999),
        s"field '${f.name}': illegal proto field number ${f.number}")
      f
    }
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")
    fields.sortBy(_.number)
  }

  def sparkType(ptype: String): DataType = ptype match {
    case "int64" | "sint64" | "uint64" | "fixed64" | "sfixed64" => LongType
    // the unsigned 32-bit ranges don't fit an int — they ride longs
    case "uint32" | "fixed32"           => LongType
    case "int32" | "sint32" | "sfixed32" => IntegerType
    case "double"           => DoubleType
    case "float"            => FloatType
    case "bool"             => BooleanType
    case "string"           => StringType
    case "bytes"            => BinaryType
    case "enum"             => IntegerType
    case other => throw new IllegalArgumentException(s"unsupported proto type $other")
  }

  private def fieldType(f: ProtoField): DataType = {
    val base =
      if (f.ptype == "message") StructType(f.sub.map(sf =>
        StructField(sf.name, fieldType(sf), nullable = sf.ptype == "message" && !sf.repeated)))
      else if (f.ptype == "map")
        // message-typed values: an entry with the value field absent
        // decodes to the DEFAULT INSTANCE (all-defaults row), never a
        // null — so valueContainsNull stays false for every value kind
        MapType(sparkType(f.sub(0).ptype), fieldType(f.sub(1)), valueContainsNull = false)
      else sparkType(f.ptype)
    if (f.repeated) ArrayType(base, containsNull = false) else base
  }

  /** Spark schema of the decoded record: scalars non-nullable (proto3
    * has no null — absent decodes to the default), repeated fields and
    * maps non-nullable (absent ⇒ empty), message fields and ONEOF
    * members NULLABLE (absence is observable presence for both — an
    * unset oneof member is null, and at most one member per group is
    * non-null).
    */
  def sparkSchema(fields: Seq[ProtoField]): StructType =
    StructType(fields.map(f => StructField(f.name, fieldType(f),
      nullable = (f.ptype == "message" && !f.repeated) || f.oneof.isDefined)))

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

  /** Write one scalar VALUE (no tag) in its wire encoding — shared by
    * the singular, packed-run and expanded paths.
    */
  private def writeScalar(out: java.io.ByteArrayOutputStream, ptype: String, v: Any): Unit =
    ptype match {
      case "int64"  => writeVarint(out, v.asInstanceOf[Long])
      case "sint64" => writeVarint(out, zigzagEncode(v.asInstanceOf[Long]))
      case "bool"   => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      // enum/int32: int32 varints; negatives sign-extend to 64 bits
      // and take the full 10 bytes (the spec's rule for both)
      case "enum" | "int32" => writeVarint(out, v.asInstanceOf[Int].toLong)
      // sint32: 32-bit zigzag — ≤ 5 bytes even for negatives
      case "sint32" =>
        val n = v.asInstanceOf[Int]
        writeVarint(out, ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL)
      case "uint32" =>
        val n = v.asInstanceOf[Long]
        require(n >= 0L && n <= 0xffffffffL, s"uint32 out of range: $n")
        writeVarint(out, n)
      // uint64 shares int64's wire bits — only the interpretation
      // differs (the column long REINTERPRETS as unsigned)
      case "uint64" => writeVarint(out, v.asInstanceOf[Long])
      case "fixed64" | "sfixed64" => writeLe(out, v.asInstanceOf[Long], 8)
      case "fixed32" =>
        val n = v.asInstanceOf[Long]
        require(n >= 0L && n <= 0xffffffffL, s"fixed32 out of range: $n")
        writeLe(out, n, 4)
      case "sfixed32" => writeLe(out, v.asInstanceOf[Int].toLong & 0xffffffffL, 4)
      case "double" => writeLe(out, java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]), 8)
      case "float"  => writeLe(out, java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
      case other => throw new IllegalArgumentException(s"not a packable scalar: $other")
    }

  private def writeDelimited(out: java.io.ByteArrayOutputStream, number: Int,
      b: Array[Byte]): Unit = {
    writeTag(out, number, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  /** Encode one row's values (aligned with `fields`) in ascending
    * field-number order, proto3 default-elision included (null/empty
    * repeated fields and NULL message fields are omitted; a non-null
    * all-default message still writes its zero-length presence).
    * Repeated numeric scalars write PACKED (the proto3 default);
    * repeated strings/bytes/messages write one length-delimited
    * element per tag.  Returns the byte offset after the last field
    * with number ≤ `markAfterField` (-1 disables) — the deterministic
    * field-boundary a torn-write simulation truncates at.
    */
  private[graft] def encodeRecord(out: java.io.ByteArrayOutputStream,
      fields: Seq[ProtoField], values: Seq[Any], markAfterField: Int): Int = {
    var mark = 0
    // a oneof holds AT MOST one set member — two non-null members in
    // one row is a data bug the wire would silently resolve last-wins;
    // fail loudly instead
    fields.zip(values).filter(_._1.oneof.isDefined).groupBy(_._1.oneof.get)
      .foreach { case (g, members) =>
        require(members.count(_._2 != null) <= 1,
          s"oneof group '$g': more than one member set in a single row")
      }
    fields.zip(values).foreach { case (f, v) =>
      if (f.ptype == "map") {
        // one synthetic (key=1, value=2) entry message per pair, in
        // the map's iteration order; default key/value elide inside
        // the entry exactly like any message field (decoders restore
        // them), and an empty/null map is omitted entirely
        val entries: Seq[(Any, Any)] = v match {
          case null => Nil
          case m: scala.collection.Map[_, _] => m.toSeq.asInstanceOf[Seq[(Any, Any)]]
          case m: java.util.Map[_, _] =>
            import scala.jdk.CollectionConverters._
            m.asScala.toSeq.asInstanceOf[Seq[(Any, Any)]]
          case other => throw new IllegalArgumentException(
            s"field '${f.name}': map value is not a Map: ${other.getClass}")
        }
        entries.foreach { case (k, vv) =>
          require(k != null && vv != null,
            s"field '${f.name}': null map key or value (proto3 maps have neither)")
          val sub = new java.io.ByteArrayOutputStream(32)
          encodeRecord(sub, f.sub, Seq(k, vv), -1)
          writeDelimited(out, f.number, sub.toByteArray)
        }
      } else if (f.repeated) {
        val elems: Seq[Any] = v match {
          case null => Nil
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_] => scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
          case other => throw new IllegalArgumentException(
            s"field '${f.name}': repeated value is not a sequence: ${other.getClass}")
        }
        // ArrayType(containsNull=false) is declared but Spark does not
        // enforce it on arbitrary input frames (e.g. parquet reads
        // with nullable elements) — fail loudly, not with an NPE deep
        // in a per-element cast
        elems.foreach(e => require(e != null,
          s"field '${f.name}': null element in repeated field"))
        if (elems.nonEmpty) f.ptype match {
          case "string" => elems.foreach(e =>
            writeDelimited(out, f.number,
              e.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case "bytes" => elems.foreach(e => writeDelimited(out, f.number, e.asInstanceOf[Array[Byte]]))
          case "message" => elems.foreach { e =>
            val sub = new java.io.ByteArrayOutputStream(64)
            encodeRecord(sub, f.sub, rowValues(e), -1)
            writeDelimited(out, f.number, sub.toByteArray)
          }
          case _ => // packed numeric run: one tag, one length, concatenated values
            val run = new java.io.ByteArrayOutputStream(64)
            elems.foreach(e => writeScalar(run, f.ptype, e))
            writeDelimited(out, f.number, run.toByteArray)
        }
      } else if (f.ptype == "message") {
        if (v != null) {
          val sub = new java.io.ByteArrayOutputStream(64)
          encodeRecord(sub, f.sub, rowValues(v), -1)
          writeDelimited(out, f.number, sub.toByteArray)
        }
      } else {
        // oneof members have explicit presence: a SET (non-null)
        // member serializes even at its default value (the spec's
        // oneof rule — presence must survive the round trip)
        val dflt = v == null || (f.oneof.isEmpty && (f.ptype match {
          case "int64" | "sint64" | "uint64" | "fixed64" | "sfixed64" |
               "uint32" | "fixed32" => v.asInstanceOf[Long] == 0L
          case "enum" | "int32" | "sint32" | "sfixed32" => v.asInstanceOf[Int] == 0
          case "double" => java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]) == 0L
          case "float"  => java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]) == 0
          case "bool"   => !v.asInstanceOf[Boolean]
          case "string" => v.asInstanceOf[String].isEmpty
          case "bytes"  => v.asInstanceOf[Array[Byte]].isEmpty
        }))
        if (!dflt) f.ptype match {
          case "int64" | "sint64" | "bool" | "enum" | "int32" | "sint32" |
               "uint32" | "uint64" =>
            writeTag(out, f.number, 0); writeScalar(out, f.ptype, v)
          case "double" | "fixed64" | "sfixed64" =>
            writeTag(out, f.number, 1); writeScalar(out, f.ptype, v)
          case "float" | "fixed32" | "sfixed32" =>
            writeTag(out, f.number, 5); writeScalar(out, f.ptype, v)
          case "string" =>
            writeDelimited(out, f.number,
              v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case "bytes"  => writeDelimited(out, f.number, v.asInstanceOf[Array[Byte]])
        }
      }
      if (f.number <= markAfterField) mark = out.size()
    }
    mark
  }

  /** A message value arrives as a Spark Row or (from specs) a plain
    * Seq/tuple product — normalize to the sub-field value sequence.
    */
  private def rowValues(v: Any): Seq[Any] = v match {
    case r: Row => r.toSeq
    case s: scala.collection.Seq[_] => s.toSeq
    case p: Product => p.productIterator.toSeq
    case other => throw new IllegalArgumentException(
      s"message value is not a Row/Seq/Product: ${other.getClass}")
  }

  /** Parse one record; `slots` is filled by field number (unknown
    * numbers skipped by wire type — the proto3 forward-compat
    * contract).  Throws on malformed bytes (truncated varint, length
    * overrun) — which, per the spec, can only happen on truncation
    * INSIDE a field, never at a field boundary.  Repeated numeric
    * fields accept BOTH packed runs and expanded per-tag elements
    * (the spec's decoder requirement); a singular message field
    * appearing more than once MERGES per the spec (later scalar
    * occurrences overwrite, which falls out of decoding the later
    * payload into the same slot array).
    */
  private[graft] def decodeRecord(bytes: Array[Byte], fields: Seq[ProtoField]): Array[Any] = {
    val slots = freshSlots(fields)
    decodeInto(bytes, fields, slots)
    finishSlots(fields, slots)
  }

  /** Working slots during a parse: repeated → ArrayBuffer, message →
    * null-until-seen Array[Any] of its own slots, scalar → default.
    */
  private def freshSlots(fields: Seq[ProtoField]): Array[Any] = {
    val out = new Array[Any](fields.length)
    fields.zipWithIndex.foreach { case (f, i) =>
      out(i) =
        if (f.repeated) scala.collection.mutable.ArrayBuffer.empty[Any]
        else if (f.ptype == "map") scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        else if (f.ptype == "message") null
        // oneof members have explicit presence: unset ⇒ null, not the
        // scalar default (proto3's oneof case observability)
        else if (f.oneof.isDefined) null
        else scalarDefault(f.ptype)
    }
    out
  }

  private def scalarDefault(ptype: String): Any = ptype match {
    case "int64" | "sint64" | "uint64" | "fixed64" | "sfixed64" |
         "uint32" | "fixed32" => 0L
    case "enum" | "int32" | "sint32" | "sfixed32" => 0
    case "double" => 0.0
    case "float"  => 0.0f
    case "bool"   => false
    case "string" => ""
    case "bytes"  => Array.emptyByteArray
  }

  /** Convert working slots to the Spark-facing record values. */
  private def finishSlots(fields: Seq[ProtoField], slots: Array[Any]): Array[Any] = {
    val out = new Array[Any](fields.length)
    fields.zipWithIndex.foreach { case (f, i) =>
      out(i) =
        if (f.repeated) {
          val buf = slots(i).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
          if (f.ptype == "message")
            buf.map(s => Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
              finishSlots(f.sub, s.asInstanceOf[Array[Any]])))).toSeq
          else buf.toSeq
        } else if (f.ptype == "map") {
          slots(i).asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]].toMap
        } else if (f.ptype == "message") {
          if (slots(i) == null) null
          else Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
            finishSlots(f.sub, slots(i).asInstanceOf[Array[Any]])))
        } else slots(i)
    }
    out
  }

  private def decodeInto(bytes: Array[Byte], fields: Seq[ProtoField],
      slots: Array[Any]): Unit = {
    val byNumber = fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
    // oneof last-member-wins: setting a member clears its group mates
    // (to null — unset presence), EXCEPT itself, so a re-occurrence of
    // the SAME message member still merges per the spec
    def clearMates(f: ProtoField, i: Int): Unit = f.oneof.foreach { g =>
      fields.zipWithIndex.foreach { case (m, j) =>
        if (j != i && m.oneof.contains(g)) slots(j) = null
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
    def readScalar(ptype: String): Any = ptype match {
      case "int64" | "uint64" => readVarint()
      case "sint64" => zigzagDecode(readVarint())
      case "bool"   => readVarint() != 0L
      // enum/int32: parsers take the LOWER 32 BITS of the varint (the
      // spec's int32 truncation rule); unknown enums come through as-is
      case "enum" | "int32" => readVarint().toInt
      case "sint32" =>
        val u = readVarint().toInt // low 32 bits, the 32-bit zigzag domain
        (u >>> 1) ^ -(u & 1)
      case "uint32" => readVarint() & 0xffffffffL
      case "fixed64" | "sfixed64" => readLe(8)
      case "fixed32" => readLe(4) // 4 LE bytes: already the unsigned value
      case "sfixed32" => readLe(4).toInt
      case "double" => java.lang.Double.longBitsToDouble(readLe(8))
      case "float"  => java.lang.Float.intBitsToFloat(readLe(4).toInt)
    }
    def readDelimited(number: Int, what: String): Int = {
      val len = readVarint().toInt
      require(pos + len <= bytes.length, s"$what field $number overruns payload")
      len
    }
    def scalarWt(ptype: String): Int = ptype match {
      case "int64" | "sint64" | "bool" | "enum" | "int32" | "sint32" |
           "uint32" | "uint64" => 0
      case "double" | "fixed64" | "sfixed64" => 1
      case "float" | "fixed32" | "sfixed32"  => 5
    }
    while (pos < bytes.length) {
      val tag = readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(number) match {
        case Some((f, i)) if f.repeated =>
          val buf = slots(i).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
          f.ptype match {
            case "string" =>
              require(wt == 2, s"field $number: wire type $wt, want length-delimited")
              val len = readDelimited(number, "string")
              buf += new String(bytes, pos, len, java.nio.charset.StandardCharsets.UTF_8); pos += len
            case "bytes" =>
              require(wt == 2, s"field $number: wire type $wt, want length-delimited")
              val len = readDelimited(number, "bytes")
              buf += java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len
            case "message" =>
              require(wt == 2, s"field $number: wire type $wt, want length-delimited")
              val len = readDelimited(number, "message")
              val sub = freshSlots(f.sub)
              decodeInto(java.util.Arrays.copyOfRange(bytes, pos, pos + len), f.sub, sub)
              buf += sub; pos += len
            case p =>
              if (wt == 2) { // packed run: elements until the length is consumed
                val len = readDelimited(number, "packed")
                val end = pos + len
                while (pos < end) buf += readScalar(p)
                require(pos == end, s"packed field $number overran its length")
              } else {       // expanded: one element under its scalar wire type
                require(wt == scalarWt(p), s"field $number: wire type $wt, want ${scalarWt(p)} or packed")
                buf += readScalar(p)
              }
          }
        case Some((f, i)) if f.ptype == "map" =>
          require(wt == 2, s"field $number: wire type $wt, want length-delimited")
          val len = readDelimited(number, "map entry")
          // each entry is a fresh synthetic message: absent key/value
          // decode to their defaults, a later duplicate key OVERWRITES
          // (the spec's last-one-wins map merge)
          val sub = freshSlots(f.sub)
          decodeInto(java.util.Arrays.copyOfRange(bytes, pos, pos + len), f.sub, sub)
          val kv = finishSlots(f.sub, sub)
          // message-typed value absent from the entry ⇒ the DEFAULT
          // INSTANCE (the parsers' map contract), never a null value
          val vv =
            if (kv(1) == null && f.sub(1).ptype == "message")
              Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
                finishSlots(f.sub(1).sub, freshSlots(f.sub(1).sub))))
            else kv(1)
          slots(i).asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
            .put(kv(0), vv)
          pos += len
        case Some((f, i)) if f.ptype == "message" =>
          require(wt == 2, s"field $number: wire type $wt, want length-delimited")
          val len = readDelimited(number, "message")
          clearMates(f, i)
          // spec merge: decode into the EXISTING sub-slots so later
          // occurrences overwrite scalars and append to repeated
          val sub = if (slots(i) == null) freshSlots(f.sub) else slots(i).asInstanceOf[Array[Any]]
          decodeInto(java.util.Arrays.copyOfRange(bytes, pos, pos + len), f.sub, sub)
          slots(i) = sub; pos += len
        case Some((f, i)) =>
          clearMates(f, i)
          f.ptype match {
          case "int64" | "sint64" | "bool" | "enum" | "int32" | "sint32" |
               "uint32" | "uint64" =>
            require(wt == 0, s"field $number: wire type $wt, want varint"); slots(i) = readScalar(f.ptype)
          case "double" | "fixed64" | "sfixed64" =>
            require(wt == 1, s"field $number: wire type $wt, want fixed64")
            slots(i) = readScalar(f.ptype)
          case "float" | "fixed32" | "sfixed32" =>
            require(wt == 5, s"field $number: wire type $wt, want fixed32")
            slots(i) = readScalar(f.ptype)
          case "string" =>
            require(wt == 2, s"field $number: wire type $wt, want length-delimited")
            val len = readDelimited(number, "string")
            slots(i) = new String(bytes, pos, len, java.nio.charset.StandardCharsets.UTF_8); pos += len
          case "bytes"  =>
            require(wt == 2, s"field $number: wire type $wt, want length-delimited")
            val len = readDelimited(number, "bytes")
            slots(i) = java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len
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
