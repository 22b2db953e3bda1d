package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.ProtoCodec

/** Pins the proto3 wire format against the PUBLISHED spec examples
  * (protobuf.dev/programming-guides/encoding), the proto3 default/
  * absence semantics, and the silent boundary-truncation behavior the
  * msg_decode_proto contrast is built on.
  */
class ProtoCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private def encodeOne(schema: String, values: Any*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ProtoCodec.encodeRecord(out, ProtoCodec.parseSchema(schema), values.toSeq, -1)
    out.toByteArray
  }

  test("golden wire vectors match the published protobuf encoding examples") {
    // the spec's own worked example: field 1 varint 150 -> 08 96 01
    assert(hex(encodeOne("1:a:int64", 150L)) === "089601")
    // field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
    assert(hex(encodeOne("2:b:string", "testing")) === "120774657374696e67")
    // combined record, ascending field order
    assert(hex(encodeOne("1:a:int64,2:b:string", 150L, "testing")) ===
      "089601120774657374696e67")
    // double 1.5 at field 4: tag (4<<3|1)=0x21, IEEE bits little-endian
    assert(hex(encodeOne("4:v:double", 1.5)) === "21000000000000f83f")
    // bool true at field 3: tag 0x18, varint 1
    assert(hex(encodeOne("3:f:bool", true)) === "1801")
    // 10-byte varint for a negative int64 (two's complement, spec rule)
    assert(hex(encodeOne("1:a:int64", -2L)).length === 2 * 11) // tag + 10 bytes
  }

  test("zigzag matches the spec's sint table") {
    val table = Seq(0L -> 0L, -1L -> 1L, 1L -> 2L, -2L -> 3L,
      2147483647L -> 4294967294L, -2147483648L -> 4294967295L)
    table.foreach { case (n, z) =>
      assert(ProtoCodec.zigzagEncode(n) === z, s"encode $n")
      assert(ProtoCodec.zigzagDecode(z) === n, s"decode $z")
    }
    // sint64 -1 encodes in ONE payload byte where int64 -1 takes ten
    assert(hex(encodeOne("1:a:sint64", -1L)) === "0801")
  }

  test("proto3 default elision: default and null values produce an empty payload") {
    val schema = "1:a:int64,2:b:string,3:c:double,4:d:bool,5:e:bytes"
    assert(encodeOne(schema, 0L, "", 0.0, false, Array.emptyByteArray).isEmpty)
    assert(encodeOne(schema, null, null, null, null, null).isEmpty)
    // -0.0 has nonzero bits and IS serialized (bit-level default check)
    assert(encodeOne("3:c:double", -0.0).nonEmpty)
  }

  test("decode fills absent fields with proto3 defaults, never nulls") {
    val schema = "1:a:int64,2:b:string,3:c:double,4:d:bool"
    val rec = ProtoCodec.decodeRecord(Array.emptyByteArray, ProtoCodec.parseSchema(schema))
    assert(rec.toSeq === Seq(0L, "", 0.0, false))
  }

  test("unknown field numbers are skipped by wire type (forward compatibility)") {
    val writer = "1:a:int64,2:b:string,3:c:double,4:e:bytes"
    val bytes = encodeOne(writer, 42L, "keepme", 2.5, Array[Byte](1, 2, 3))
    // reader schema lacks fields 2 and 4 — both length-delimited skips
    val rec = ProtoCodec.decodeRecord(bytes, ProtoCodec.parseSchema("1:a:int64,3:c:double"))
    assert(rec.toSeq === Seq(42L, 2.5))
  }

  test("truncation INSIDE a field throws; truncation AT a field boundary is silent") {
    val schema = "1:a:int64,2:b:string"
    val bytes = encodeOne(schema, 150L, "testing")
    // cut mid-string: the declared length overruns the payload
    intercept[IllegalArgumentException] {
      ProtoCodec.decodeRecord(bytes.take(bytes.length - 2), ProtoCodec.parseSchema(schema))
    }
    // cut exactly after field 1 (3 bytes): decodes cleanly, b at default
    val rec = ProtoCodec.decodeRecord(bytes.take(3), ProtoCodec.parseSchema(schema))
    assert(rec.toSeq === Seq(150L, ""))
  }

  test("nested + packed golden vectors match the published encoding examples") {
    // the spec's Test3 worked example: message field 3 wrapping
    // Test1{a=150} -> 1a 03 08 96 01
    assert(hex(encodeOne("3:c:{1:a:int64}", org.apache.spark.sql.Row(150L))) === "1a03089601")
    // the spec's Test5 packed example: repeated field 6, values
    // 3, 270, 86942 -> 32 06 03 8e 02 9e a7 05
    assert(hex(encodeOne("6:f:int64[]", Seq(3L, 270L, 86942L))) === "3206038e029ea705")
    // repeated string (not packable): one length-delimited element per tag
    assert(hex(encodeOne("4:d:string[]", Seq("hi", "yo"))) === "220268692202796f")
    // empty repeated and NULL message are omitted; PRESENT all-default
    // message writes its zero-length presence (proto3 message presence)
    // (parseSchema sorts by field number: 3:c first, then 6:f)
    assert(encodeOne("6:f:int64[],3:c:{1:a:int64}", null, Seq.empty[Long]).isEmpty)
    assert(hex(encodeOne("3:c:{1:a:int64}", org.apache.spark.sql.Row(0L))) === "1a00")
  }

  test("repeated decode accepts both packed and expanded forms; message fields merge") {
    val rep = ProtoCodec.parseSchema("6:f:int64[]")
    def dec(hex: String) = ProtoCodec.decodeRecord(
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, rep)
    // packed run (the encoder's form)
    assert(dec("3206038e029ea705")(0) === Seq(3L, 270L, 86942L))
    // expanded per-tag form (tag 0x30 = field 6 wt 0), interleavable
    assert(dec("3003308e02")(0) === Seq(3L, 270L))
    // mixed: expanded element then a packed run appends in order
    assert(dec("300132039ea705")(0) === Seq(1L, 86942L))
    // singular message occurring twice MERGES: later scalars overwrite,
    // earlier fields persist (the spec's concatenation semantics)
    val msg = ProtoCodec.parseSchema("3:c:{1:a:int64;2:b:string}")
    val out = new java.io.ByteArrayOutputStream()
    // occurrence 1: a=5, b="x"; occurrence 2: a=7 only
    ProtoCodec.encodeRecord(out, msg, Seq(org.apache.spark.sql.Row(5L, "x")), -1)
    ProtoCodec.encodeRecord(out, msg, Seq(org.apache.spark.sql.Row(7L, "")), -1)
    val merged = ProtoCodec.decodeRecord(out.toByteArray, msg)(0)
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(merged.getLong(0) === 7L, "later occurrence overwrites the scalar")
    assert(merged.getString(1) === "x", "absent-in-later field persists from the earlier occurrence")
  }

  test("enum fields: varint wire form, open-enum unknown values, negative 10-byte rule") {
    // an enum value rides exactly like the spec's Test1 varint:
    // field 1 value 150 -> 08 96 01 (enums ARE int32 varints)
    assert(hex(encodeOne("1:e:enum", 150)) === "089601")
    // default 0 elides; decode restores 0
    assert(encodeOne("1:e:enum", 0).isEmpty)
    assert(ProtoCodec.decodeRecord(Array.emptyByteArray,
      ProtoCodec.parseSchema("1:e:enum")).toSeq === Seq(0))
    // proto3 open enum: a value no generated code knows (99) survives
    // decode as its integer — unknown-value-preserved
    val rec = ProtoCodec.decodeRecord(encodeOne("1:e:enum", 99),
      ProtoCodec.parseSchema("1:e:enum"))
    assert(rec.toSeq === Seq(99))
    // negative enum values sign-extend to 64 bits -> 10 varint bytes
    // (the spec's negative-enum rule), and truncate back on decode
    val neg = encodeOne("1:e:enum", -2)
    assert(hex(neg).length === 2 * 11, s"tag + 10 bytes, got ${hex(neg)}")
    assert(ProtoCodec.decodeRecord(neg, ProtoCodec.parseSchema("1:e:enum")).toSeq === Seq(-2))
    // repeated enum packs like any numeric scalar
    assert(hex(encodeOne("6:es:enum[]", Seq(3, 270, 86942))) === "3206038e029ea705")
    assert(ProtoCodec.decodeRecord(encodeOne("6:es:enum[]", Seq(3, 270, 86942)),
      ProtoCodec.parseSchema("6:es:enum[]"))(0) === Seq(3, 270, 86942))
  }

  test("map fields: synthetic (key=1,value=2) entry encoding, defaults, last-one-wins") {
    // derived from the spec's map rule (maps == repeated entry
    // messages): field 7 map<string,int64> {"abc" -> 150}:
    //   tag 7<<3|2 = 0x3a, entry len 8,
    //   key: tag 0x0a len 3 'abc'; value: tag 0x10 varint 150
    assert(hex(encodeOne("7:m:map<string,int64>", Map("abc" -> 150L)))
      === "3a080a03616263109601")
    // empty and null maps are omitted; decode restores the empty map
    assert(encodeOne("7:m:map<string,int64>", Map.empty[String, Long]).isEmpty)
    assert(encodeOne("7:m:map<string,int64>", null).isEmpty)
    assert(ProtoCodec.decodeRecord(Array.emptyByteArray,
      ProtoCodec.parseSchema("7:m:map<string,int64>"))(0) === Map.empty[String, Long])
    // default key and default value each elide INSIDE their entry and
    // decode back to defaults — {"": 5} and {"k": 0} both round-trip
    val schema = ProtoCodec.parseSchema("7:m:map<string,int64>")
    assert(ProtoCodec.decodeRecord(
      encodeOne("7:m:map<string,int64>", Map("" -> 5L, "k" -> 0L)), schema)(0)
      === Map("" -> 5L, "k" -> 0L))
    // duplicate key on the wire: LAST one wins (the spec's map merge) —
    // two entries for "a" hand-concatenated
    val out = new java.io.ByteArrayOutputStream()
    out.write(encodeOne("7:m:map<string,int64>", Map("a" -> 1L)))
    out.write(encodeOne("7:m:map<string,int64>", Map("a" -> 9L, "b" -> 2L)))
    assert(ProtoCodec.decodeRecord(out.toByteArray, schema)(0) === Map("a" -> 9L, "b" -> 2L))
    // int64 keys and double values work; bool keys too
    assert(ProtoCodec.decodeRecord(
      encodeOne("1:m:map<int64,double>", Map(7L -> 2.5, 0L -> 0.0)),
      ProtoCodec.parseSchema("1:m:map<int64,double>"))(0) === Map(7L -> 2.5, 0L -> 0.0))
    // parser rejections: repeated map, float key, message value, depth
    assert(intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("1:m:map<string,int64>[]")
    }.getMessage.contains("cannot be repeated"))
    assert(intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("1:m:map<double,int64>")
    }.getMessage.contains("illegal map key type"))
    // depth bound holds THROUGH the map value message: its sub-fields
    // are scalar-only, like any depth-1 message
    assert(intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("1:m:map<string,{1:a:{1:b:int64}}>")
    }.getMessage.contains("map fields are top-level only") ||
      intercept[IllegalArgumentException] {
        ProtoCodec.parseSchema("1:m:map<string,{1:a:{1:b:int64}}>")
      }.getMessage.contains("nested messages"))
  }

  test("map with message-typed values: the bounded depth-2 case") {
    // field 7 map<string,{1:n:int64}> {"ab" -> {n: 1}}: entry is
    //   key: 0a 02 'ab'; value: tag 12, len 2, inner 08 01
    val schema = "7:m:map<string,{1:n:int64;2:tag:string}>"
    val fields = ProtoCodec.parseSchema(schema)
    assert(hex(encodeOne("7:m:map<string,{1:n:int64}>", Map("ab" -> Seq(1L))))
      === "3a080a0261621202" + "0801")
    // absent VALUE field in an entry decodes to the DEFAULT INSTANCE
    // (never a null value) — hand-built entry with only the key
    val keyOnly = Array[Byte](0x3a, 0x04, 0x0a, 0x02, 0x61, 0x62)
    val m = ProtoCodec.decodeRecord(keyOnly, fields)(0)
      .asInstanceOf[Map[String, org.apache.spark.sql.Row]]
    assert(m("ab") === org.apache.spark.sql.Row(0L, ""))
    // full round trip with a non-default message value, last-one-wins
    val out = new java.io.ByteArrayOutputStream()
    out.write(encodeOne(schema, Map("k" -> Seq(1L, "x"))))
    out.write(encodeOne(schema, Map("k" -> Seq(9L, "y"), "j" -> Seq(0L, ""))))
    val merged = ProtoCodec.decodeRecord(out.toByteArray, fields)(0)
      .asInstanceOf[Map[String, org.apache.spark.sql.Row]]
    assert(merged === Map(
      "k" -> org.apache.spark.sql.Row(9L, "y"),
      "j" -> org.apache.spark.sql.Row(0L, "")))
    // the Spark type carries the struct as the map value
    val mt = ProtoCodec.sparkSchema(fields)("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.MapType]
    assert(mt.valueType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(!mt.valueContainsNull)
  }

  test("oneof: wire-plain members, last-wins decode, presence at defaults") {
    val schema = "1:id:int64,2:email:string@contact,3:phone:sint64@contact"
    val fields = ProtoCodec.parseSchema(schema)
    // members are ordinary wire fields; a SET member serializes even
    // at its default value (explicit presence): email = "" writes
    // tag 0x12 len 0 where a plain string field would elide
    assert(hex(encodeOne(schema, 0L, "", null)) === "1200")
    assert(hex(encodeOne(schema, 0L, null, 0L)) === "1800")
    // unset group: both members decode to null (not scalar defaults)
    val none = ProtoCodec.decodeRecord(Array.emptyByteArray, fields)
    assert(none(1) == null && none(2) == null)
    // round trip preserves which member is set, including at defaults
    val rt = ProtoCodec.decodeRecord(encodeOne(schema, 7L, "", null), fields)
    assert(rt.toSeq === Seq(7L, "", null))
    // LAST member seen on the wire wins and clears its mates
    val out = new java.io.ByteArrayOutputStream()
    out.write(encodeOne(schema, 0L, "a@b", null))
    out.write(encodeOne(schema, 0L, null, -3L))
    assert(ProtoCodec.decodeRecord(out.toByteArray, fields).toSeq === Seq(0L, null, -3L))
    // ...in either order
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(encodeOne(schema, 0L, null, -3L))
    out2.write(encodeOne(schema, 0L, "a@b", null))
    assert(ProtoCodec.decodeRecord(out2.toByteArray, fields).toSeq === Seq(0L, "a@b", null))
    // two set members in one row is a data bug the encoder rejects
    assert(intercept[IllegalArgumentException] {
      encodeOne(schema, 0L, "a@b", 5L)
    }.getMessage.contains("more than one member"))
    // parser rejections: repeated / map members (spec rules)
    assert(intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("2:xs:int64[]@g")
    }.getMessage.contains("cannot be repeated"))
    assert(intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("2:m:map<string,int64>@g")
    }.getMessage.contains("cannot be maps"))
    // message members carry presence through a zero-length write, and
    // a re-occurrence of the SAME member merges while a mate clears it
    val ms = "2:addr:{1:street:string;2:zip:int64}@loc,3:code:int64@loc"
    val mf = ProtoCodec.parseSchema(ms)
    assert(hex(encodeOne(ms, org.apache.spark.sql.Row("", 0L), null)) === "1200")
    val out3 = new java.io.ByteArrayOutputStream()
    out3.write(encodeOne(ms, org.apache.spark.sql.Row("elm", 0L), null))
    out3.write(encodeOne(ms, org.apache.spark.sql.Row("", 42L), null))
    // same-member merge: later zip overwrites, earlier street survives
    assert(ProtoCodec.decodeRecord(out3.toByteArray, mf).toSeq ===
      Seq(org.apache.spark.sql.Row("elm", 42L), null))
    val out4 = new java.io.ByteArrayOutputStream()
    out4.write(encodeOne(ms, org.apache.spark.sql.Row("elm", 7L), null))
    out4.write(encodeOne(ms, null, 5L))
    out4.write(encodeOne(ms, org.apache.spark.sql.Row("", 42L), null))
    // a mate in between CLEARS the message member: no merge with "elm"
    assert(ProtoCodec.decodeRecord(out4.toByteArray, mf).toSeq ===
      Seq(org.apache.spark.sql.Row("", 42L), null))
  }

  test("completed scalar matrix: 32-bit varints, unsigned ranges, fixed-width family") {
    // int32: negatives sign-extend to the 10-byte varint (spec rule),
    // decode truncates back to the low 32 bits
    assert(hex(encodeOne("1:a:int32", -2)).length === 2 * 11)
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:int32", -2),
      ProtoCodec.parseSchema("1:a:int32")).toSeq === Seq(-2))
    // sint32: 32-bit zigzag — -2 is ONE payload byte (0x03)
    assert(hex(encodeOne("1:a:sint32", -2)) === "0803")
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:sint32", Int.MinValue),
      ProtoCodec.parseSchema("1:a:sint32")).toSeq === Seq(Int.MinValue))
    // uint32 rides a long column for its full unsigned range
    assert(hex(encodeOne("1:a:uint32", 4294967295L)) === "08ffffffff0f")
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:uint32", 4294967295L),
      ProtoCodec.parseSchema("1:a:uint32")).toSeq === Seq(4294967295L))
    assert(intercept[IllegalArgumentException] {
      encodeOne("1:a:uint32", 4294967296L)
    }.getMessage.contains("out of range"))
    // uint64 shares int64's wire bits: the column long REINTERPRETS
    // as unsigned (-1L ⇔ 2^64-1, the 10-byte all-ones varint)
    assert(hex(encodeOne("1:a:uint64", -1L)) === hex(encodeOne("1:a:int64", -1L)))
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:uint64", -1L),
      ProtoCodec.parseSchema("1:a:uint64")).toSeq === Seq(-1L))
    // fixed-width family: little-endian, wire types 1 and 5
    assert(hex(encodeOne("1:a:fixed64", 1L)) === "090100000000000000")
    assert(hex(encodeOne("1:a:sfixed64", -1L)) === "09ffffffffffffffff")
    assert(hex(encodeOne("1:a:fixed32", 1L)) === "0d01000000")
    assert(hex(encodeOne("1:a:sfixed32", -1)) === "0dffffffff")
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:fixed32", 4294967295L),
      ProtoCodec.parseSchema("1:a:fixed32")).toSeq === Seq(4294967295L))
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:sfixed32", -7),
      ProtoCodec.parseSchema("1:a:sfixed32")).toSeq === Seq(-7))
    assert(ProtoCodec.decodeRecord(encodeOne("1:a:sfixed64", Long.MinValue),
      ProtoCodec.parseSchema("1:a:sfixed64")).toSeq === Seq(Long.MinValue))
    // defaults elide for every new kind; absent decodes to the default
    val all = "1:a:int32,2:b:sint32,3:c:uint32,4:d:uint64," +
      "5:e:fixed64,6:f:sfixed64,7:g:fixed32,8:h:sfixed32"
    assert(encodeOne(all, 0, 0, 0L, 0L, 0L, 0L, 0L, 0).isEmpty)
    assert(ProtoCodec.decodeRecord(Array.emptyByteArray,
      ProtoCodec.parseSchema(all)).toSeq === Seq(0, 0, 0L, 0L, 0L, 0L, 0L, 0))
    // packed repeated round trip across the family
    val rep = "1:xs:sint32[],2:ys:fixed32[],3:zs:sfixed64[]"
    val fields = ProtoCodec.parseSchema(rep)
    val vals = Seq(Seq(-1, 0, 7), Seq(1L, 4294967295L), Seq(-2L, 9L))
    val enc = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoCodec.encodeRecord(out, fields, vals, -1); out.toByteArray
    }
    assert(ProtoCodec.decodeRecord(enc, fields).toSeq === vals)
    // fixed64 works as a map key (any integral key is spec-legal) —
    // the content-hash → metadata map real topics carry
    val mk = ProtoCodec.parseSchema("1:m:map<fixed64,string>")
    val out = new java.io.ByteArrayOutputStream()
    ProtoCodec.encodeRecord(out, mk, Seq(Map(-1L -> "x")), -1)
    assert(ProtoCodec.decodeRecord(out.toByteArray, mk)(0) === Map(-1L -> "x"))
  }

  test("oneof + message-map DataFrame round trip, nullable columns") {
    import org.apache.spark.sql.Row
    val schema = "1:id:int64,2:email:string@c,3:phone:sint64@c," +
      "4:tags:map<string,{1:v:int64;2:s:string}>"
    val fields = ProtoCodec.parseSchema(schema)
    assert(ProtoCodec.sparkSchema(fields)("email").nullable)
    assert(ProtoCodec.sparkSchema(fields)("phone").nullable)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, "x@y", null, Map("a" -> Row(1L, "p"))),
        Row(2L, null, -9L, Map.empty[String, Row]),
        Row(3L, "", null, Map("" -> Row(0L, ""))),
        Row(4L, null, null, Map("k" -> Row(5L, ""))))),
      ProtoCodec.sparkSchema(fields))
    val back = ProtoCodec.fromProto(ProtoCodec.toProto(df, schema), schema)
      .collect().sortBy(_.getLong(0))
    assert(back(0).toSeq === Seq(1L, "x@y", null, Map("a" -> Row(1L, "p"))))
    assert(back(1).toSeq === Seq(2L, null, -9L, Map.empty[String, Row]))
    // row 3: email SET to "" — presence survives the round trip
    assert(back(2).toSeq === Seq(3L, "", null, Map("" -> Row(0L, ""))))
    assert(back(3).toSeq === Seq(4L, null, null, Map("k" -> Row(5L, ""))))
  }

  test("map + enum DataFrame round trip through toProto/fromProto") {
    import org.apache.spark.sql.Row
    val schema = "1:id:int64,2:status:enum,3:attrs:map<string,int64>"
    val fields = ProtoCodec.parseSchema(schema)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, 3, Map("x" -> 10L, "y" -> 0L)),
        Row(2L, 0, Map.empty[String, Long]),
        Row(3L, -7, Map("" -> 42L)))),
      ProtoCodec.sparkSchema(fields))
    val back = ProtoCodec.fromProto(ProtoCodec.toProto(df, schema), schema).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getMap[String, Long](2)))
      .sortBy(_._1)
    assert(back(0)._2 === 3 && back(0)._3 === Map("x" -> 10L, "y" -> 0L))
    assert(back(1)._2 === 0 && back(1)._3 === Map.empty[String, Long])
    assert(back(2)._2 === -7 && back(2)._3 === Map("" -> 42L))
  }

  test("a null element inside a repeated field fails loudly, naming the field") {
    val e = intercept[IllegalArgumentException] {
      encodeOne("2:tags:string[]", Seq("ok", null))
    }
    assert(e.getMessage.contains("tags") && e.getMessage.contains("null element"))
  }

  test("schema parser: depth-2 nesting and malformed braces are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      ProtoCodec.parseSchema("1:a:{1:b:{1:c:int64}}")
    }
    assert(e.getMessage.contains("one level"))
    intercept[IllegalArgumentException](ProtoCodec.parseSchema("1:a:{1:b:int64"))
    // repeated message and repeated scalar inside a message both parse
    val ok = ProtoCodec.parseSchema("1:tags:{1:k:string;2:vs:int64[]}[],2:n:int64")
    assert(ok.head.repeated && ok.head.ptype === "message")
    assert(ok.head.sub(1).repeated && ok.head.sub(1).ptype === "int64")
  }

  test("structured DataFrame round trip: nested struct + repeated columns survive") {
    import org.apache.spark.sql.Row
    val schema = "1:id:int64,2:tags:string[],3:loc:{1:lat:double;2:lon:double},4:ks:sint64[]"
    val fields = ProtoCodec.parseSchema(schema)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, Seq("a", "b"), Row(1.5, -2.5), Seq(-1L, 3L)),
        Row(2L, Seq.empty[String], null, Seq.empty[Long]),
        Row(3L, Seq("z"), Row(0.0, 0.0), Seq(0L)))),
      ProtoCodec.sparkSchema(fields))
    val back = ProtoCodec.fromProto(ProtoCodec.toProto(df, schema), schema).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), Option(r.getStruct(2)).map(s => (s.getDouble(0), s.getDouble(1))), r.getSeq[Long](3)))
      .sortBy(_._1)
    assert(back(0) === ((1L, Seq("a", "b"), Some((1.5, -2.5)), Seq(-1L, 3L))))
    // empty repeated comes back EMPTY (not null); absent message comes back NULL
    assert(back(1) === ((2L, Seq(), None, Seq())))
    // present all-default message survives as present (zero-length wire)
    assert(back(2) === ((3L, Seq("z"), Some((0.0, 0.0)), Seq(0L))))
  }

  test("cross-generation: an old flat reader skips new structured fields; a new reader defaults old payloads") {
    import org.apache.spark.sql.Row
    val newSchema = "1:id:int64,2:tags:string[],3:loc:{1:lat:double;2:lon:double}"
    val oldSchema = "1:id:int64"
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(9L, Seq("t1", "t2"), Row(3.25, -4.5)))),
      ProtoCodec.sparkSchema(ProtoCodec.parseSchema(newSchema)))
    // old reader on new bytes: unknown length-delimited fields skip cleanly
    val old = ProtoCodec.fromProto(ProtoCodec.toProto(df, newSchema), oldSchema).head
    assert(old.getLong(0) === 9L)
    // new reader on old bytes: repeated -> empty, message -> null
    val oldDf = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(Row(9L))),
      ProtoCodec.sparkSchema(ProtoCodec.parseSchema(oldSchema)))
    val neu = ProtoCodec.fromProto(ProtoCodec.toProto(oldDf, oldSchema), newSchema).head
    assert(neu.getLong(0) === 9L)
    assert(neu.getSeq[String](1) === Seq())
    assert(neu.isNullAt(2))
  }

  test("DataFrame round trip is the identity on the record fields") {
    import EventOps.{EventProtoSchema => S}
    val ev = graft.sources.Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
    val back = ProtoCodec.fromProto(ProtoCodec.toProto(ev, S), S)
    val a = ev.withColumn("props", coalesce(col("props"), lit(""))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    val b = back.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(a === b)
  }

  test("wire_mark truncation loses exactly the fields above the mark, silently") {
    import EventOps.{EventProtoSchema => S}
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
      .filter(col("event_id") < 50)
    val wire = ProtoCodec.toProto(ev, S, keep = Nil, markAfterField = 3)
    val torn = wire.withColumn("proto_payload",
      expr("substring(proto_payload, 1, wire_mark)"))
    val dec = ProtoCodec.fromProto(torn, S).collect()
    assert(dec.nonEmpty)
    dec.foreach { r =>
      assert(r.getDouble(3) === 0.0, "value must decode to the proto3 default")
      assert(r.getString(4) === "", "props must decode to the proto3 default")
    }
    // fields below the mark survive exactly
    val want = ev.select(col("event_id"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(dec.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted === want)
  }

  test("confluent proto framing: header bytes, cross-generation decode, unknown-id fault") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = "1:k:int64,2:v:double"
    val df = spark.createDataFrame(
      java.util.List.of(Row(150L, 1.5)),
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))))
    // first-message short form: magic 0, BE id, single 0x00, then body
    val framed = ProtoCodec.frameConfluent(ProtoCodec.toProto(df, schema), 0x0A0B0C0D)
      .collect()(0).getAs[Array[Byte]]("proto_payload")
    assert(framed.take(6).toSeq === Seq[Byte](0, 0x0a, 0x0b, 0x0c, 0x0d, 0))
    assert(hex(framed.drop(6)) === hex(encodeOne(schema, 150L, 1.5)))
    // nested message path [1, 2]: zigzag varints (2 -> 4, 1 -> 2, 2 -> 4)
    val nested = ProtoCodec.frameConfluent(ProtoCodec.toProto(df, schema), 7, Seq(1, 2))
      .collect()(0).getAs[Array[Byte]]("proto_payload")
    assert(nested.slice(5, 8).toSeq === Seq[Byte](4, 2, 4))
    // round trip through both index forms; a v2 writer's extra field
    // skips structurally (proto3 IS the resolution mechanism)
    val w2 = "1:k:int64,2:v:double,3:note:string"
    val df2 = spark.createDataFrame(
      java.util.List.of(Row(2L, 2.5, "x")),
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType),
        StructField("note", StringType))))
    val mixed = ProtoCodec.frameConfluent(ProtoCodec.toProto(df, schema), 7)
      .unionAll(ProtoCodec.frameConfluent(ProtoCodec.toProto(df2, w2), 9, Seq(1, 2)))
    val got = ProtoCodec.fromFramedProto(mixed, schema, Set(7, 9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got === Seq((2L, 2.5), (150L, 1.5)))
    val bad = intercept[org.apache.spark.SparkException] {
      ProtoCodec.fromFramedProto(
        ProtoCodec.frameConfluent(ProtoCodec.toProto(df, schema), 99),
        schema, Set(7)).collect()
    }
    assert(bad.getMessage.contains("registry") || bad.getCause.getMessage.contains("registry"))
  }

  test("msg_decode_proto groups stay the corpus event types — no _undecodable group can exist") {
    val got = EventOps.msgDecodeProto(spark, sf).collect()
    val types = graft.sources.Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).sorted
    assert(got.map(_.getString(0)).sorted === types)
    // the corruption branch is exercised at this SF and the torn rows'
    // value contribution is exactly zeroed
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.filter(col("event_id") % 97 === 0).count() > 0)
    val expected = ev.groupBy(col("event_type"))
      .agg(sum(when(col("event_id") % 97 === 0, lit(0.0)).otherwise(col("value"))
        .cast("decimal(18,2)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(2) === expected(r.getString(0)), r.getString(0)))
  }
}
