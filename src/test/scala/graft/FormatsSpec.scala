package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Formats, Tables}
import graft.streaming._

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val base = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.orderBy("event_id").collect().map(_.toString).toSet

  test("csv round-trips the event subset with an explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(base, dir)
    val back = Formats.readCsv(spark, dir, base.schema)
    assert(rows(back) === rows(base))
  }

  test("text-lines ingest: one doc per line, stable ids, provenance attached") {
    val dir = Files.createTempDirectory("graft-txt")
    Files.write(dir.resolve("a.txt"), "first doc\nsecond doc\nfirst doc\n".getBytes("UTF-8"))
    Files.write(dir.resolve("b.txt"), "third doc\n".getBytes("UTF-8"))
    val got = Formats.readTextLines(spark, dir.toString).collect()
    assert(got.length === 4)
    assert(got.map(_.getAs[String]("text")).sorted.toSeq ===
      Seq("first doc", "first doc", "second doc", "third doc"))
    // same (file, line) → same id; distinct lines/files → distinct ids
    val ids = got.map(r => (r.getAs[String]("text"),
      r.getAs[String]("src_file").split('/').last, r.getAs[Long]("doc_id")))
    assert(ids.filter(t => t._1 == "first doc").map(_._3).distinct.length === 1)
    assert(ids.map(_._3).distinct.length === 3)
    // stable across re-reads
    val again = Formats.readTextLines(spark, dir.toString).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(again === got.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("text-lines 128-bit ingest: independent id halves, stable, same doc_id as 64-bit") {
    val dir = Files.createTempDirectory("graft-txt128")
    Files.write(dir.resolve("a.txt"), "first doc\nsecond doc\nfirst doc\n".getBytes("UTF-8"))
    Files.write(dir.resolve("b.txt"), "third doc\n".getBytes("UTF-8"))
    val got = Formats.readTextLines128(spark, dir.toString).collect()
    assert(got.length === 4)
    // (doc_id, doc_id2) pairs: 3 distinct, intra-file identical lines share
    val pairs = got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("doc_id2")))
    assert(pairs.distinct.length === 3)
    // the second half is genuinely reseeded, not a copy of the first
    got.foreach(r => assert(r.getAs[Long]("doc_id") !== r.getAs[Long]("doc_id2")))
    // doc_id matches the 64-bit reader's, so the two ingests interoperate
    val doc64 = Formats.readTextLines(spark, dir.toString).collect()
      .map(r => r.getAs[String]("text") -> r.getAs[Long]("doc_id")).toMap
    got.foreach(r => assert(doc64(r.getAs[String]("text")) === r.getAs[Long]("doc_id")))
    // stable across re-reads
    val again = Formats.readTextLines128(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("doc_id2"))).sorted.toSeq
    assert(again === pairs.sorted.toSeq)
  }

  test("ingest_text128 audit equals a direct per-source count over documents") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Pipeline.ingestText128(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_id64"), r.getAs[Long]("n_id128")))
      .toMap
    val want = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("d"))
      .collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n"), r.getAs[Long]("d")))
      .toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (src, (n, d)) =>
      val (lines, id64, id128) = got(src)
      assert(lines === n, s"line count of $src")
      // one file per source ⇒ (file, line) distinctness ≡ distinct
      // texts; both id widths must resolve to it (collision-free at
      // this scale by the documented ~n²/2⁶⁵ bound)
      assert(id64 === d, s"64-bit ids of $src")
      assert(id128 === d, s"128-bit ids of $src")
    }
  }

  test("binaryFile ingest reads real files, prunes by glob, content-addresses them") {
    val dir = Files.createTempDirectory("graft-bin")
    val payloads = Map("a.img" -> "payload-alpha", "b.img" -> "payload-beta",
      "skip.txt" -> "not-an-image")
    payloads.foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes("UTF-8"))
    }
    val files = Formats.readBinaryFiles(spark, dir.toString, globFilter = "*.img")
    val ingested = graft.operators.Multimodal.ingestBinary(files).collect()
    assert(ingested.length === 2)
    val bySuffix = ingested.map(r =>
      r.getAs[String]("path").split('/').last -> r).toMap
    assert(bySuffix.keySet === Set("a.img", "b.img"))
    bySuffix.foreach { case (name, r) =>
      val want = payloads(name).getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") === want.length.toLong)
      assert(r.getAs[Array[Byte]]("payload").toSeq === want.toSeq)
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(want)
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("sha") === sha)
    }
    // ids are stable across re-listing (pure path hash)
    val again = graft.operators.Multimodal.ingestBinary(
      Formats.readBinaryFiles(spark, dir.toString, globFilter = "*.img"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again === ingested.map(_.getAs[Long]("doc_id")).toSet)
    // oversized files are excluded from ingest but REPORTED, not lost
    val tiny = Formats.readBinaryFiles(spark, dir.toString, "*.img", maxBytes = 12L)
    val dropped = Formats.oversizedFiles(spark, dir.toString, "*.img", maxBytes = 12L)
      .collect().map(r => r.getAs[String]("path").split('/').last).toSet
    assert(tiny.count() + dropped.size === 2)
    assert(dropped === Set("a.img"))   // "payload-alpha" is 13 bytes; beta is 12
  }

  test("jsonl round-trips the event subset with an explicit schema") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Formats.writeJsonl(base, dir)
    val back = Formats.readJsonl(spark, dir, base.schema)
    assert(rows(back) === rows(base))
  }

  test("orc round-trips the event subset and keeps predicate pushdown") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(base, dir)
    val back = Formats.readOrc(spark, dir, base.schema)
    assert(rows(back) === rows(base))
    // pushdown reaches the ORC scan like it does for parquet
    val p = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("event_type"), p.take(400))
  }

  // ---- WAV container codec (AudioCodec.wavBytes / parseWav fast path) ----

  /** Independent reference container: javax.sound's own writer (the
    * path the codec used before the registry-free fast path existed).
    */
  private def wavViaAudioSystem(data: Array[Byte], rate: Float, bits: Int,
      channels: Int, signed: Boolean): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, bits, channels, signed, false)
    val frames = data.length / (channels * (bits / 8))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream(data.length + 64)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("wavBytes is bit-identical to AudioSystem.write across the PCM matrix") {
    import graft.operators.AudioCodec
    val pcm16 = Array.tabulate[Byte](120)(i => ((i * 37 + 11) & 0xff).toByte)
    val pcm8 = Array.tabulate[Byte](61)(i => ((i * 53 + 7) & 0xff).toByte)
    // 16-bit mono 8k, 16-bit stereo 44.1k (both signed LE), 8-bit
    // unsigned mono 11025 — the three shapes the WAV spec defines for
    // integer PCM and the writer emits
    assert(AudioCodec.wavBytes(pcm16, 8000).sameElements(
      wavViaAudioSystem(pcm16, 8000f, 16, 1, signed = true)))
    assert(AudioCodec.wavBytes(pcm16, 44100, bits = 16, channels = 2).sameElements(
      wavViaAudioSystem(pcm16, 44100f, 16, 2, signed = true)))
    assert(AudioCodec.wavBytes(pcm8, 11025, bits = 8).sameElements(
      wavViaAudioSystem(pcm8, 11025f, 8, 1, signed = false)))
  }

  test("registry-free decode equals the AudioSystem decode it replaced") {
    import graft.operators.AudioCodec
    val pcm16 = Array.tabulate[Byte](240)(i => ((i * 31 + 3) & 0xff).toByte)
    val pcm8 = Array.tabulate[Byte](97)(i => ((i * 29 + 5) & 0xff).toByte)
    for ((bytes, viaAs) <- Seq(
        AudioCodec.wavBytes(pcm16, 8000) ->
          wavViaAudioSystem(pcm16, 8000f, 16, 1, signed = true),
        AudioCodec.wavBytes(pcm16, 44100, 16, 2) ->
          wavViaAudioSystem(pcm16, 44100f, 16, 2, signed = true),
        AudioCodec.wavBytes(pcm8, 11025, 8) ->
          wavViaAudioSystem(pcm8, 11025f, 8, 1, signed = false))) {
      // both containers byte-equal (previous test) — still decode both
      // independently: the fast path reads OUR bytes, the AudioSystem
      // bytes exercise the same parse on the reference writer's output
      val a = AudioCodec.decode(7L, bytes)
      val b = AudioCodec.decode(7L, viaAs)
      assert(a.isDefined && a === b)
      val sa = AudioCodec.decodeSamples(bytes)
      val sb = AudioCodec.decodeSamples(viaAs)
      assert(sa.isDefined)
      assert(sa.get._1 === sb.get._1)
      assert(sa.get._2.sameElements(sb.get._2))
    }
  }

  test("wav chunk walk: unknown chunks skip word-aligned; corrupt containers drop") {
    import graft.operators.AudioCodec
    val pcm = Array.tabulate[Byte](50)(i => (i * 13).toByte)
    val canonical = AudioCodec.wavBytes(pcm, 8000)
    // splice an odd-length LIST chunk between fmt and data: parsers
    // must skip sz + pad (the spec's word alignment), not sz
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes -> 1 pad byte
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(canonical, 0, 36) // RIFF..WAVE fmt(16)
    spliced.write("LIST".getBytes("US-ASCII"))
    spliced.write(Array[Byte](5, 0, 0, 0)); spliced.write(listBody); spliced.write(0)
    spliced.write(canonical, 36, canonical.length - 36) // data chunk onward
    val sp = spliced.toByteArray
    // (the stale RIFF size field is deliberate — the chunk walk never
    // consults it, same as javax.sound's reader)
    val expected = AudioCodec.decode(1L, canonical)
    assert(AudioCodec.decode(1L, sp) === expected)
    // truncated data chunk: declared length overruns the buffer
    assert(AudioCodec.decode(1L, canonical.dropRight(10)).isEmpty)
    // non-RIFF garbage neither parses nor throws
    assert(AudioCodec.decode(1L, Array.fill[Byte](64)(33)).isEmpty)
  }

  test("non-RIFF containers (aiff) still decode through the AudioSystem cold path") {
    import graft.operators.AudioCodec
    val pcm = Array.tabulate[Byte](120)(i => ((i * 37 + 11) & 0xff).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 60L)
    val baos = new java.io.ByteArrayOutputStream(256)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val viaAiff = AudioCodec.decode(3L, baos.toByteArray)
    val viaWav = AudioCodec.decode(3L, AudioCodec.wavBytes(pcm, 8000))
    // same PCM payload, same stats — AIFF is big-endian signed 16-bit,
    // so byte pairs swap: compare against a wav of the swapped payload
    val swapped = pcm.grouped(2).flatMap(p => Seq(p(1), p(0))).toArray
    val viaWavSwapped = AudioCodec.decode(3L, AudioCodec.wavBytes(swapped, 8000))
    assert(viaAiff.isDefined && viaWav.isDefined)
    assert(viaAiff === viaWavSwapped)
  }

  test("the frizzle pipeline runs unchanged over a csv transport") {
    val dir = Files.createTempDirectory("graft-csv-stream").toString
    Formats.writeCsv(base, dir)
    val ckpt = Files.createTempDirectory("graft-ckpt-csv").toString
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val source = FileMsgSource(dir, base.schema,
      df => df.select(col("event_id").cast("string").as("msg_id"),
        col("event_type").as("dest"), col("value")),
      Map("header" -> "true"), format = "csv")
    val q = Frizzle.runRouted(spark, source,
      Frizzle.Route(identity, isValid = col("value").isNotNull),
      dest = col("dest"),
      (df, dest, _) => { sink.merge(dest, df.count(), (a, b) => a + b); () },
      ckpt)
    q.awaitTermination(120000)
    assert(sink.values().stream().mapToLong(identity(_)).sum() === base.count())
    assert(sink.keySet().size === 5)
  }
}
