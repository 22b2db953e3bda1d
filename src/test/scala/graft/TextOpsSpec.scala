package graft

import org.apache.spark.sql.functions.{col, octet_length}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextOps}
import graft.sources.Tables

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("text stats cover every doc with sane values") {
    val rows = TextOps.textStats(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
  }

  test("lang_id is deterministic and covers every doc") {
    val a = TextOps.langId(spark, sf).collect().map(_.toString).toSeq
    val b = TextOps.langId(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.length === 500)
  }

  test("lang_id_ngram sees non-Latin scripts where the stopword profile is blind") {
    import spark.implicits._
    // a Russian sentence: no Latin stopword ever matches, so the
    // stopword profile scores every language 0 and its argmax
    // degenerates to the alphabetic tie-break ('zh') — misclassified.
    // The character-n-gram profile reads the Cyrillic directly.
    val docs = Seq(
      (1L, "при этом ого состояние ости важно и について ние обеспечение прать", "ru"),
      (2L, "the cat sat on the mat and the dog ate the bone of the day", "en"),
      (3L, "我 不 是 人 了 的 有 我 在 的 是 不 了", "zh"))
      .toDF("doc_id", "text", "lang")
    val stop = TextOps.langIdOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(stop(1L) !== "ru", "fixture must be one the stopword profile gets wrong")
    val ngram = TextOps.langIdNgramOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(ngram(1L) === "ru")
    assert(ngram(2L) === "en")
    assert(ngram(3L) === "zh")
    // and over the corpus: deterministic, total coverage (the lang_id contract)
    val a = TextOps.langIdNgram(spark, sf).collect().map(_.toString).toSeq
    assert(a.length === 500)
    assert(a === TextOps.langIdNgram(spark, sf).collect().map(_.toString).toSeq)
  }

  test("pii_scrub removes every match and counts agree with a local regex replay") {
    val rows = TextOps.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    val pat = java.util.regex.Pattern.compile(TextOps.PiiPattern)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_redactions") > 0)
      // nothing matchable survives in the scrubbed text
      assert(!pat.matcher(r.getAs[String]("clean").replace("<PII>", "")).find())
    }
    val raw = Tables.events(spark, sf).select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val m = pat.matcher(raw(r.getAs[Long]("event_id")))
      var c = 0
      while (m.find()) c += 1
      assert(r.getAs[Long]("n_redactions") === c)
    }
  }

  test("token histogram partitions the corpus and shares accumulate to 1") {
    val rows = TextOps.tokenHistogram(spark, sf).collect()
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split("\\s+").length.toLong)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === toks.length)
    assert(rows.map(_.getAs[Long]("tokens")).sum === toks.sum)
    rows.foreach(r => assert(r.getAs[Long]("bucket") % 32 === 0))
    val shares = rows.map(_.getAs[Double]("cum_share")).toSeq
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(math.abs(shares.last - 1.0) < 1e-12)
  }

  test("top terms agree with a locally computed document-frequency ranking") {
    val got = TextOps.topTerms(spark, sf).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df"))).toSeq
    val df = scala.collection.mutable.Map[String, Long]()
    graft.sources.Tables.documents(spark, sf).select("text").collect().foreach { r =>
      r.getString(0).trim.split("\\s+").distinct.foreach(t => df(t) = df.getOrElse(t, 0L) + 1)
    }
    val want = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(got === want)
  }

  test("commonness scores are in range and OOV-heavy docs score lower") {
    val rows = TextOps.textCommonness(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val oov = r.getAs[Double]("oov_ratio")
      assert(oov >= 0.0 && oov <= 1.0)
      assert(r.getAs[Double]("avg_tf") >= 0.0)
    }
    // determinism (the vocab top-1000 has a total tie-break)
    val again = TextOps.textCommonness(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bpe pair counts agree with a locally computed ranking") {
    val got = TextOps.bpePairs(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"))).toSeq
    val counts = scala.collection.mutable.Map[String, Long]()
    graft.sources.Tables.documents(spark, sf).select("text").collect().foreach { r =>
      val t = r.getString(0)
      var i = 0
      while (i < t.length - 1) { val p = t.substring(i, i + 2); counts(p) = counts.getOrElse(p, 0L) + 1; i += 1 }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got === want)
  }

  test("quality score stays in [0,1]") {
    val rows = TextOps.textQuality(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q")
    }
  }

  test("rolling hash is deterministic and collision-free on this corpus") {
    val a = TextOps.textRollhash(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = TextOps.textRollhash(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).distinct.length === a.length)
  }

  test("winnow_fingerprint: independent local replay, density, and the shared-run guarantee") {
    // independent replay: per-window argmin with rightmost tie, scanned
    // directly per window (O(n·w)) — no deque, no shared selection code
    def replay(text: String): Seq[(Int, Long)] = {
      val toks = text.trim.split("\\s+")
      if (toks.length < TextOps.WinnowK) return Seq.empty
      val th = toks.map(t => graft.functions.RollingHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      val q = graft.functions.WindowHashes.Q
      val hs = (0 to toks.length - TextOps.WinnowK).map { i =>
        var h = 0L
        (0 until TextOps.WinnowK).foreach(j => h = h * q + th(i + j))
        h
      }
      val w = TextOps.WinnowW
      if (hs.length < w) return Seq.empty
      (w - 1 until hs.length).map { end =>
        var best = end - w + 1
        ((end - w + 2) to end).foreach(p => if (hs(p) <= hs(best)) best = p)
        (best, hs(best))
      }.distinct
    }
    val got = TextOps.winnowFingerprint(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[Long]("fp")))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val want = docs.flatMap { case (id, t) => replay(t).map { case (p, h) => (id, p, h) } }
    assert(got.toSeq.sorted === want.toSeq.sorted)
    // density: far fewer fingerprints than grams (expected 2/(w+1)),
    // but at least one per doc long enough for a complete window
    val nGrams = docs.map { case (_, t) =>
      math.max(0, t.trim.split("\\s+").length - TextOps.WinnowK + 1) }.sum
    assert(got.length * 2 < nGrams, s"${got.length} fps vs $nGrams grams")
    val longDocs = docs.count { case (_, t) =>
      t.trim.split("\\s+").length >= TextOps.WinnowK + TextOps.WinnowW - 1 }
    assert(got.map(_._1).distinct.length === longDocs)
    // guarantee: two docs sharing a run of w + k − 1 tokens share a
    // fingerprint HASH even with disjoint surroundings
    import spark.implicits._
    val run = (1 to (TextOps.WinnowW + TextOps.WinnowK - 1)).map(i => s"shared$i").mkString(" ")
    val planted = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $run iota kappa"),
      (2L, s"one two three $run four five six seven eight nine ten")).toDF("doc_id", "text")
    val fps = planted.select(col("doc_id"),
        org.apache.spark.sql.functions.explode(graft.functions.WinnowSelect.winnowSelect(
          graft.functions.WindowHashes.windowHashes(
            graft.functions.TextFunctions.tokens(col("text")), TextOps.WinnowK),
          TextOps.WinnowW)).as("f"))
      .select(col("doc_id"), col("f.fp")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert(h1.intersect(h2).nonEmpty, "shared run must be witnessed by a shared fingerprint")
  }

  test("token_diversity matches a local replay; loops concentrate, prose spreads") {
    val rows = TextOps.tokenDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 500)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, n, nd, ss, simpson, eff) =>
      val toks = docs(id).trim.split("\\s+")
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      assert(n === toks.length.toLong)
      assert(nd === counts.size.toLong)
      assert(ss === counts.values.map(c => c * c).sum)
      assert(simpson === ss.toDouble / (n * n).toDouble)
      assert(eff === (n * n).toDouble / ss.toDouble)
      assert(simpson >= 1.0 / nd - 1e-12 && simpson <= 1.0)
    }
    // a looping doc concentrates near 1/2 (two alternating types);
    // diverse prose spreads toward 1/n_distinct
    import spark.implicits._
    val planted = Seq((1L, ("spam ham " * 50).trim),
      (2L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val p = planted.select(col("doc_id"),
        graft.functions.TokenDiversity.tokenDiversity(
          graft.functions.TextFunctions.tokens(col("text"))).as("d"))
      .select(col("doc_id"), col("d.sum_sq"), col("d.n_tokens")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1).toDouble / (r.getLong(2) * r.getLong(2)))).toMap
    assert(math.abs(p(1L) - 0.5) < 1e-12, "two uniform types concentrate to 1/2")
    assert(math.abs(p(2L) - 0.01) < 1e-12, "100 unique types spread to 1/100")
  }

  test("vocab_coverage matches a local replay and is monotone in V") {
    val rows = TextOps.vocabCoverage(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(10, 100, 1000))
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => r.getString(0).trim.split("\\s+"))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    rows.foreach { case (v, covered, total, cov) =>
      assert(total === toks.length.toLong)
      assert(covered === ranked.take(v).map(_._2).sum)
      assert(cov === covered.toDouble / total.toDouble)
    }
    assert(rows(0)._2 <= rows(1)._2 && rows(1)._2 <= rows(2)._2)
  }

  test("text_repetition matches a local ground truth, including planted loops") {
    val rows = TextOps.textRepetition(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).trim.split("\\s+").toSeq
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val wantDupTok = 1.0 - toks.distinct.size.toDouble / toks.size
      val wantTop = if (grams.isEmpty) 0.0 else counts.values.max.toDouble / grams.size
      val wantDup = if (grams.isEmpty) 0.0
        else counts.values.filter(_ > 1).sum.toDouble / grams.size
      assert(r.getAs[Double]("dup_token_frac") === wantDupTok)
      assert(r.getAs[Double]("top_2gram_frac") === wantTop)
      assert(r.getAs[Double]("dup_2gram_frac") === wantDup)
    }
    // a pathological looping doc scores near 1.0 on every signal
    import spark.implicits._
    val loop = Seq((1L, ("spam ham " * 50).trim)).toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.RepetitionStats.repetitionStats(
          graft.functions.TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.top_2gram", "r.total_2grams", "r.dup_2grams")
      .collect()(0)
    assert(loop.getLong(0) === 100L && loop.getLong(1) === 2L)
    assert(loop.getLong(2) === 50L && loop.getLong(3) === 99L && loop.getLong(4) === 99L)
  }

  test("top_tfidf_terms matches a local exact replay of the log-free ranking") {
    val rows = TextOps.topTfidfTerms(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to g.length))
      val scores = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("tfidf"))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // exact replay: tf, df, N in plain Scala, same (score desc, term) order
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.split("\\s+").toSeq).toMap
    val n = docs.size.toLong
    val dfc = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong).toMap
    docs.foreach { case (id, toks) =>
      val want = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap.toSeq
        .map { case (t, tf) => (t, (tf * n).toDouble / dfc(t)) }
        .sortBy { case (t, sc) => (-sc, t) }.take(3)
      val got = byDoc(id).sortBy(_.getAs[Int]("rk"))
        .map(r => (r.getAs[String]("term"), r.getAs[Double]("tfidf"))).toSeq
      assert(got === want, s"doc $id")
    }
  }

  test("mm_phash is permutation-invariant and cluster sizes conserve the corpus") {
    // same byte multiset, different order → identical signature
    val a = "alpha beta gamma delta".getBytes("UTF-8")
    val b = new String(a.map(_.toChar)).reverse.getBytes("UTF-8")
    assert(graft.operators.MultimodalStub.phash16(a) ===
      graft.operators.MultimodalStub.phash16(b))
    // disjoint byte distributions → different signatures
    val c = "zzzzzzzzzzzz!!!!".getBytes("UTF-8")
    assert(graft.operators.MultimodalStub.phash16(a) !==
      graft.operators.MultimodalStub.phash16(c))
    val rows = Multimodal.mmPhash(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === n)
    // per-cluster sizes are consistent: each phash's n_same equals its
    // actual row count
    rows.groupBy(_.getAs[Long]("phash")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_same")).toSet === Set(g.length.toLong))
    }
  }

  test("mm_dedup registry conserves the corpus and keeps the minimum doc per address") {
    val rows = Multimodal.mmDedup(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_copies")).sum
    assert(total === graft.sources.Tables.documents(spark, sf).count())
    // keeper is a member: every keep_id must hash to its own sha
    val byDoc = Multimodal.mmIngest(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("sha")).toMap
    rows.foreach { r =>
      assert(byDoc(r.getAs[Long]("keep_id")) === r.getAs[String]("sha"))
    }
  }

  test("mm_frames samples k frames per doc with in-payload offsets") {
    val rows = Multimodal.mmFrames(spark, sf).collect()
    assert(rows.length === 500 * 4)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { fs =>
      assert(fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.forall(_.getAs[Long]("offset") >= 0))
    }
  }

  test("mm_features emits checkable scalars; stub histograms stay normalized") {
    val rows = Multimodal.mmFeatures(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("height") >= 64)
      assert(r.getAs[Long]("resized_w") <= 224 && r.getAs[Long]("resized_h") <= 224)
      val bin = r.getAs[Long]("mode_bin")
      assert(bin >= 0 && bin < 16)
      val frac = r.getAs[Double]("mode_frac")
      // the mode of a 16-bin histogram carries at least average mass
      assert(frac >= 1.0 / 16 - 1e-12 && frac <= 1.0)
    }
    val again = Multimodal.mmFeatures(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // the full feature vector remains available (and normalized) via the
    // decode stub for downstream stages
    val hist = graft.operators.MultimodalStub.fakeDecode(7L, "abcdefg".getBytes("UTF-8")).features
    assert(hist.length === 16 && math.abs(hist.sum - 1.0) < 1e-9)
  }

  test("lineRepetition computes Gopher dup-line fractions on planted multi-line docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "aa\nbb\naa\ncccc"),  // 4 lines, 'aa' repeats: dup_line 1/4; chars 2+2+2+4=10, dup 4 → 0.4
      (2L, "xx\nyy"),             // no repeats
      (3L, "zz\nzz\nzz"),         // all one line: dup 2/3; chars all dup → 1.0
      (4L, ""))                   // split("", \n) = [""] — 1 empty line, no repeat, 0 chars
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextOps.lineRepetition(split(col("text"), "\n")).as("r"))
      .select(col("doc_id"), col("r.dup_line_frac"), col("r.dup_line_char_frac"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) === ((0.25, 0.4)))
    assert(out(2L) === ((0.0, 0.0)))
    // the operator computes 1 − distinct/n, so expect that exact IEEE value
    assert(out(3L) === ((1.0 - 1.0 / 3, 1.0)))
    assert(out(4L) === ((0.0, 0.0)))
  }

  test("image decode: real PNGs through binaryFile ingest yield pixel features and phash") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import java.nio.file.Files
    def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val dir = Files.createTempDirectory("graft-png")
    // half black / half white → luminance bins 0 and 15 at mass 0.5 each
    Files.write(dir.resolve("bw.png"),
      png(50, 30)((x, _) => if (x < 25) 0x000000 else 0xffffff))
    // same pixel HISTOGRAM as bw.png but rearranged (checkerboard):
    // byte-identity sha differs, pixel phash must collide
    Files.write(dir.resolve("bw2.png"),
      png(50, 30)((x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xffffff))
    // solid mid-gray, oversized → bin 8, aspect-preserving resize
    Files.write(dir.resolve("gray.png"), png(448, 224)((_, _) => 0x808080))
    // corrupt bytes: no reader accepts → dropped, not thrown
    Files.write(dir.resolve("broken.png"), Array[Byte](1, 2, 3, 4, 5))
    val files = graft.sources.Formats.readBinaryFiles(spark, dir.toString, "*.png")
    val got = Multimodal.mmFeaturesImage(files).collect()
      .map(r => r.getAs[Long]("n_bytes") -> r).toList
    assert(got.length === 3, "3 decodable images; the corrupt one is dropped")
    val byName = files.collect().map { r =>
      r.getAs[String]("path").split('/').last -> r.getAs[Array[Byte]]("content")
    }.toMap
    def scalarsOf(name: String) =
      graft.operators.ImageCodec.decode(0L, byName(name)).get
    // real pixel dimensions + resize arithmetic over them
    val gray = scalarsOf("gray.png")
    assert((gray.width, gray.height) === ((448, 224)))
    assert((gray.resized_w, gray.resized_h) === ((224, 112)))
    assert(gray.features(8) === 1.0) // solid 0x80 → luma 128 → bin 8
    assert(graft.operators.ImageCodec.phashPixels(gray) === (1 << 8))
    // permutation invariance over real pixels: same histogram, same sig
    val bw = scalarsOf("bw.png")
    val bw2 = scalarsOf("bw2.png")
    assert(bw.features.toSeq === bw2.features.toSeq)
    assert(bw.features(0) === 0.5 && bw.features(15) === 0.5)
    assert(graft.operators.ImageCodec.phashPixels(bw) === ((1 << 15) | 1))
    assert(graft.operators.ImageCodec.phashPixels(bw) ===
      graft.operators.ImageCodec.phashPixels(bw2))
  }

  test("audio decode: real WAVs through binaryFile ingest yield format and amplitude gates") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.nio.file.Files
    // 16-bit signed little-endian mono WAV from a sample generator
    def wav(rate: Float, samples: Array[Short]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        data(i * 2) = (samples(i) & 0xff).toByte
        data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rate = 8000f
    // full-scale square wave: RMS = peak = 1 (32768 clips to max short;
    // use 32767/-32767 → amplitude 32767/32768)
    val square = Array.tabulate[Short](8000)(i => if (i % 2 == 0) 32767 else -32767)
    // half signal, half dead air → silence_frac 0.5
    val halfSilent = Array.tabulate[Short](4000)(i => if (i < 2000) 16384 else 0)
    val dir = Files.createTempDirectory("graft-wav")
    Files.write(dir.resolve("square.wav"), wav(rate, square))
    Files.write(dir.resolve("half.wav"), wav(rate, halfSilent))
    Files.write(dir.resolve("broken.wav"), Array[Byte](82, 73, 70, 70, 1, 2, 3))
    val files = graft.sources.Formats.readBinaryFiles(spark, dir.toString, "*.wav")
    val got = Multimodal.mmFeaturesAudio(files).collect()
      .map(r => r.getAs[Long]("n_frames") -> r).toMap
    assert(got.size === 2, "2 decodable WAVs; the corrupt one is dropped")
    val sq = got(8000L)
    assert(sq.getAs[Int]("sample_rate") === 8000)
    assert(sq.getAs[Int]("channels") === 1 && sq.getAs[Int]("bits") === 16)
    assert(math.abs(sq.getAs[Double]("duration_s") - 1.0) < 1e-9)
    val amp = 32767.0 / 32768.0
    assert(math.abs(sq.getAs[Double]("rms") - amp) < 1e-9)
    assert(math.abs(sq.getAs[Double]("peak") - amp) < 1e-9)
    assert(sq.getAs[Double]("silence_frac") === 0.0)
    val hs = got(4000L)
    assert(math.abs(hs.getAs[Double]("silence_frac") - 0.5) < 1e-9)
    assert(math.abs(hs.getAs[Double]("peak") - 0.5) < 1e-3)
    assert(math.abs(hs.getAs[Double]("rms") - 0.5 * math.sqrt(0.5)) < 1e-3)
  }

  test("bpe apply: bundled merges segment exactly as the independent replica") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Bpe
    // expectations computed by a from-scratch replica of the merge
    // loop over the bundled merges (rank order decides: e.g. "for"
    // stays [f, or] because o-r outranks f-o; "thin" merges t-h before
    // i-n because rank 0 < rank 2)
    val want = Map(
      "the" -> Seq("the"), "thin" -> Seq("th", "in"), "and" -> Seq("and"),
      "with" -> Seq("with"), "that" -> Seq("that"), "for" -> Seq("f", "or"),
      "ingest" -> Seq("ing", "es", "t"), "queen" -> Seq("qu", "e", "en"),
      "xyzzy" -> Seq("x", "y", "z", "z", "y"), "a" -> Seq("a"))
    val got = want.keys.toSeq.toDF("w")
      .select(col("w"), Bpe.bpeSegment(col("w"), Bpe.default).as("seg"))
      .collect().map(r => r.getAs[String]("w") -> r.getSeq[String](1).toSeq).toMap
    assert(got === want)
    // segments always rebuild the word; count is Σ segment sizes
    val docs = Tables.documents(spark, sf).limit(50)
    val check = docs.select(
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("toks"),
        Bpe.bpeTokenCount(col("toks"), Bpe.default).as("n"),
        transform(col("toks"), t => Bpe.bpeSegment(t, Bpe.default)).as("segs"))
      .collect()
    check.foreach { r =>
      val toks = r.getSeq[String](0)
      val segs = r.getSeq[scala.collection.Seq[String]](2)
      assert(segs.map(_.length.toLong).sum === r.getAs[Long]("n"))
      toks.zip(segs).foreach { case (w, s) => assert(s.mkString === w) }
    }
    // vocab ids: base alphabet 0..35 (a–z, 0–9), then merge outputs by
    // rank — "th"=36 (rank 0), "the"=37 (rank 1), "in"=38 (rank 2);
    // OOV symbols surface as −1, never silently dropped
    val ids = Seq((Seq("the", "thin"), 0), (Seq("x!"), 1)).toDF("w", "i")
      .select(Bpe.bpeEncodeIds(col("w"), Bpe.default).as("ids"), col("i"))
      .orderBy(col("i"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(ids(0) === Seq(37, 36, 38))
    assert(ids(1) === Seq(23, -1)) // 'x'=23, '!' is OOV
  }

  test("bpe vocab seeds from the merges' own alphabet: full-charset merges encode with no -1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Bpe
    // a real model's merges file reaches outside a-z0-9: uppercase,
    // punctuation, and a byte-remap marker (GPT-2's Ġ word-boundary
    // symbol).  The derived alphabet must recover every character so
    // encoding this file's own corpus never floods -1.
    val merges = Seq("T h", "Th e", "' s", "Ġ t", "Ġt h",
      "e r", "o w", "N e", "Ne w")
    val t = Bpe.loadMerges(merges.iterator)
    // derived alphabet = code-point-ordered distinct chars of the
    // merge symbols; ids then continue with merge outputs by rank
    val alpha = Seq("'", "N", "T", "e", "h", "o", "r", "s", "t", "w", "Ġ")
    alpha.zipWithIndex.foreach { case (c, i) =>
      assert(t.idOf(c) === i, s"alphabet id of '$c'")
    }
    assert(t.idOf("Th") === alpha.length)     // rank-0 merge output
    assert(t.idOf("Ġt") === alpha.length + 3)
    val corpus = Seq("The", "There's", "Ġthe", "Newer", "show")
    val ids = corpus.toDF("w")
      .select(Bpe.bpeEncodeIds(array(col("w")), t).as("ids"))
      .collect().flatMap(_.getSeq[Int](0))
    assert(ids.nonEmpty && ids.forall(_ >= 0), s"-1 flood: ${ids.toSeq}")
    // a character in NO merge is still honestly OOV under derivation…
    assert(t.idOf("z") === -1)
    // …and the byte-level base closes even that gap
    val tb = Bpe.loadMerges(merges.iterator, Some(Bpe.ByteAlphabet))
    assert(tb.idOf("z") === 'z'.toInt)
    assert(tb.idOf("Th") === 256)
    // null words emit the -1 sentinel, never a silent drop
    val withNull = Seq(1).toDF("i")
      .select(Bpe.bpeEncodeIds(array(lit("The"), lit(null.asInstanceOf[String]), lit("ow")), t).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(withNull === Seq(t.idOf("The"), -1, t.idOf("ow")))
  }

  test("lm_score: partition-layout-independent fold; replica agreement to float-fn tolerance") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val got = TextOps.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.getAs[java.lang.Double]("bits_per_bigram")))).toMap
    // independent replica: same formula, same left-to-right fold over
    // (w1, w2)-sorted contributions, plain Scala collections
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq).toMap
    val occ = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.length < 2) Nil
      else tk.zip(tk.tail).groupBy(identity).map { case ((a, b), g) => (id, a, b, g.length.toLong) }
    }
    val c2 = occ.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._4).sum).toMap
    val c1 = occ.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val v = c1.size.toLong
    val ln2 = math.log(2.0)
    val want = toks.map { case (id, tk) =>
      val types = occ.filter(_._1 == id).sortBy(t => (t._2, t._3))
      if (types.isEmpty) id -> ((0L, None))
      else {
        val nb = types.map(_._4).sum
        val acc = types.foldLeft(0.0) { case (a, (_, w1, w2, n)) =>
          a + n * (math.log((c2((w1, w2)) + 1).toDouble / (c1(w1) + v).toDouble) / ln2)
        }
        id -> ((nb, Some(-acc / nb.toDouble)))
      }
    }
    assert(got.keySet === toks.keySet)
    want.foreach { case (id, (nb, bits)) =>
      assert(got(id)._1 === nb, s"doc $id n_bigrams")
      (got(id)._2, bits) match {
        case (Some(g), Some(w)) =>
          // cross-IMPLEMENTATION check: Math.log differs from the
          // engine's log by ≤1 ulp on some inputs (why this operator
          // is rows-only, not SQL-oracled) — engine-vs-engine
          // determinism is pinned EXACTLY below
          assert(math.abs(g - w) <= 1e-12 * math.abs(w), s"doc $id bits: $g vs $w")
        case (None, None) =>
        case other => fail(s"doc $id: $other")
      }
    }
    // partition-layout independence of the double fold (the sorted
    // left-to-right aggregation contract)
    val again = TextOps.lmScore(docs.repartition(17)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("bits_per_bigram"))).toMap
    assert(again === got.view.mapValues(_._2).toMap)
    // boilerplate reads LOW: a doc of corpus-typical transitions must
    // score below the corpus median
    val med = got.values.flatMap(_._2).toSeq.sorted.apply(got.size / 2)
    assert(got.values.flatMap(_._2).min < med)
  }

  test("normalize_text: NFC composes, controls become spaces, runs collapse, ends trim") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = Seq(
      ("e\u0301tude", "\u00e9tude"), // combining acute composes to one char
      ("a\tb\r\nc", "a b c"), // controls become single spaces
      ("  lots   of gaps  ", "lots of gaps"), // runs collapse, ends trim
      ("\u00e9 d\u00e9j\u00e0", "\u00e9 d\u00e9j\u00e0"), // already-NFC fixed point
      ("\u0000\u0001 \u007f", ""), // control/space-only collapses to empty
      ("plain text", "plain text"))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.NormalizeText.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
    // idempotent: the canonical form is its own canonical form
    val twice = cases.map(_._1).toDF("t")
      .select(graft.functions.NormalizeText.normalizeText(
        graft.functions.NormalizeText.normalizeText(col("t"))).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice === got)
    // SQL registration
    assert(spark.sql("SELECT normalize_text('a\tb') AS n").collect().head.getString(0) === "a b")
    // null passes through null
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(graft.functions.NormalizeText.normalizeText(col("t")).as("n")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("keyword_topk: JVM replay agrees bit-exactly; saturation and length-norm orderings hold") {
    import spark.implicits._
    // doc 1: query term twice, short; doc 2: once, same length; doc 3:
    // once but longer (length-normalized below doc 2); doc 4: no hits;
    // doc 5: a rarer term (higher idf) once
    val docs = Seq(
      (1L, "needle needle filler filler"),
      (2L, "needle filler filler filler"),
      (3L, "needle filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler"),
      (5L, "jewel filler filler filler")).toDF("doc_id", "text")
    val qt = Seq(("needle", 3L), ("jewel", 1L)).toDF("term", "df")
    val got = TextOps.keywordTopK(docs, qt, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent replay of the documented expression tree
    val n = 5.0; val nTok = 24.0; val avgdl = nTok / n
    def contrib(df: Double, tf: Double, dl: Double): Long =
      math.floor((n - df + 0.5) / (df + 0.5) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) * 1e9).toLong
    val exp = Seq(
      5L -> contrib(1, 1, 4), 1L -> contrib(3, 2, 4),
      2L -> contrib(3, 1, 4), 3L -> contrib(3, 1, 8))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(r => (r._1, r._3)) === exp)
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 5L), "no-hit docs never rank")
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(2L), "higher tf at equal length wins")
    assert(byId(2L) > byId(3L), "longer doc with equal tf loses")
    assert(byId(5L) > byId(2L), "rarer term (higher idf ratio) outweighs a common one")
  }

  test("deflate_len matches an independent JVM replay; ratio discriminates noise from boilerplate") {
    import spark.implicits._
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192); var t = 0L
        while (!d.finished()) t += d.deflate(buf)
        t
      } finally d.end()
    }
    val rep = "spam spam spam spam " * 50
    val noise = {
      var x = 42L
      (1 to 1000).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 33) % 93) + 33).toChar
      }.mkString
    }
    val prose = "the quick brown fox jumps over the lazy dog and keeps going " * 10
    val planted = Seq(rep, noise, prose, "", "x")
    val corpus = Tables.documents(spark, sf).select("text").limit(50)
      .collect().map(_.getString(0)).toSeq
    val got = (planted ++ corpus).toDF("text")
      .select(graft.functions.DeflateLen.deflateLen(col("text")).as("d"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === (planted ++ corpus).map(ref), "bit-exact vs the JVM replay")
    def ratio(s: String): Double = ref(s).toDouble / s.getBytes("UTF-8").length
    assert(ratio(rep) < 0.1, "boilerplate collapses")
    assert(ratio(noise) > 0.7, "noise barely compresses")
    assert(ratio(prose) > ratio(rep) && ratio(prose) < ratio(noise), "prose sits between")
    // SQL registration
    val viaSql = spark.sql("SELECT deflate_len('aaaaaaaaaa')").collect()(0).getLong(0)
    assert(viaSql === ref("aaaaaaaaaa"))
  }

  test("compression_ratio: bounded buckets partition all non-empty docs; layout-independent") {
    val rows = TextOps.compressionRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    val nonEmpty = Tables.documents(spark, sf)
      .filter(octet_length(col("text")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nonEmpty)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"), r.getAs[Double]("min_ratio"), r.getAs[Double]("max_ratio"))
      assert(b >= 0 && b <= 11)
      assert(lo <= hi)
      assert(math.floor(lo * 10).toLong.min(11) === b, s"min_ratio outside bucket $b")
      assert(math.floor(hi * 10).toLong.min(11) === b, s"max_ratio outside bucket $b")
    }
    val re = TextOps.compressionRatio(spark, sf).collect()
    assert(re.map(_.toString).toSeq === rows.map(_.toString).toSeq, "deterministic")
  }

  test("bpe_train: planted corpus yields the hand-computed merge sequence") {
    import spark.implicits._
    // histogram: ab x3, abc x2 -> round 1: (a,b) count 5 beats (b,c)
    // count 2; round 2: segmentations are [ab] and [ab, c] -> (ab, c)
    // count 2; round 3: nothing left to pair
    val docs = Seq((1L, "ab ab ab abc"), (2L, "abc x")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, 10)
    assert(got === Seq(("a", "b", 5L), ("ab", "c", 2L)))
  }

  test("bpe_train agrees with an independent sequential replica on the corpus") {
    val n = 12
    val got = TextOps.bpeTrain(Tables.documents(spark, sf), n)
    // replica: JVM-side histogram + greedy loop over word types,
    // reusing ONLY the single-word segmenter from the apply side
    val hist = Tables.documents(spark, sf).collect()
      .flatMap(_.getAs[String]("text").trim.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (!done && merges.length < n) {
      val t = new graft.functions.BpeTable(merges.map(m => (m._1, m._2)).toArray)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (w, c) =>
        val s = graft.functions.Bpe.segment(w, t)
        var i = 0
        while (i < s.length - 1) {
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
          i += 1
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 => merges += ((a, b, c))
        case _ => done = true
      }
    }
    assert(got === merges.toSeq)
    assert(got.length === n, "the corpus supports at least 12 merges")
    // learned table drives the apply machinery: token counts shrink
    val t0 = new graft.functions.BpeTable(Array.empty)
    val tN = new graft.functions.BpeTable(got.map(m => (m._1, m._2)).toArray)
    val w = hist.keys.maxBy(hist(_))
    assert(graft.functions.Bpe.segment(w, tN).length <=
      graft.functions.Bpe.segment(w, t0).length)
  }

  test("token_histogram_bpe covers the corpus and cum_share reaches 1") {
    val rows = TextOps.tokenHistogramBpe(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 500L)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
    // BPE counts exceed whitespace counts (subwords split words)
    val bpeTokens = rows.map(_.getAs[Long]("tokens")).sum
    val wsTokens = TextOps.tokenHistogram(spark, sf).collect()
      .map(_.getAs[Long]("tokens")).sum
    assert(bpeTokens > wsTokens)
  }

  test("thumbnail: integer-grid nearest-neighbor, bit-deterministic, corrupt-safe") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // four 4x4 quadrants -> 2x2 thumbnail picks each quadrant's origin
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val src = png(8, 8) { (x, y) => colors((y / 4) * 2 + (x / 4)) }
    val t = graft.operators.ImageCodec.thumbnail(src, 2, 2).get
    val timg = ImageIO.read(new java.io.ByteArrayInputStream(t))
    assert((timg.getWidth, timg.getHeight) === ((2, 2)))
    for (y <- 0 until 2; x <- 0 until 2)
      assert((timg.getRGB(x, y) & 0xffffff) === colors(y * 2 + x), s"($x,$y)")
    // bit determinism: repeated derivation is byte-identical (what a
    // content-addressed derivative store requires)
    assert(graft.operators.ImageCodec.thumbnail(src, 2, 2).get.toSeq === t.toSeq)
    // upscale duplicates pixels on the same integer grid
    val up = ImageIO.read(new java.io.ByteArrayInputStream(
      graft.operators.ImageCodec.thumbnail(t, 4, 4).get))
    for (y <- 0 until 4; x <- 0 until 4)
      assert((up.getRGB(x, y) & 0xffffff) === colors((y / 2) * 2 + (x / 2)))
    // corrupt bytes and degenerate dims are None, never a throw
    assert(graft.operators.ImageCodec.thumbnail(Array[Byte](1, 2, 3), 2, 2).isEmpty)
    assert(graft.operators.ImageCodec.thumbnail(src, 0, 2).isEmpty)
  }

  test("heavy_hitters envelope: est-err <= true <= est; top exact terms all reported") {
    import org.apache.spark.sql.functions._
    val exact = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextOps.heavyHitters(spark, sf).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("est"), r.getAs[Long]("err")))
    assert(got.nonEmpty)
    got.foreach { case (t, est, err) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est >= tru && est - err <= tru, s"$t est=$est err=$err true=$tru")
    }
    val top8 = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(8).map(_._1).toSet
    assert(top8.subsetOf(got.map(_._1).toSet))
  }

  test("space_saving under forced eviction + multi-partition merge keeps its guarantees") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // vocab (5003) >> capacity (64): every partial evicts constantly
    val heavy = Seq.fill(1000)("alpha") ++ Seq.fill(800)("beta") ++ Seq.fill(600)("gamma")
    val tail = (1 to 5000).map(i => s"tail_$i")
    val data = new scala.util.Random(42).shuffle(heavy ++ tail)
    val df = data.toDF("term").repartition(7)
    val cap = 64
    val row = df.agg(
      graft.functions.SpaceSavingAgg.spaceSaving(col("term"), cap, cap).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.term"), col("h.est"), col("h.err")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = data.length
    row.foreach { case (t, est, err) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est >= tru, s"$t est=$est true=$tru")
      assert(est - err <= tru, s"$t est=$est err=$err true=$tru")
    }
    // any term with true > N/cap must be tracked (alpha/beta/gamma all are:
    // N/64 = 115)
    val reported = row.map(_._1).toSet
    exact.filter(_._2 > n / cap).keys.foreach { t =>
      assert(reported.contains(t), s"heavy term $t missing (true=${exact(t)})")
    }
  }

  test("distinct_sketch: 5% envelope vs exact; union row equals a direct whole-corpus sketch") {
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val exact = docs.groupBy(_._1)
      .map { case (s, v) => s -> v.flatMap(_._2.trim.split("\\s+")).distinct.size }
    val exactAll = docs.flatMap(_._2.trim.split("\\s+")).distinct.size
    val got = TextOps.distinctSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet + "(all)")
    (exact + ("(all)" -> exactAll)).foreach { case (src, t) =>
      val e = got(src).toDouble
      assert(math.abs(e / t - 1.0) <= 0.05, s"$src est=$e true=$t")
    }
    // merge == recompute for the sketch itself: the union-row estimate
    // is bit-equal to a sketch built over the whole corpus directly
    val direct = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .agg(org.apache.spark.sql.functions.expr("hll_sketch_estimate(hll_sketch_agg(term, 12))"))
      .head().getLong(0)
    assert(got("(all)") === direct)
    // the corpus vocab (31 words) sits in HLL's exact-sparse regime;
    // exercise the ESTIMATION regime on a planted 100k-distinct column
    import spark.implicits._
    val big = (1 to 100000).map(i => s"term_$i").toDF("term")
    val est = big.agg(org.apache.spark.sql.functions.expr(
      "hll_sketch_estimate(hll_sketch_agg(term, 12))")).head().getLong(0)
    assert(math.abs(est.toDouble / 100000.0 - 1.0) <= 0.05, s"est=$est")
    assert(est !== 100000L, "lgK=12 on 100k distinct should be estimating, not exact")
  }

  test("collocations matches a sequential lift replay; support floor holds") {
    val docs = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val tk = t.trim.split("\\s+")
      if (tk.length < 2) Array.empty[(String, String)]
      else tk.zip(tk.tail)
    }
    val cAb = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cA = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cB = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = bigrams.length.toLong
    val want = cAb.toSeq.filter(_._2 >= 5)
      .map { case ((a, b), ab) =>
        (a, b, ab, (ab * n).toDouble / (cA(a) * cB(b)).toDouble) }
      .sortBy { case (a, b, _, lift) => (-lift, a, b) }
      .take(20)
    val got = TextOps.collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want)
    assert(got.forall(_._3 >= 5))
    assert(got.nonEmpty)
  }

  test("sentence_stats matches a Java-regex sequential replay per doc") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val sents = text.split("[.!?]+", -1).map(_.trim).filter(_.nonEmpty)
      if (sents.isEmpty) None else {
        val wc = sents.map(_.split("\\s+", -1).length)
        Some(id -> (sents.length.toLong, wc.map(_.toLong).sum,
          wc.max.toLong, wc.sum.toDouble / sents.length))
      }
    }.toMap
    val got = TextOps.sentenceStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_words"), r.getAs[Long]("max_sentence_words"),
        r.getAs[Double]("avg_sentence_words"))).toMap
    assert(got.size == want.size && got.size > 0)
    want.foreach { case (id, w) => assert(got(id) == w, s"doc $id") }
  }

  test("quality_gopher: each rule trips on exactly its planted fixture") {
    import spark.implicits._
    // a base text that PASSES every rule: 60 plain words incl. several
    // stop words, mean word length in [3,10]
    val good = (1 to 6).map(_ =>
      "the quick brown foxes have been jumping over many lazy dogs " +
      "that rest beside with calm rivers under warm evening skies now").mkString(" ")
    val docs = Seq(
      1L -> good,                                              // keep
      2L -> "too short to pass",                               // word count < 50
      3L -> (1 to 60).map(_ => "a").mkString(" "),             // mean word len < 3
      4L -> good.split(" ").map(_ + " ###").mkString(" "),     // symbol ratio > 0.1
      5L -> (1 to 20).map(_ => "- " + good.take(40)).mkString("\n"), // >90% bullet lines
      6L -> (1 to 10).map(i => good.take(40) +
        (if (i <= 4) "..." else "")).mkString("\n"),           // 40% ellipsis-line ends
      7L -> (1 to 60).map(_ => "12345").mkString(" "),         // alpha frac < 0.8
      8L -> good.replaceAll("\\b(the|have|that|with|to|of|be|and)\\b", "zz") // stop hits < 2
    ).toDF("doc_id", "text")
    val got = TextOps.qualityGopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(8), "base fixture must pass all rules")
    (2L to 8L).foreach(id => assert(!got(id).getBoolean(8), s"doc $id must fail"))
    // and each fixture fails for ITS rule
    assert(got(2L).getLong(1) < 50)
    assert(got(3L).getDouble(2) < 3.0)
    assert(got(4L).getDouble(3) > 0.1)
    assert(got(5L).getDouble(4) > 0.9)
    assert(got(6L).getDouble(5) > 0.3)
    assert(got(7L).getDouble(6) < 0.8)
    assert(got(8L).getLong(7) < 2)
  }

  test("AudioDsp DFT matches the closed-form Dirichlet-kernel spectrum; features behave") {
    import graft.operators.AudioCodec
    // rectangular pulse: k samples of amplitude a, then zeros — the
    // analytic magnitude is a·|sin(πfk/n)/sin(πf/n)| (and a·k at DC)
    val (n, k, a) = (48, 13, 0.625)
    val x = Array.tabulate(n)(i => if (i < k) a else 0.0)
    val mag = AudioCodec.magnitudes(x)
    assert(mag.length === n / 2 + 1)
    (0 until mag.length).foreach { f =>
      val want =
        if (f == 0) a * k
        else a * math.abs(math.sin(math.Pi * f * k / n) / math.sin(math.Pi * f / n))
      assert(math.abs(mag(f) - want) <= 1e-9 * math.max(1.0, want), s"bin $f")
    }
    // a pure tone concentrates: centroid ~ the tone bin, flatness ~ 0;
    // white-ish (single-sample impulse) spreads: flatness ~ 1
    val sr = 8000
    val tone = Array.tabulate(n)(i => math.sin(2 * math.Pi * 6 * i / n))
    val toneMag = AudioCodec.magnitudes(tone)
    val toneBinHz = 6.0 * sr / n
    assert(math.abs(AudioCodec.centroidHz(toneMag, sr, n) - toneBinHz) < 0.05 * sr)
    assert(AudioCodec.flatness(toneMag) < 0.01)
    val impulse = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
    assert(AudioCodec.flatness(AudioCodec.magnitudes(impulse)) > 0.999)
    // rolloff is monotone in the energy fraction and bin-aligned
    val r50 = AudioCodec.rolloffHz(mag, sr, n, 0.5)
    val r95 = AudioCodec.rolloffHz(mag, sr, n, 0.95)
    assert(r50 <= r95 && r95 <= sr / 2.0)
    // the driver query runs the real WAV round trip per doc
    val rows = Multimodal.mmAudioSpectral(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 4000.0)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0)
    }
  }

  test("quality_c4: line survival, doc-kill terms and the sentence floor each trip exactly") {
    import spark.implicits._
    val goodLine = "This is a perfectly ordinary sentence with enough words."
    val docs = Seq(
      1L -> Seq(goodLine, goodLine, goodLine).mkString("\n"),   // keep: 3 sentences
      2L -> Seq(goodLine, "no terminal punctuation here at all",
        "short line.", "we use javascript cookies on this site.").mkString("\n"), // only line 1 survives
      3L -> (goodLine + " { code }"),                           // brace kills the doc
      4L -> ("Lorem Ipsum dolor sit amet consectetur adipiscing elit."), // lorem kills
      5L -> Seq(goodLine, goodLine).mkString("\n")              // 2 sentences < 3
    ).toDF("doc_id", "text")
    val got = TextOps.qualityC4Flags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(7), "three surviving sentences must keep")
    assert(got(1L).getLong(2) === 3L && got(1L).getLong(4) === 3L)
    assert(got(2L).getLong(1) === 4L && got(2L).getLong(2) === 1L,
      "unpunctuated, short and javascript lines must drop")
    assert(got(2L).getLong(3) === goodLine.split("\\s+").length.toLong)
    assert(got(3L).getBoolean(5) && !got(3L).getBoolean(7), "curly brace kills the doc")
    assert(got(4L).getBoolean(6) && !got(4L).getBoolean(7), "lorem ipsum kills the doc")
    assert(!got(5L).getBoolean(7) && got(5L).getLong(4) === 2L, "sentence floor is 3")
  }

  test("lang_by_source equals the per-doc lang_id verdicts grouped by the docs' sources") {
    import org.apache.spark.sql.functions.col
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val verdicts = graft.operators.TextOps.langId(spark, sf).collect()
      .map(r => (srcOf(r.getLong(0)), r.getString(1)))
    val want = verdicts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = verdicts.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.TextOps.langBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (cell, n) =>
      assert(got(cell) === ((n, n * 1000000L / bySrc(cell._1))), cell.toString)
    }
    // conservation: every doc lands in exactly one (source, lang) cell
    assert(got.values.map(_._1).sum === srcOf.size.toLong)
  }

  test("readability_by_source equals a JVM regex replay, score tree included") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def cnt(t: String, re: String): Long = re.r.findAllIn(t).length.toLong
    val got = graft.operators.TextOps.readabilityBySource(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    val bySrc = docs.groupBy(_._1)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val w = ds.map(d => cnt(d._2, "[^ \\t\\n\\r]+")).sum
      val sn = ds.map(d => cnt(d._2, "[.!?]+")).sum
      val sy = ds.map(d => cnt(d._2, "[aeiouyAEIOUY]+")).sum
      val wps = w.toDouble / math.max(sn, 1L)
      val spw = sy.toDouble / math.max(w, 1L)
      // the SAME IEEE expression tree the engine (and oracle) evaluate
      val flesch = 206.835 - 1.015 * wps - 84.6 * spw
      assert(got(src) === ((ds.length.toLong, w, sn, sy, wps, spw, flesch)), src)
    }
  }
}
