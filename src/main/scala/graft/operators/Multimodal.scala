package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with typed metadata alongside.  The
  * container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub — but the Spark-side contract
  * (schema, batching, partition-parallel extraction, no driver
  * collection) is real and is what carries over to a cluster with the
  * native libs installed.
  */
object Multimodal {

  /** Binary ingest: payload bytes + content hash + metadata columns.
    * This is the schema boundary a media pipeline hands to downstream
    * stages; everything is codegen'd builtins over the binary column.
    */
  def mmIngest(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"),
        lit("text/plain").as("mime"))
      .orderBy(col("doc_id"))

  /** File-based ingest: the [[graft.sources.Formats.readBinaryFiles]]
    * frame (path, modificationTime, length, content) normalized to the
    * same content-addressed schema as [[mmIngest]] — id = the path's
    * 64-bit hash (stable across re-listing), payload = file bytes.
    * This is how a real media corpus (files on disk / object storage)
    * enters the pipeline; downstream stages ([[mmFeatures]]'s decode,
    * [[mmDedup]]'s address registry) are source-agnostic from here.
    */
  def ingestBinary(files: DataFrame): DataFrame =
    files.select(
      xxhash64(col("path")).as("doc_id"),
      col("path"),
      col("length").as("n_bytes"),
      sha2(col("content"), 256).as("sha"),
      col("content").as("payload"))

  /** Feature extraction over binary batches via `mapPartitions` on a
    * typed Dataset: partition-parallel, constant memory per batch, no
    * shuffle.  The "decode" (byte histogram + pseudo width/height) is a
    * STUB for a real image/audio decoder — deterministic so tests pin
    * it; swap `fakeDecode` for the real codec on a cluster.
    *
    * Output is scalars only (metadata + the histogram's mode bin and
    * mass): a raw `array<double>` feature column is not canonicalizable
    * by tabular comparators, and every scalar here is recomputable in
    * ANSI SQL so the whole row is oracle-checkable.  The full feature
    * vector stays available via [[MultimodalStub.fakeDecode]] for
    * downstream stages (its shape is pinned by MultimodalSpec).
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) => MultimodalStub.fakeDecode(id, bytes).toScalars }
    }.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("resized_w"), col("resized_h"), col("n_bytes"),
        col("mode_bin"), col("mode_frac"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: explode each binary payload into k evenly-spaced
    * "frames" with per-frame features — the video-ingest shape (decode
    * is the same stub; the partition-parallel explode + per-frame
    * schema is the real contract).
    */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    ds.flatMap { case (id, bytes) => MultimodalStub.fakeFrameSample(id, bytes, 4) }
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("offset"), col("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Content-addressed payload registry: one row per distinct binary
    * payload (its sha-256 address) with the copy count and the
    * canonical keeper — byte-identity dedup, the first pass every
    * media pipeline runs before any perceptual hashing.  One keyed
    * aggregation over the sha (map-side partials; the payload itself
    * never shuffles — only the 32-byte address does).  Emits ALL
    * addresses (registry semantics): dedup consumers filter
    * n_copies > 1, replication auditors read it whole.
    */
  def mmDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // group on the RAW 32-byte digest (unhex), not its 64-char hex
      // rendering — half the shuffled key bytes; hex only at the
      // presentation boundary
      .select(col("doc_id"), unhex(sha2(encode(col("text"), "UTF-8"), 256)).as("shab"))
      .groupBy(col("shab"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .select(lower(hex(col("shab"))).as("sha"), col("n_copies"), col("keep_id"))
      .orderBy(col("sha"))

  /** Perceptual near-dup fingerprint: a 16-bit signature from the
    * decoder's byte histogram (bit b set ⇔ bin b holds more than the
    * uniform 1/16 mass — the threshold compares 16·count > n in
    * INTEGERS, so the signature is engine-exact).  Unlike [[mmDedup]]'s
    * byte-identity sha, the phash is PERMUTATION-INVARIANT: re-encoded
    * or re-ordered payloads with the same content distribution collide
    * — the media analogue of near-dup text hashing (a real pipeline
    * swaps the stub histogram for decoded-pixel/audio features; the
    * grouping machinery is identical).  Cluster sizes come from a
    * keyed aggregate joined back broadcast (≤ 2¹⁶ distinct signatures
    * — bounded model-free state at any corpus size).
    *
    * Two passes over the hash stage (the aggregate and the join probe
    * both consume it): fine for the cheap stub, but a real decoder is
    * the expensive stage — production computes the phash ONCE at
    * ingest and persists it next to the payload ([[ingestBinary]]'s
    * schema has the slot); this entry recomputes only because the
    * synthetic corpus isn't pre-ingested.
    */
  def mmPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // null-safe: a NULL text must hash like the oracle's COALESCE
    // (empty bytes → signature 0), not NPE inside mapPartitions
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val hashed = ds.mapPartitions { it =>
      it.map { case (id, bytes) => (id, MultimodalStub.phash16(bytes).toLong) }
    }.toDF("doc_id", "phash")
    val sizes = hashed.groupBy(col("phash")).agg(count(lit(1)).as("n_same"))
    hashed.join(broadcast(sizes), "phash")
      .select(col("doc_id"), col("phash"), col("n_same"))
      .orderBy(col("doc_id"))
  }

  /** Real-decoder twin of [[mmFeatures]] for actual image FILES: the
    * [[graft.sources.Formats.readBinaryFiles]] frame → content-
    * addressed ingest → per-partition [[ImageCodec.decode]] → the same
    * MediaScalars schema, with real pixel dimensions and a 16-bin
    * LUMINANCE histogram where the synthetic corpus gets byte
    * histograms.  Bytes no installed reader accepts (corrupt files,
    * exotic formats) are DROPPED here — audit the gap by diffing
    * doc_ids against the ingest frame, the same absent-not-silent
    * contract as [[graft.sources.Formats.readBinaryFiles]]'s size cap.
    * Partition-parallel, constant memory, no shuffle; the driver
    * entries keep the deterministic stub because the synthetic corpus
    * has no real images.
    */
  def mmFeaturesImage(files: DataFrame): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    val ds = ingestBinary(files)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) => ImageCodec.decode(id, bytes).map(_.toScalars) }
    }.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("resized_w"), col("resized_h"), col("n_bytes"),
        col("mode_bin"), col("mode_frac"))
      .orderBy(col("doc_id"))
  }

  /** [[mmFeaturesImage]]'s audio twin: real WAV/PCM decode over binary
    * ingest via [[AudioCodec]] — format metadata + amplitude gates per
    * doc; undecodable/compressed bytes are dropped (diff ids against
    * the ingest frame to audit).  Partition-parallel, constant memory,
    * no shuffle.  Spec-pinned on in-test-generated WAVs (the synthetic
    * corpus has no real audio, the image-decode precedent).
    */
  def mmFeaturesAudio(files: DataFrame): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    val ds = ingestBinary(files)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) => AudioCodec.decode(id, bytes) }
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_frames"), col("duration_s"), col("rms"), col("peak"),
        col("silence_frac"))
      .orderBy(col("doc_id"))
  }

  /** REAL image codec through the correctness gate: each document row
    * becomes a deterministic two-gray RGB PNG ENCODED EXECUTOR-SIDE
    * (`ImageIO.write`), which [[ImageCodec.decode]] then decodes back
    * to pixels — a full PNG encode→decode round trip per row, the
    * driver-facing twin of the spec-only [[mmFeaturesImage]] path.
    * The fixture geometry is arithmetic in (doc_id, n_chars): width
    * (n%13+2) × height (n%7+2), first k pixels gray g1 = 32·(id mod 7)
    * + 8, rest g1+16 — two distinct 16-wide luminance bins (Rec.601
    * luma of gray v is exactly v), k nudged off npx/2 so the histogram
    * mode is never tied.  Every emitted scalar is therefore
    * recomputable in ANSI SQL: the oracle predicts what the real
    * decoder must SEE, so a codec or histogram bug breaks the hash.
    * n_bytes is deliberately NOT emitted (deflate output size is not
    * SQL-expressible).  One partition-local pass, no shuffle, bounded
    * memory (≤ 14×8 px per image).
    */
  def mmDecodeImage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.flatMap { case (id, nc) =>
        val w = (nc % 13 + 2).toInt
        val h = (nc % 7 + 2).toInt
        val npx = w * h
        var k = (nc % npx).toInt
        if (2 * k == npx) k += 1
        val g1 = java.lang.Math.floorMod(id, 7L).toInt * 32 + 8
        val g2 = g1 + 16
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < npx) {
          val v = if (p < k) g1 else g2
          img.setRGB(p % w, p / w, (v << 16) | (v << 8) | v)
          p += 1
        }
        val baos = new java.io.ByteArrayOutputStream(256)
        javax.imageio.ImageIO.write(img, "png", baos)
        ImageCodec.decode(id, baos.toByteArray).map(_.toScalars)
      }
    }.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("resized_w"), col("resized_h"), col("mode_bin"), col("mode_frac"))
      .orderBy(col("doc_id"))
  }

  /** [[mmDecodeImage]]'s audio twin: a deterministic 16-bit mono 8 kHz
    * WAV per document (k loud samples of amplitude 256·(id mod 75 +
    * 50) followed by silence, containerized via [[AudioCodec.wavBytes]]
    * — bit-identical to `AudioSystem.write` without its global provider
    * lock), decoded back through [[AudioCodec.decode]].  The amplitude is a multiple
    * of 256 under 2¹⁵, so every decoded statistic is an EXACT IEEE
    * expression the oracle replays: normalized sample A/2¹⁵ is exact,
    * its square is exact, the k-term sum is exact, and division + sqrt
    * are correctly rounded identically in both engines — bit-equal
    * doubles, full hash check on a real codec path.
    */
  def mmDecodeAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
    ds.mapPartitions { it =>
      it.flatMap { case (id, nc) =>
        val n = (nc % 41 + 20).toInt
        val k = (nc % (n - 1) + 1).toInt
        val amp = (java.lang.Math.floorMod(id, 75L).toInt + 50) * 256
        val data = new Array[Byte](n * 2)
        var i = 0
        while (i < k) { // little-endian 16-bit PCM
          data(2 * i) = (amp & 0xff).toByte
          data(2 * i + 1) = ((amp >> 8) & 0xff).toByte
          i += 1
        }
        // registry-free container assembly (bit-identical to the
        // AudioSystem.write bytes, FormatsSpec) — AudioSystem's
        // provider lookup is a global monitor, a convoy at 32 threads
        AudioCodec.decode(id, AudioCodec.wavBytes(data, 8000))
      }
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_frames"), col("duration_s"), col("rms"), col("peak"),
        col("silence_frac"))
      .orderBy(col("doc_id"))
  }

  /** Spectral features over the REAL WAV decode path: the same
    * deterministic rectangular-pulse fixtures as [[mmDecodeAudio]]
    * (k hot samples of amplitude A in an n-sample window), encoded to
    * WAV, decoded by [[AudioCodec.decodeSamples]], transformed by
    * [[AudioCodec]]'s DSP members — centroid/rolloff/flatness, the brightness/
    * bandwidth/tonality triple an audio-corpus curator filters on.
    * Rows-only ◦ (cos/sin make cross-engine bit parity impossible);
    * the spec pins the DFT against the signal's CLOSED-FORM Dirichlet-
    * kernel spectrum — an analytic oracle, not a code replica.  Same
    * plan shape as the decode twin: one narrow mapPartitions pass, no
    * shuffle before the presentation sort.
    */
  def mmAudioSpectral(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
    ds.mapPartitions { it =>
      it.flatMap { case (id, nc) =>
        val n = (nc % 41 + 20).toInt
        val k = (nc % (n - 1) + 1).toInt
        val amp = (java.lang.Math.floorMod(id, 75L).toInt + 50) * 256
        val data = new Array[Byte](n * 2)
        var i = 0
        while (i < k) {
          data(2 * i) = (amp & 0xff).toByte
          data(2 * i + 1) = ((amp >> 8) & 0xff).toByte
          i += 1
        }
        // registry-free container assembly — see mmDecodeAudio
        AudioCodec.decodeSamples(AudioCodec.wavBytes(data, 8000)).map { case (sr, x) =>
          val mag = AudioCodec.magnitudes(x)
          (id, x.length.toLong,
            AudioCodec.centroidHz(mag, sr, x.length),
            AudioCodec.rolloffHz(mag, sr, x.length),
            AudioCodec.flatness(mag))
        }
      }
    }.toDF("doc_id", "n_samples", "centroid_hz", "rolloff_hz", "flatness")
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_spectral" -> (mmAudioSpectral _),
    "mm_phash" -> (mmPhash _),
    "mm_dedup" -> (mmDedup _),
    "mm_ingest" -> (mmIngest _),
    "mm_features" -> (mmFeatures _),
    "mm_decode_image" -> (mmDecodeImage _),
    "mm_decode_audio" -> (mmDecodeAudio _),
    "mm_frames" -> (mmFrames _))

  def oracleSql: Map[String, String] = Map(
    // the oracle PREDICTS what the real PNG decode must see: fixture
    // geometry and two-bin histogram replayed from (doc_id, n_chars)
    // arithmetic; mode_frac is count/npx, a correctly-rounded IEEE
    // quotient in both engines.  w ≤ 14, h ≤ 8 → resize is identity.
    "mm_decode_image" ->
      """WITH g AS (SELECT doc_id,
        |  n_chars % 13 + 2 AS w, n_chars % 7 + 2 AS h, n_chars FROM documents),
        |q AS (SELECT doc_id, w, h, w*h AS npx,
        |  n_chars % (w*h) AS k0 FROM g),
        |r AS (SELECT doc_id, w, h, npx,
        |  CASE WHEN 2*k0 = npx THEN k0 + 1 ELSE k0 END AS k FROM q)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w AS BIGINT) AS resized_w, CAST(h AS BIGINT) AS resized_h,
        |  CAST(CASE WHEN k > npx - k THEN (doc_id % 7) * 2
        |       ELSE (doc_id % 7) * 2 + 1 END AS BIGINT) AS mode_bin,
        |  CAST(GREATEST(k, npx - k) AS DOUBLE) / npx AS mode_frac
        |FROM r ORDER BY doc_id""".stripMargin,
    // normalized amplitude A/32768 is exact (A a multiple of 256 under
    // 2^15), k·x² is exact, /n and sqrt correctly rounded → bit-equal
    "mm_decode_audio" ->
      """WITH p AS (SELECT doc_id, n_chars % 41 + 20 AS n, n_chars FROM documents),
        |q AS (SELECT doc_id, n, n_chars % (n - 1) + 1 AS k,
        |  (doc_id % 75 + 50) * 256 AS amp FROM p),
        |x AS (SELECT doc_id, n, k, CAST(amp AS DOUBLE) / 32768 AS xv FROM q)
        |SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(n AS DOUBLE) / 8000 AS duration_s,
        |  sqrt(k * (xv * xv) / n) AS rms,
        |  xv AS peak,
        |  CAST(n - k AS DOUBLE) / n AS silence_frac
        |FROM x ORDER BY doc_id""".stripMargin,
    // ascii()-per-character = UTF-8-byte-per-byte only on an ASCII
    // corpus (the established text_rollhash/mm_features assumption,
    // verified at every SF) — a non-ASCII corpus would need a
    // byte-level oracle replay here
    "mm_phash" ->
      """WITH ch AS (SELECT doc_id, length(text) AS n,
        |  unnest([ascii(substr(text, CAST(i AS INT), 1)) % 16 for i in range(1, length(text)+1)]) AS bin
        |  FROM documents),
        |cnt AS (SELECT doc_id, n, bin, COUNT(*) AS c FROM ch GROUP BY doc_id, n, bin),
        |sig AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN c * 16 > n THEN (CAST(1 AS BIGINT) << bin) ELSE 0 END) AS BIGINT) AS phash
        |  FROM cnt GROUP BY doc_id),
        |alldocs AS (SELECT d.doc_id, COALESCE(s.phash, 0) AS phash
        |            FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id),
        |sz AS (SELECT phash, COUNT(*) AS n_same FROM alldocs GROUP BY phash)
        |SELECT f.doc_id, f.phash, sz.n_same
        |FROM alldocs f JOIN sz ON f.phash = sz.phash
        |ORDER BY f.doc_id""".stripMargin,
    "mm_dedup" ->
      """SELECT sha256(text) AS sha, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY sha ORDER BY sha""".stripMargin,
    "mm_ingest" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha, 'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the corpus is ASCII (verified at every SF), so the stub's byte
    // histogram is recomputable from codepoints: bin = ascii % 16.
    // The pseudo width/height replay the Scala Long WRAP of
    // doc_id * 2654435761 (resp. 40503) in HUGEINT mod-2⁶⁴ arithmetic
    // before abs() — BIGINT multiplication would raise an overflow
    // error past doc_id ≈ 3.5e9 where the engine silently wraps, so
    // the straight abs(doc_id * k) form is only valid at toy ids
    "mm_features" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(range(1, length(text)+1)) AS i, text FROM documents),
        |bins AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) % 16 AS bin FROM ch),
        |hist AS (
        |  SELECT doc_id, bin, COUNT(*) AS cnt FROM bins GROUP BY doc_id, bin),
        |md AS (
        |  SELECT doc_id, bin AS mode_bin, cnt AS mode_cnt FROM hist
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bin) = 1),
        |wrap AS (
        |  SELECT doc_id,
        |    CAST((CAST(doc_id AS HUGEINT) * 2654435761) % CAST('18446744073709551616' AS HUGEINT) AS HUGEINT) AS wu,
        |    CAST((CAST(doc_id AS HUGEINT) * 40503) % CAST('18446744073709551616' AS HUGEINT) AS HUGEINT) AS hu
        |  FROM documents),
        |sgn AS (
        |  SELECT doc_id,
        |    abs(CAST(CASE WHEN wu >= CAST('9223372036854775808' AS HUGEINT)
        |      THEN wu - CAST('18446744073709551616' AS HUGEINT) ELSE wu END AS BIGINT)) AS aw,
        |    abs(CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
        |      THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT)) AS ah
        |  FROM wrap),
        |meta AS (
        |  SELECT d.doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    64 + aw % 192 AS w,
        |    64 + ah % 192 AS h
        |  FROM documents d JOIN sgn USING (doc_id))
        |SELECT m.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(CASE WHEN w <= 224 AND h <= 224 THEN w
        |    ELSE GREATEST(1, CAST(ROUND(w * (224.0 / GREATEST(w, h))) AS BIGINT)) END AS BIGINT) AS resized_w,
        |  CAST(CASE WHEN w <= 224 AND h <= 224 THEN h
        |    ELSE GREATEST(1, CAST(ROUND(h * (224.0 / GREATEST(w, h))) AS BIGINT)) END AS BIGINT) AS resized_h,
        |  n_bytes,
        |  CAST(COALESCE(mode_bin, 0) AS BIGINT) AS mode_bin,
        |  COALESCE(CAST(mode_cnt AS DOUBLE) / GREATEST(n_bytes, 1), 0.0) AS mode_frac
        |FROM meta m LEFT JOIN md USING (doc_id)
        |ORDER BY m.doc_id""".stripMargin,
    // the stub's frame hash (h·31 + byte from the frame offset, seed
    // 1125899906842597) replayed in HUGEINT modular arithmetic —
    // bit-exact on the ASCII corpus where ascii() = the payload byte
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (SELECT doc_id, text, n, unnest([0,1,2,3]) AS frame_idx FROM d),
        |o AS (SELECT doc_id, text, n, frame_idx,
        |  (GREATEST(n, 1) * frame_idx) // 4 AS off FROM f),
        |h AS (SELECT doc_id, frame_idx, off,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(range(CAST(off + 1 AS INT), CAST(LEAST(n, off + 64) + 1 AS INT)),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (acc, x) -> (acc * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS hu
        |  FROM o)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, CAST(off AS BIGINT) AS "offset",
        |  CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS frame_hash
        |FROM h ORDER BY doc_id, frame_idx""".stripMargin)
}

/** JDK-native image decoding behind the codec seam: `javax.imageio`
  * ships PNG/JPEG/BMP/GIF/WBMP readers with every JRE — zero new
  * dependencies — so IMAGE payloads decode for real
  * ([[Multimodal.mmFeaturesImage]]); audio/video still need external
  * codecs and keep the stub.  Features are a 16-bin LUMINANCE
  * histogram (Rec.601 integer luma, 16-wide bins), so the
  * [[MultimodalStub.phash16]] >1/16-mass signature rule runs unchanged
  * over real pixels ([[phashPixels]]).
  */
object ImageCodec {

  /** None ⇔ no installed reader accepts the bytes (corrupt or unknown
    * format) — callers decide whether that is a drop or an error.
    * Per-pixel getRGB keeps this colormodel-agnostic; a throughput-
    * critical deployment would read raster bands directly.
    */
  def decode(id: Long, bytes: Array[Byte]): Option[MultimodalStub.MediaFeatures] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Double](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 4) += 1.0
          x += 1
        }
        y += 1
      }
      val n = math.max(w.toLong * h, 1L).toDouble
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      val (rw, rh) = MultimodalStub.fitResize(w, h, 224)
      Some(MultimodalStub.MediaFeatures(id, w, h, rw, rh, bytes.length.toLong, hist))
    }
  }

  /** Pixel-domain 16-bit signature: bit b set ⇔ luminance bin b holds
    * more than the uniform 1/16 mass — [[MultimodalStub.phash16]]'s
    * rule over decoded pixels, so re-encoded (PNG↔BMP) images with the
    * same pixel content collide, which is the point of a perceptual
    * hash and what the byte-domain sha can never do.
    */
  def phashPixels(f: MultimodalStub.MediaFeatures): Int = {
    var sig = 0
    var b = 0
    while (b < 16) {
      if (f.features(b) > 1.0 / 16) sig |= 1 << b
      b += 1
    }
    sig
  }

  /** Deterministic pixel-domain thumbnail: nearest-neighbor sample at
    * the integer grid `src = dst * srcDim / dstDim` (pure integer
    * arithmetic — no filtering kernel, no float geometry — so the
    * output PNG bytes are bit-identical across JVMs/runs, which is
    * what a content-addressed media store needs from its derivatives),
    * re-encoded as PNG.  None ⇔ undecodable input or non-positive
    * target dims.  Runs inside the same `mapPartitions` codec seam as
    * [[decode]]; at 100 TB thumbnailing is scan-bandwidth map work
    * with zero shuffle.
    */
  def thumbnail(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    if (tw <= 0 || th <= 0) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < th) {
        val sy = math.min(ty * h / th, h - 1)
        var tx = 0
        while (tx < tw) {
          val sx = math.min(tx * w / tw, w - 1)
          out.setRGB(tx, ty, img.getRGB(sx, sy) & 0xffffff)
          tx += 1
        }
        ty += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }
}

/** JDK-native AUDIO decoding behind the codec seam:
  * `javax.sound.sampled` ships a WAV/AIFF/AU container parser and PCM
  * handling with every JRE — zero new dependencies — so uncompressed
  * audio payloads decode for real, the [[ImageCodec]] treatment
  * applied to the second modality.  Compressed codecs (MP3/AAC/Opus)
  * have no JRE decoder and stay behind the declared stub; video still
  * needs external codecs entirely.
  *
  * Features are the signals an audio curation pipeline filters on:
  * format metadata (rate/channels/bit depth/frames/duration) plus
  * amplitude statistics over normalized samples — RMS (too-quiet
  * gate), peak (clipping gate at ≈1.0), and the fraction of samples
  * under the 0.01 silence threshold (dead-air gate).  Supports the
  * PCM layouts WAV actually uses: 16-bit signed (either endianness)
  * and 8-bit unsigned/signed, any channel count (statistics pool all
  * channels).  Undecodable or non-PCM bytes → None, the
  * dropped-not-thrown contract.
  */
object AudioCodec {
  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_s: Double, rms: Double,
      peak: Double, silence_frac: Double)

  final val SilenceThreshold = 0.01

  /** Parsed PCM payload: everything the stats/DSP consumers need,
    * independent of which container parser produced it.
    */
  private final case class Pcm(sampleRate: Int, channels: Int, bits: Int,
      unsigned: Boolean, bigEndian: Boolean, data: Array[Byte], frames: Long)

  /** Pure-byte RIFF/WAVE PCM parser — the registry-free fast path for
    * the one container every fixture and [[wavBytes]] produce.
    * `AudioSystem.getAudioInputStream` walks the installed provider
    * list through `JDK13Services.getProviders`, a SYNCHRONIZED static
    * consulted per call — fine on a desktop, a lock CONVOY inside a
    * 32-thread `mapPartitions` codec seam: the r19 sf10 pass measured
    * the audio pair at task ≈ 30 × wall the moment the read-layer
    * widen parallelized the scan (500k WAV opens serializing on one
    * monitor — wall went UP 2.5× vs the single-task r18 reading).
    * Parsing the container ourselves is the ProtoCodec/AvroCodec
    * move — a public wire spec implemented directly; non-RIFF bytes
    * fall back to AudioSystem so AIFF/AU keep the old breadth on the
    * cold path.  WAV semantics per the spec: fmt code 1 (PCM),
    * 16-bit = signed little-endian, 8-bit = unsigned; unknown chunks
    * skipped word-aligned; fmt must precede data; a data chunk
    * overrunning the buffer is corrupt → None (dropped, not thrown).
    */
  private def parseWav(bytes: Array[Byte]): Option[Pcm] = {
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int, t: String): Boolean =
      bytes(o) == t.charAt(0).toByte && bytes(o + 1) == t.charAt(1).toByte &&
        bytes(o + 2) == t.charAt(2).toByte && bytes(o + 3) == t.charAt(3).toByte
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmtSeen = false
    var code = 0; var ch = 0; var rate = 0; var bits = 0
    while (off + 8 <= bytes.length) {
      val sz = u32(off + 4)
      if (sz < 0 || sz > Int.MaxValue - 8) return None
      val n = sz.toInt
      if (tag(off, "fmt ") && n >= 16 && off + 8 + 16 <= bytes.length) {
        code = u16(off + 8); ch = u16(off + 10)
        rate = u32(off + 12).toInt; bits = u16(off + 22)
        fmtSeen = true
      } else if (tag(off, "data")) {
        val start = off + 8
        if (!fmtSeen || start + n > bytes.length) return None
        if (code != 1 || (bits != 16 && bits != 8) || ch < 1 || rate < 1) return None
        val data = java.util.Arrays.copyOfRange(bytes, start, start + n)
        val blockAlign = ch * (bits / 8)
        return Some(Pcm(rate, ch, bits, unsigned = bits == 8, bigEndian = false,
          data, n.toLong / blockAlign))
      }
      off += 8 + n + (n & 1)
    }
    None
  }

  /** Canonical-header PCM WAV container: RIFF + 16-byte fmt + data,
    * bit-identical to javax.sound's WaveFileWriter output for the same
    * payload (pinned in FormatsSpec) with zero provider-registry
    * traffic — the encode twin of [[parseWav]] for the per-row codec
    * seams.
    */
  def wavBytes(data: Array[Byte], sampleRate: Int, bits: Int = 16,
      channels: Int = 1): Array[Byte] = {
    val blockAlign = channels * (bits / 8)
    val out = new Array[Byte](44 + data.length)
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(o: Int, t: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = t.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); w32(4, 36L + data.length); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, channels)
    w32(24, sampleRate.toLong); w32(28, sampleRate.toLong * blockAlign)
    w16(32, blockAlign); w16(34, bits)
    tag(36, "data"); w32(40, data.length.toLong)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** AudioSystem cold path (non-RIFF containers: AIFF/AU) → [[Pcm]].
    * Same format support and dropped-not-thrown contract as before the
    * fast path existed.
    */
  private def viaAudioSystem(bytes: Array[Byte]): Option[Pcm] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: RuntimeException => null
      }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ok = (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
        (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
      if (!ok) return None
      val data = ais.readAllBytes()
      val nSamples = data.length / (bits / 8)
      val frames =
        if (ais.getFrameLength >= 0) ais.getFrameLength
        else nSamples.toLong / math.max(fmt.getChannels, 1)
      Some(Pcm(fmt.getSampleRate.toInt, fmt.getChannels, bits,
        unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED,
        bigEndian = fmt.isBigEndian, data, frames))
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    } finally ais.close()
  }

  /** RIFF magic makes [[parseWav]] AUTHORITATIVE (a malformed or
    * truncated WAV is corrupt → dropped; the old AudioSystem path
    * would decode a truncated container's partial samples under the
    * header's full frame count — inconsistent stats, not a feature);
    * anything else tries the provider registry once on the cold path
    * (AIFF/AU breadth preserved).
    */
  private def parsePcm(bytes: Array[Byte]): Option[Pcm] =
    if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') parseWav(bytes)
    else viaAudioSystem(bytes)

  /** Normalized sample i of a PCM payload — the ONE sample-decode
    * expression both the stats and DSP consumers fold over (16-bit
    * signed at either endianness, 8-bit signed/unsigned), hoisted so
    * the two paths cannot fork.
    */
  @inline private def sampleAt(p: Pcm, i: Int): Double =
    if (p.bits == 16) {
      val o = i * 2
      val v = if (p.bigEndian) ((p.data(o) << 8) | (p.data(o + 1) & 0xff)).toShort
      else ((p.data(o + 1) << 8) | (p.data(o) & 0xff)).toShort
      v / 32768.0
    } else if (p.unsigned) ((p.data(i) & 0xff) - 128) / 128.0
    else p.data(i) / 128.0

  /** Raw normalized samples (all channels pooled, [-1, 1]) plus the
    * sample rate — the DSP members below consume.  Same format
    * support and dropped-not-thrown contract as [[decode]].
    */
  def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Double])] =
    parsePcm(bytes).map { p =>
      val nSamples = p.data.length / (p.bits / 8)
      val out = new Array[Double](nSamples)
      var i = 0
      while (i < nSamples) { out(i) = sampleAt(p, i); i += 1 }
      (p.sampleRate, out)
    }

  /** |X[f]| for f = 0 .. n/2 (real-signal half spectrum). */
  def magnitudes(x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    val out = new Array[Double](n / 2 + 1)
    var f = 0
    while (f < out.length) {
      var re = 0.0
      var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * f * t / n
        re += x(t) * math.cos(ang)
        im += x(t) * math.sin(ang)
        t += 1
      }
      out(f) = math.sqrt(re * re + im * im)
      f += 1
    }
    out
  }

  /** Magnitude-weighted mean frequency in Hz (DC carries zero weight). */
  def centroidHz(mag: Array[Double], sampleRate: Int, n: Int): Double = {
    var num = 0.0
    var den = 0.0
    var f = 0
    while (f < mag.length) {
      num += f.toDouble * sampleRate / n * mag(f)
      den += mag(f)
      f += 1
    }
    if (den > 0) num / den else 0.0
  }

  /** Lowest bin frequency (Hz) where cumulative ENERGY reaches
    * `frac` of the total. */
  def rolloffHz(mag: Array[Double], sampleRate: Int, n: Int,
      frac: Double = 0.85): Double = {
    var total = 0.0
    var f = 0
    while (f < mag.length) { total += mag(f) * mag(f); f += 1 }
    if (total <= 0) return 0.0
    var acc = 0.0
    f = 0
    while (f < mag.length) {
      acc += mag(f) * mag(f)
      if (acc >= frac * total) return f.toDouble * sampleRate / n
      f += 1
    }
    (mag.length - 1).toDouble * sampleRate / n
  }

  /** Geometric / arithmetic mean of the energy spectrum over the
    * non-DC bins, floored at 1e-12 so a silent bin doesn't collapse
    * the log (flatness → 1 for white noise, → 0 for a pure tone).
    */
  def flatness(mag: Array[Double]): Double = {
    if (mag.length < 2) return 0.0
    var logSum = 0.0
    var sum = 0.0
    var f = 1
    while (f < mag.length) {
      val e = math.max(mag(f) * mag(f), 1e-12)
      logSum += math.log(e)
      sum += e
      f += 1
    }
    val m = (mag.length - 1).toDouble
    // AM-GM bounds the true value at 1; the clamp only absorbs the
    // one-ulp float excess a perfectly flat spectrum can produce
    math.min(1.0, math.exp(logSum / m) / (sum / m))
  }

  def decode(id: Long, bytes: Array[Byte]): Option[AudioFeatures] =
    parsePcm(bytes).map { p =>
      val nSamples = p.data.length / (p.bits / 8)
      var i = 0
      var sumSq = 0.0
      var peak = 0.0
      var silent = 0L
      while (i < nSamples) {
        val x = sampleAt(p, i)
        val a = math.abs(x)
        sumSq += x * x
        if (a > peak) peak = a
        if (a < SilenceThreshold) silent += 1
        i += 1
      }
      AudioFeatures(id, p.sampleRate, p.channels, p.bits,
        p.frames, p.frames / math.max(p.sampleRate.toDouble, 1e-9),
        if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0,
        peak,
        if (nSamples > 0) silent.toDouble / nSamples else 0.0)
    }
}

/** Deterministic byte-domain decoder for media WITHOUT a JDK codec
  * (compressed audio and all video — this container ships no external
  * codecs): `fakeDecode` stands in with a deterministic transform of
  * the bytes so the pipeline shape (typed rows out of binary batches)
  * is testable; images decode for real via [[ImageCodec]] and
  * uncompressed WAV/PCM audio via [[AudioCodec]].
  */
object MultimodalStub {
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      resized_w: Int, resized_h: Int, n_bytes: Long, features: Array[Double]) {

    /** Driver-checkable scalar projection: histogram mode (lowest bin on
      * ties) + its mass.  Normalized bins are exact IEEE quotients of
      * integer counts, so equal counts give identical doubles and the
      * tie-break is deterministic.
      */
    def toScalars: MediaScalars = {
      var best = 0
      var b = 1
      while (b < features.length) {
        if (features(b) > features(best)) best = b
        b += 1
      }
      MediaScalars(doc_id, width.toLong, height.toLong, resized_w.toLong,
        resized_h.toLong, n_bytes, best.toLong, features(best))
    }
  }

  case class MediaScalars(doc_id: Long, width: Long, height: Long,
      resized_w: Long, resized_h: Long, n_bytes: Long, mode_bin: Long, mode_frac: Double)

  /** Aspect-preserving resize to fit a square target (stub geometry —
    * the arithmetic a real resize kernel would use for its output
    * allocation; only the pixel transform itself needs the codec).
    */
  def fitResize(w: Int, h: Int, target: Int): (Int, Int) =
    if (w <= target && h <= target) (w, h)
    else {
      val scale = target.toDouble / math.max(w, h)
      (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
    }

  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame_hash: Long)

  /** Evenly-spaced frame sampling over the payload bytes; the per-frame
    * hash stands in for decoded frame content.
    */
  def fakeFrameSample(id: Long, bytes: Array[Byte], k: Int): Seq[Frame] = {
    val n = math.max(bytes.length, 1)
    (0 until k).map { i =>
      val off = (n.toLong * i) / k
      var h = 1125899906842597L
      var j = off.toInt
      val end = math.min(bytes.length, j + 64)
      while (j < end) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
      Frame(id, i, off, h)
    }
  }

  /** 16-bit perceptual signature from the byte histogram: bit b set ⇔
    * bin b exceeds the uniform 1/16 mass.  The compare is 16·count > n
    * in integers — no division, engine-exact, permutation-invariant in
    * the payload bytes.
    */
  def phash16(bytes: Array[Byte]): Int = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) % 16) += 1; i += 1 }
    var sig = 0
    var b = 0
    while (b < 16) {
      if (counts(b) * 16 > bytes.length) sig |= 1 << b
      b += 1
    }
    sig
  }

  def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % 16) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    var b = 0
    while (b < 16) { hist(b) /= n; b += 1 }
    // pseudo dimensions derived from content so they're stable per doc
    val w = 64 + (math.abs(id * 2654435761L) % 192).toInt
    val h = 64 + (math.abs(id * 40503L) % 192).toInt
    val (rw, rh) = fitResize(w, h, 224)
    MediaFeatures(id, w, h, rw, rh, bytes.length.toLong, hist)
  }
}
