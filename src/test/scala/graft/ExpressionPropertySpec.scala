package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Property tests for the native Catalyst expressions: each one is
  * checked against an independent reference formulation on randomized
  * inputs — the codegen'd hot-path implementations must agree with the
  * slow obvious ones on EVERY input, not just the corpus fixtures.
  */
class ExpressionPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic scalacheck sampling (no scalatest-plus bridge in
    * the build): fixed seeds, so a failure reproduces exactly.
    */
  private def forAll[A](g: Gen[A], rounds: Int = 8)(body: A => Unit): Unit =
    (1 to rounds).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(0x5eedL ^ i)).get)
    }

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  test("rolling_hash64 equals a BigInt modular replay on random strings") {
    import spark.implicits._
    val P = BigInt(1000000007)
    val M = BigInt(1) << 64
    val HALF = BigInt(1) << 63
    forAll(Gen.listOfN(20, text)) { ts =>
      val df = ts.toDF("t")
        .select(RollingHash64.rollingHash64(col("t")).as("h"))
      val got = df.collect().map(_.getLong(0))
      val want = ts.map { t =>
        var acc = BigInt(0)
        t.getBytes("UTF-8").foreach { b => acc = (acc * P + BigInt(b & 0xff)) % M }
        (if (acc >= HALF) acc - M else acc).toLong
      }
      assert(got.toSeq === want)
    }
  }

  test("normalize_text equals a java.text.Normalizer + regex replay on random unicode") {
    import spark.implicits._
    // characters spanning the interesting classes: ASCII, controls,
    // spaces, combining marks, precomposed accents, CJK, DEL
    val ch: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\u0000', '\u0001', '\u007f'),
      2 -> Gen.oneOf('\u0301', '\u0308', 'e', 'a', '\u00e9', '\u00e4'),
      1 -> Gen.oneOf('\u4e16', '\u754c'))
    val str: Gen[String] = Gen.listOf(ch).map(_.mkString)
    forAll(Gen.listOfN(24, str)) { ts =>
      val got = ts.toDF("t")
        .select(NormalizeText.normalizeText(col("t")).as("n"))
        .collect().map(_.getString(0))
      val want = ts.map { t =>
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
          .map(c => if (c < 0x20 || c == 0x7f) ' ' else c)
          .mkString.replaceAll(" +", " ").trim
      }
      assert(got.toSeq === want)
      // idempotence: the canonical form is a fixed point
      val twice = got.toSeq.toDF("t")
        .select(NormalizeText.normalizeText(col("t")).as("n"))
        .collect().map(_.getString(0))
      assert(twice.toSeq === got.toSeq)
      // invariants: no controls, no leading/trailing/double spaces
      got.foreach { s =>
        assert(!s.exists(c => c < 0x20 || c == 0x7f))
        assert(!s.contains("  ") && s.trim == s)
      }
    }
  }

  test("norm_text_fp is bit-identical to the verbatim r01-r19 builtin regex chain") {
    import spark.implicits._
    // the formulation normText shipped with through round 19, verbatim —
    // the fingerprint md5s of the whole exact-dedup family hang off
    // byte equality with it
    def oldChain(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]+", " "), " +", " "))
    // adversarial fixtures: junk runs at ends/middle, unicode whose
    // lowercase EXPANDS (U+0130 -> i + combining dot: the combining
    // mark must read as junk), non-BMP surrogate pairs, all-junk,
    // digits-only, already-canonical, empty
    val fixtures = Seq(
      "", " ", "...", "a", "A.B..C", "  a  b  ", "İstanbul",
      "naïve résumé", "emoji😀mix", "123-456",
      "tab\there\nnewline", "UPPER lower 42", "世界 peace",
      "a" * 500 + "." + "b" * 500)
    val ch: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '.', ',', '-', '_', '\u0000', '\u007f'),
      2 -> Gen.oneOf('É', 'é', 'İ', '́', 'Z', 'Q'),
      1 -> Gen.oneOf('世', '\ud83d', '\ude00')) // lone surrogates too
    val str: Gen[String] = Gen.listOf(ch).map(_.mkString)
    forAll(Gen.listOfN(24, str)) { rand =>
      val ts = fixtures ++ rand
      val rows = ts.toDF("t")
        .select(NormTextFp.normTextFp(col("t")).as("got"), oldChain(col("t")).as("want"))
        .collect()
      rows.zip(ts).foreach { case (r, t) =>
        assert(r.getString(0) == r.getString(1), s"input ${t.take(60)}")
      }
      // null passes through like the builtin chain
      val nr = Seq[String](null).toDF("t")
        .select(NormTextFp.normTextFp(col("t")).as("got"), oldChain(col("t")).as("want"))
        .collect()(0)
      assert(nr.isNullAt(0) && nr.isNullAt(1))
    }
  }

  test("adc_score equals the element_at formulation on random codes/tables") {
    import spark.implicits._
    val m = 8
    val gen = for {
      codes <- Gen.listOfN(m, Gen.choose(0, 15))
      tabs <- Gen.listOfN(m, Gen.listOfN(16, Gen.choose(-5.0, 5.0)))
    } yield (codes, tabs)
    forAll(Gen.listOfN(10, gen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("codes", "tabs")
        val got = df.select(AdcScore.adcScore(col("codes"), col("tabs")).as("s"))
          .collect().map(_.getDouble(0))
        // reference: the m-way element_at tree the native expr replaced
        val ref = df.select((0 until m).map { j =>
          element_at(element_at(col("tabs"), j + 1), element_at(col("codes"), j + 1) + 1)
        }.reduce(_ + _).as("s")).collect().map(_.getDouble(0))
        assert(got.toSeq === ref.toSeq)
      }
    }
  }

  test("window_hashes equals the direct per-window polynomial on random token arrays") {
    import spark.implicits._
    val M = BigInt(1) << 64
    val HALF = BigInt(1) << 63
    val Q = BigInt(WindowHashes.Q)
    def tokenHash(t: String): BigInt = {
      var acc = BigInt(0)
      t.getBytes("UTF-8").foreach { b => acc = (acc * BigInt(1000000007) + BigInt(b & 0xff)) % M }
      acc
    }
    forAll(Gen.listOfN(10, Gen.listOf(word)), rounds = 6) { arrs =>
      Seq(1, 3, 7).foreach { w =>
        val df = arrs.toDF("toks")
          .select(WindowHashes.windowHashes(col("toks"), w).as("h"))
        val got = df.collect().map(_.getSeq[Long](0).toSeq)
        // reference: recompute every window from scratch — the rolled
        // subtract-scale-add must equal the direct Σ th·Q^(w−1−j)
        val want = arrs.map { toks =>
          if (toks.length < w) Seq.empty[Long]
          else toks.map(tokenHash).sliding(w).map { win =>
            val acc = win.foldLeft(BigInt(0))((a, th) => (a * Q + th) % M)
            (if (acc >= HALF) acc - M else acc).toLong
          }.toSeq
        }
        assert(got.toSeq === want)
      }
    }
  }

  test("char_pairs equals sliding(2) on random strings") {
    import spark.implicits._
    forAll(Gen.listOfN(20, text)) { ts =>
      val df = ts.toDF("t").select(CharPairs.charPairs(col("t")).as("p"))
      val got = df.collect().map(_.getSeq[String](0).toSeq)
      val want = ts.map(t => if (t.length < 2) Seq.empty[String] else t.sliding(2).toSeq)
      assert(got.toSeq === want)
    }
  }

  test("word_shingles equals sliding(n).mkString on random token arrays") {
    import spark.implicits._
    forAll(Gen.listOfN(15, Gen.listOf(word))) { tokLists =>
      if (tokLists.nonEmpty) {
        val df = tokLists.toDF("toks")
          .select(WordShingles.wordShingles(col("toks"), 3).as("sh"))
        val got = df.collect().map(_.getSeq[String](0).toSeq)
        val want = tokLists.map { toks =>
          if (toks.length < 3) Seq.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        }
        assert(got.toSeq === want)
      }
    }
  }

  test("bpe_chunk_seqs invariants hold on random word arrays and budgets") {
    import spark.implicits._
    val t = Bpe.default
    val gen = for {
      ws <- Gen.listOf(word)
      seqLen <- Gen.choose(3, 24)
      overlap <- Gen.choose(0, 6)
    } yield (ws, seqLen, overlap)
    forAll(gen, rounds = 24) { case (ws, seqLen, overlap) =>
      val rows = Seq(1).toDF("i")
        .select(posexplode(Bpe.bpeChunkSeqs(
          typedLit(ws), t, seqLen, overlap)).as(Seq("idx", "c")))
        .select(col("idx"), col("c.text"), col("c.n_words"),
          col("c.n_overlap"), col("c.n_bpe"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      def cost(w: String) = Bpe.segment(w, t).length.toLong
      // empty input → one empty sequence; else every sequence
      // non-empty with true counts
      if (ws.isEmpty) assert(rows.toSeq === Seq((0, "", 0L, 0L, 0L)))
      else {
        rows.foreach { case (_, text, nw, _, nb) =>
          val sw = text.split(" ").filter(_.nonEmpty).toSeq
          assert(sw.length.toLong === nw)
          assert(sw.map(cost).sum === nb)
          // budget holds unless a single word overflows alone
          assert(nb <= seqLen || nw === 1L)
        }
        // rebuild: drop each sequence's declared overlap prefix
        val rebuilt = rows.flatMap { case (_, text, _, ov, _) =>
          text.split(" ").filter(_.nonEmpty).drop(ov.toInt)
        }
        assert(rebuilt.toSeq === ws)
        // declared overlaps really are shared suffix/prefix word runs
        rows.sliding(2).foreach {
          case Array((_, a, _, _, _), (_, b, _, ov, _)) =>
            val at = a.split(" ").filter(_.nonEmpty)
            val bt = b.split(" ").filter(_.nonEmpty)
            assert(at.takeRight(ov.toInt).toSeq === bt.take(ov.toInt).toSeq)
          case _ =>
        }
      }
    }
  }

  test("dot_product equals a strict left fold on random vectors") {
    import spark.implicits._
    val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    forAll(Gen.listOfN(10, Gen.zip(vec, vec))) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val got = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
          .collect().map(_.getDouble(0))
        val want = pairs.map { case (a, b) =>
          a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
        }
        assert(got.toSeq === want)
      }
    }
  }
}
