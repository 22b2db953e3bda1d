package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A loaded byte-pair-encoding merge table: pair → rank, rank = merge
  * priority (lower merges first).  Built by [[Bpe.loadMerges]] from the
  * public one-"left right"-pair-per-line format (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"; the
  * same layout GPT-2's merges.txt popularized).  Serializable so the
  * expressions below ship it to executors once as a task-closure /
  * codegen reference object — never per row.
  */
final class BpeTable(pairs: Array[(String, String)], alphabet: Array[String])
    extends Serializable {

  /** Alphabet derived from the merges themselves: every distinct
    * character appearing in any pair side — see
    * [[BpeTable.derivedAlphabet]].
    */
  def this(pairs: Array[(String, String)]) =
    this(pairs, BpeTable.derivedAlphabet(pairs))

  private val ranks = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
    m
  }
  val size: Int = pairs.length
  /** Merge rank of (a, b), or Int.MaxValue if the pair never merges. */
  def rank(a: String, b: String): Int = {
    val r = ranks.get(a + "\u0000" + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** Symbol → vocab id, derived the standard BPE way: ids
    * 0..|alphabet|−1 enumerate the base alphabet in its given order,
    * then one id per merge OUTPUT in rank order — a trained
    * tokenizer's vocab file is exactly this enumeration.  Unknown
    * symbols map to −1: callers filter or substitute (a byte-level
    * base alphabet assigns every byte an id, so −1 never appears
    * there).  Ids stay rank-aligned even if two merges produce the
    * same output string (first wins; likewise an alphabet entry
    * duplicated by a later merge output).
    */
  private val vocab = {
    val m = new java.util.HashMap[String, Integer](alphabet.length + pairs.length * 2)
    var id = 0
    alphabet.foreach { c =>
      if (!m.containsKey(c)) m.put(c, id)
      id += 1
    }
    pairs.foreach { case (a, b) =>
      if (!m.containsKey(a + b)) m.put(a + b, id)
      id += 1
    }
    m
  }

  def idOf(sym: String): Int = {
    val r = vocab.get(sym)
    if (r == null) -1 else r.intValue()
  }
}

object BpeTable {
  /** Base alphabet a merges file implies: every distinct character
    * appearing in any merge symbol, in code-point order (deterministic
    * regardless of merge order).  A merges file is built bottom-up
    * from characters, so this recovers uppercase, punctuation and
    * byte-remap symbols (e.g. the Ġ space marker GPT-2's merges use)
    * without a hardcoded charset — the previous a–z0–9 seeding made
    * [[BpeEncodeIds]] emit −1 for every symbol outside the bundled
    * fixture's alphabet.  Only a character that appears in NO merge
    * stays unknown; a tokenizer whose full alphabet matters ships it
    * explicitly (e.g. [[Bpe.ByteAlphabet]], or the fixture's
    * [[Bpe.FixtureAlphabet]]) through the two-argument constructor.
    */
  def derivedAlphabet(pairs: Array[(String, String)]): Array[String] = {
    val set = new java.util.TreeSet[String]()
    pairs.foreach { case (a, b) =>
      (a + b).foreach(c => { set.add(String.valueOf(c)); () })
    }
    set.toArray(Array.empty[String])
  }
}

/** Segment one word by the standard BPE encode loop: start from
  * characters, repeatedly merge ALL occurrences of the lowest-rank
  * adjacent pair, stop when no adjacent pair is in the table.  Chars,
  * not bytes: the corpus is ASCII and a char-level loop keeps the
  * fixture human-readable (a byte-level variant only changes the
  * initial alphabet).  Native expression so the per-word merge loop
  * runs as one tight JVM call inside whole-stage codegen.
  */
case class BpeSegment(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_segment requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.segmentArray(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.segmentArray($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
  override def prettyName: String = "bpe_segment"
}

/** Total BPE token count of a word array: Σ |segment(word)| in one
  * pass — the per-document statistic behind token budgets, without
  * materializing the subword strings ([[BpeSegment]] is the
  * inspect-the-pieces surface; this is the hot counting path).
  */
case class BpeTokenCount(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

/** Model-consumable token IDS for a whole word array: each word
  * segments under the merge table, each subword maps through the
  * derived vocab ([[BpeTable.idOf]]), concatenated in order — what a
  * training pipeline actually feeds a model, where
  * [[BpeTokenCount]] only budgets.  Unknown symbols — and null array
  * elements — surface as −1 rather than being dropped: a silent drop
  * would desynchronize ids from the text they claim to encode.
  */
case class BpeEncodeIds(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_ids requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeIds(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeIds($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_ids"
}

/** Greedy BPE-budget training-sequence chunking of a word array: each
  * sequence takes whole words while its BPE token total stays ≤
  * `seqLen`, and the next sequence starts `overlap` WORDS back — so
  * sequence boundaries respect word boundaries (a subword split across
  * sequences would make neither side decodable) while the length
  * budget is counted in the unit that bills against a model's context
  * window.  The whitespace-unit [[graft.operators.Pipeline.chunkSequences]]
  * keeps both bounds in words; this is its model-token twin.
  *
  * Per element of the result: (text, n_words, n_overlap, n_bpe), where
  * n_overlap is the number of leading words shared with the previous
  * sequence (actual carry: `min(overlap, progress)` — never the whole
  * previous sequence, so every sequence advances) and n_bpe =
  * Σ segment cost of its words.  A single word whose own BPE cost
  * exceeds `seqLen` forms an overflowing one-word sequence (n_bpe >
  * seqLen) — the same needs-truncation-upstream signal as
  * [[graft.operators.Pipeline.packStats]]'s utilization > 1.  An empty
  * word array yields one empty sequence, matching the whitespace twin.
  * Concatenating each sequence's words minus its first n_overlap words
  * rebuilds the document exactly (spec-pinned).  Native expression:
  * the per-word greedy scan is sequential state — a fold no HOF
  * expresses in O(n) — so it runs as one tight JVM loop inside
  * whole-stage codegen, table shipped once as a reference object.
  */
case class BpeChunkSeqs(child: Expression, table: BpeTable, seqLen: Int, overlap: Int)
    extends UnaryExpression {
  require(seqLen > 0 && overlap >= 0,
    s"need seqLen > 0 and overlap >= 0, got seqLen=$seqLen overlap=$overlap")

  override def dataType: DataType = BpeChunkSeqs.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_chunk_seqs requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.chunkSeqs(input.asInstanceOf[ArrayData], table, seqLen, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.chunkSeqs($c, $ref, $seqLen, $overlap)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeChunkSeqs =
    copy(child = newChild)
  override def prettyName: String = "bpe_chunk_seqs"
}

object BpeChunkSeqs {
  val schema: DataType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("text", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_overlap", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_bpe", LongType, nullable = false))),
    containsNull = false)
}


object Bpe {

  /** The 256-entry byte-level base: one single-char symbol per byte
    * value (latin-1 code points 0–255, id = byte value).  For merges
    * trained over raw bytes this guarantees no symbol is ever OOV —
    * the property GPT-2-family tokenizers get from their byte
    * alphabet.
    */
  lazy val ByteAlphabet: Array[String] =
    Array.tabulate(256)(b => String.valueOf(b.toChar))

  /** The bundled fixture's corpus charset (a–z then 0–9) — kept
    * explicit so fixture vocab ids are stable ('x' = 23) even for
    * characters its ~50 merges never touch.
    */
  lazy val FixtureAlphabet: Array[String] =
    (('a' to 'z') ++ ('0' to '9')).map(String.valueOf).toArray

  /** Parse merge lines ("left right", '#' comments and blanks skipped;
    * rank = appearance order).  The vocab's base alphabet is
    * `alphabet` if given, else derived from the merges' own symbol
    * set ([[BpeTable.derivedAlphabet]]) — so a real model's merges
    * file (uppercase, punctuation, byte-remap symbols) encodes with
    * no −1 floods out of the box.
    */
  def loadMerges(lines: Iterator[String],
      alphabet: Option[Array[String]] = None): BpeTable = {
    val pairs = lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(' ')
        require(sp.length == 2, s"malformed merge line: '$l'")
        (sp(0), sp(1))
      }
      .toArray
    alphabet match {
      case Some(a) => new BpeTable(pairs, a)
      case None    => new BpeTable(pairs)
    }
  }

  def loadMergesFile(path: String,
      alphabet: Option[Array[String]] = None): BpeTable = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try loadMerges(src.getLines(), alphabet) finally src.close()
  }

  /** The bundled ~50-merge English fixture (authored for this repo —
    * see resources/graft/bpe/merges.txt), so the driver entry and specs
    * need no external file.  Real deployments load their model's
    * merges with [[loadMergesFile]].
    */
  lazy val default: BpeTable = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "bundled merges resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMerges(src.getLines(), Some(FixtureAlphabet)) finally src.close()
  }

  /** The merge loop.  Returns words ≤1 char (and unknown alphabets)
    * as-is; empty input → empty segmentation.
    */
  def segment(word: String, t: BpeTable): Array[String] = {
    if (word.isEmpty) return Array.empty
    var parts = new Array[String](word.length)
    var i = 0
    while (i < word.length) { parts(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = parts.length <= 1
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < parts.length - 1) {
        val r = t.rank(parts(j), parts(j + 1))
        if (r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        val a = parts(best)
        val b = parts(best + 1)
        val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var k = 0
        while (k < parts.length) {
          if (k < parts.length - 1 && parts(k) == a && parts(k + 1) == b) {
            out += a + b; k += 2
          } else { out += parts(k); k += 1 }
        }
        parts = out.toArray
        done = parts.length <= 1
      }
    }
    parts
  }

  def segmentArray(s: UTF8String, t: BpeTable): ArrayData =
    new GenericArrayData(segment(s.toString, t).map(w => UTF8String.fromString(w): AnyRef))

  def countTokens(arr: ArrayData, t: BpeTable): Long = {
    var total = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) total += segment(arr.getUTF8String(i).toString, t).length
      i += 1
    }
    total
  }

  def encodeIds(arr: ArrayData, t: BpeTable): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // a null word emits the same −1 sentinel as an OOV symbol — a
      // silent skip would desynchronize ids from the text they claim
      // to encode, the exact contract −1 exists to protect
      if (arr.isNullAt(i)) out += -1
      else {
        val segs = segment(arr.getUTF8String(i).toString, t)
        var j = 0
        while (j < segs.length) { out += t.idOf(segs(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[BpeChunkSeqs]] eval: one greedy O(n) pass.  Null words (legal
    * in the input array type) cost 0 BPE tokens and render as empty
    * strings — they cannot desynchronize the rebuild because the
    * word COUNT structure is preserved.
    */
  def chunkSeqs(arr: ArrayData, t: BpeTable, seqLen: Int, overlapWords: Int): ArrayData = {
    val n = arr.numElements()
    val words = new Array[String](n)
    val costs = new Array[Long](n)
    var i = 0
    while (i < n) {
      words(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      costs(i) = segment(words(i), t).length.toLong
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (n == 0) {
      out += org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(""), 0L, 0L, 0L)
    } else {
      var b = 0
      var prevEnd = 0
      var first = true
      while (b < n) {
        var e = b
        var acc = 0L
        // first word unconditionally (an oversized word overflows its
        // own sequence), then extend while the budget holds
        acc += costs(e); e += 1
        while (e < n && acc + costs(e) <= seqLen) { acc += costs(e); e += 1 }
        val ov = if (first) 0L else (prevEnd - b).toLong
        val sb = new java.lang.StringBuilder()
        var w = b
        while (w < e) {
          if (w > b) sb.append(' ')
          sb.append(words(w))
          w += 1
        }
        out += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(sb.toString), (e - b).toLong, ov, acc)
        prevEnd = e
        first = false
        b = if (e >= n) n else math.max(e - overlapWords, b + 1)
      }
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim
  def bpeSegment(c: Column, t: BpeTable): Column =
    ColumnShim.column(BpeSegment(ColumnShim.expression(c), t))
  def bpeTokenCount(c: Column, t: BpeTable): Column =
    ColumnShim.column(BpeTokenCount(ColumnShim.expression(c), t))
  def bpeEncodeIds(c: Column, t: BpeTable): Column =
    ColumnShim.column(BpeEncodeIds(ColumnShim.expression(c), t))
  def bpeChunkSeqs(c: Column, t: BpeTable, seqLen: Int, overlap: Int): Column =
    ColumnShim.column(BpeChunkSeqs(ColumnShim.expression(c), t, seqLen, overlap))
}
