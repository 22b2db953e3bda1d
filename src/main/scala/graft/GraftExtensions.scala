package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AdcScore, Bpe, BpeEncodeIds, BpeSegment, BpeTokenCount, CharPairs, CountInSet, DeflateLen, DotProduct, HyperplaneBuckets, MinHashBandKeys, MinHashSig, NormalizeText, RepetitionStats, RollingHash64, SimHash64, SpaceSavingAgg, WindowHashes, WordShingles}

/** Registers the graft native expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(...)")` works next to the Column API.
  * Activate with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (done by [[GraftSession.builder]]) or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>, k) - MinHash signature of k permutations"),
      (args: Seq[Expression]) => MinHashSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<double>, array<double>) - sequential-fold dot product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("adc_score"),
      info("adc_score", "adc_score(array<int>, array<array<double>>) - PQ asymmetric-distance score"),
      (args: Seq[Expression]) => AdcScore(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(array<string>, n) - word n-gram shingles"),
      (args: Seq[Expression]) => WordShingles(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("minhash_band_keys"),
      info("minhash_band_keys", "minhash_band_keys(array<bigint>, bands) - LSH band hashes of a signature"),
      (args: Seq[Expression]) => MinHashBandKeys(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("char_pairs"),
      info("char_pairs", "char_pairs(string) - adjacent character pairs"),
      (args: Seq[Expression]) => CharPairs(args.head)))
    e.injectFunction((FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", "rolling_hash64(string) - Rabin-Karp 64-bit rolling hash"),
      (args: Seq[Expression]) => RollingHash64(args.head)))
    e.injectFunction((FunctionIdentifier("deflate_len"),
      info("deflate_len", "deflate_len(string) - DEFLATE-compressed byte length of the UTF-8 bytes (level 6, raw stream)"),
      (args: Seq[Expression]) => DeflateLen(args.head)))
    e.injectFunction((FunctionIdentifier("hyperplane_buckets"),
      info("hyperplane_buckets", "hyperplane_buckets(array<double>, tables, bits, seed) - LSH bucket keys per table"),
      (args: Seq[Expression]) => HyperplaneBuckets(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue(),
        args(3).eval().asInstanceOf[Number].longValue())))
    e.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(string) - NFC + control-strip + whitespace-collapse canonical form"),
      (args: Seq[Expression]) => NormalizeText(args.head)))
    e.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(array<string>) - per-doc token/2-gram repetition statistics"),
      (args: Seq[Expression]) => RepetitionStats(args.head)))
    e.injectFunction((FunctionIdentifier("count_in_set"),
      info("count_in_set", "count_in_set(array<string>, array<string>) - tokens present in the constant set"),
      (args: Seq[Expression]) => CountInSet(args.head,
        args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq)))
    e.injectFunction((FunctionIdentifier("window_hashes"),
      info("window_hashes", "window_hashes(array<string>, w) - stride-1 rolling hashes of every w-token window"),
      (args: Seq[Expression]) => WindowHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    // SQL forms bind the BUNDLED merge table (a merges-file path can't
    // ride a SQL literal cleanly); the Column API takes any BpeTable
    e.injectFunction((FunctionIdentifier("bpe_segment"),
      info("bpe_segment", "bpe_segment(string) - BPE subword segmentation under the bundled merges"),
      (args: Seq[Expression]) => BpeSegment(args.head, Bpe.default)))
    e.injectFunction((FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count", "bpe_token_count(array<string>) - total BPE token count under the bundled merges"),
      (args: Seq[Expression]) => BpeTokenCount(args.head, Bpe.default)))
    e.injectFunction((FunctionIdentifier("bpe_encode_ids"),
      info("bpe_encode_ids", "bpe_encode_ids(array<string>) - concatenated vocab ids under the bundled merges (-1 = OOV)"),
      (args: Seq[Expression]) => BpeEncodeIds(args.head, Bpe.default)))
    // the analyzer wraps a returned AggregateFunction in its
    // AggregateExpression, so sketch aggregates register like scalars
    e.injectFunction((FunctionIdentifier("space_saving"),
      info("space_saving", "space_saving(term, capacity, k) - Space-Saving heavy-hitter summary: array<struct<term,est,err>> with est-err <= true <= est"),
      (args: Seq[Expression]) => SpaceSavingAgg(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))
    // optimizer rung of the extension ladder: collapse nested
    // normalize_text — see the rule's scaladoc for the idempotence
    // argument and the cross-stage compositions it catches
    e.injectOptimizerRule(_ => graft.plans.CollapseIdempotentNormalize)
  }
}
