package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format adapters beyond parquet: CSV and JSON-lines, with
  * EXPLICIT schemas only — schema inference is a full extra pass over
  * the data, which at 100 TB doubles the read, so these readers refuse
  * to infer.  Readers return plain scans (Catalyst keeps column
  * pruning; CSV/JSON scans can't skip row groups like parquet, which
  * is why parquet stays the canonical storage and these are the
  * ingest/export edges).
  */
object Formats {

  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines (one object per line — the splittable streaming-safe
    * JSON shape; multiline JSON is not splittable and is deliberately
    * unsupported).
    */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC — the other columnar format Spark ships natively.  Schema
    * stays explicit for symmetry with the text formats (ORC carries
    * its own schema; passing one here is a CONTRACT check — a reader
    * that silently adapts to whatever the file contains hides producer
    * drift until query time).  Predicate pushdown and column pruning
    * work as with parquet.
    */
  def readOrc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Raw media files as rows via Spark's built-in `binaryFile` source —
    * the real ingestion edge for multimodal corpora (image/audio/video
    * files on disk or object storage → (path, length, content) rows
    * that [[graft.operators.Multimodal.ingestBinary]] turns into the
    * content-addressed payload schema).  `pathGlobFilter` prunes by
    * extension AT LISTING TIME (unmatched files are never opened);
    * files over `maxBytes` are EXCLUDED from this frame (a larger
    * binary row heads toward the 2 GB row limit / executor OOM) —
    * excluded means ABSENT, so audit the drop with the companion
    * [[oversizedFiles]] rather than assuming this frame is the whole
    * directory.  The scan parallelizes per file,
    * so a 100 TB media corpus reads at cluster bandwidth — but beware
    * the small-files problem: millions of tiny files bottleneck on
    * listing/open, which is exactly why the payload registry persists
    * ingested bytes back to parquet ([[graft.operators.Multimodal
    * .mmDedup]]'s address dedup makes that write idempotent).
    */
  def readBinaryFiles(s: SparkSession, path: String,
      globFilter: String = "*", maxBytes: Long = 256L << 20): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(path)
      .filter(org.apache.spark.sql.functions.col("length") <= maxBytes)

  /** One-document-per-line text corpora (the rawest LLM-data
    * interchange layout) → (doc_id, text, src_file): line text plus a
    * provenance column, with doc_id = a 64-bit hash of (file, line) —
    * stable across re-reads of the same files and computed WITHOUT a
    * global order (zipWithIndex / monotonically_increasing_id would
    * either shuffle everything or bind ids to the accidental partition
    * layout).  Identical lines in the same file therefore SHARE an id:
    * they are byte-identical duplicates by construction, which the
    * dedup stages collapse anyway — aggregate multiplicity before
    * dedup if provenance needs the copy count.  Splittable and
    * parallel per file like any text scan; pair with
    * [[graft.operators.Dedup.dedupIncremental]] for ingest-time dedup.
    *
    * Collision bound: DISTINCT (file, line) pairs can also collide in
    * 64 bits — birthday math puts the expected collision count at
    * ~n²/2⁶⁵, so one silent doc-merge is expected somewhere past
    * n ≈ 6×10⁹ lines and the risk is material from ~10⁸ on.  For
    * corpora in that range use [[readTextLines128]], whose two-seed
    * 128-bit id pushes the same bound past 10¹⁸ lines.
    */
  def readTextLines(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.text(path)
      .select(
        xxhash64(input_file_name(), col("value")).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("src_file"))
  }

  /** [[readTextLines]] with a 128-bit id for corpora past ~10⁸ lines:
    * (doc_id, doc_id2) are two INDEPENDENTLY-seeded 64-bit hashes of
    * the same (file, line) — the seed rides as an extra hashed column,
    * which reseeds xxhash64's whole avalanche, so the pair behaves as
    * one 128-bit id (collision expectation ~n²/2¹²⁹: negligible at any
    * physical corpus size).  Downstream keys join/group on BOTH
    * columns; [[readTextLines]] stays the default because a 64-bit key
    * halves shuffle-key width and is safe below ~10⁸ lines.
    */
  /** Seed for the second 64-bit lane of [[readTextLines128]].  A named
    * constant of ITS OWN: this must never alias another hash domain's
    * constant (e.g. [[graft.functions.WindowHashes.Q]], whose value it
    * once accidentally shared) — two independently-chosen seeds can't
    * silently converge under a refactor that "deduplicates" literals.
    * Value: decimal digits of π scaled into a 64-bit odd constant.
    */
  private[sources] final val Line128Seed = 0x243F6A8885A308D3L // π's first 64 fractional bits

  def readTextLines128(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.text(path)
      .select(
        xxhash64(input_file_name(), col("value")).as("doc_id"),
        xxhash64(lit(Line128Seed), input_file_name(), col("value")).as("doc_id2"),
        col("value").as("text"),
        input_file_name().as("src_file"))
  }

  /** The files [[readBinaryFiles]] excluded: (path, length) of
    * everything over `maxBytes` under the same glob — the ingestion
    * audit, so an oversized media file is a reported row, never a
    * silent hole in the corpus.  Only metadata columns are projected,
    * so the scan never opens the (large) file contents.
    */
  def oversizedFiles(s: SparkSession, path: String,
      globFilter: String = "*", maxBytes: Long = 256L << 20): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(path)
      .filter(org.apache.spark.sql.functions.col("length") > maxBytes)
      .select("path", "length")
}
