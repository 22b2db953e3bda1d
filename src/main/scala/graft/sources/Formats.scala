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
}
