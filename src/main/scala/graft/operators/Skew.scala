package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-layout tools for skewed and co-located joins — the manual
  * counterparts to AQE's runtime skew splitting, for when the skew is
  * known ahead of time (hot keys in a fact⋈fact join that AQE can only
  * mitigate after materializing the skewed map output).
  */
object Skew {

  /** Salted equi-join for skewed keys.
    *
    * The big side tags each row with a deterministic salt derived from
    * `saltFrom` (any per-row expression — an id column keeps it
    * reproducible); the small side is replicated `salts` times; the
    * join key becomes (key, salt), so a hot key's rows spread over
    * `salts` shuffle partitions instead of one straggler task.
    * Replication multiplies the small side's shuffle volume by
    * `salts` — size it as hot-key-rows / target-partition-rows.
    *
    * Results are identical to `big.join(small, key)`: every big row
    * meets every matching small row exactly once (under exactly one
    * salt value).
    */
  def saltedJoin(big: DataFrame, saltFrom: Column, small: DataFrame,
      key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedJoin; rename the input column")
    val b = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val s = small.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
