package graft

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for every query — the plan-review loop
  * for the 100 TB design rules (pushdown reached the scan, dims
  * broadcast, no stray shuffles).  Usage:
  * `runMain graft.Explain <sfDir> <outDir> [namePrefix|name1,name2,...]`
  * — a comma in the third arg selects those exact queries (the
  * before/after plan-evidence dumps name a touched set, not a prefix).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_plans"
    val prefix = if (args.length > 2) args(2) else ""
    val exact: Option[Set[String]] =
      if (prefix.contains(',')) Some(prefix.split(',').map(_.trim).toSet) else None
    val spark = GraftSession.builder(s"local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => exact.fold(q._1.startsWith(prefix))(_.contains(q._1)))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // GRAFT_EXPLAIN_EXEC=1: run the query and dump the FINAL
          // adaptive plan — AQE reuse/coalescing/join rewrites are
          // runtime decisions the initial plan cannot show.  Must
          // execute THIS df's own QueryExecution (a count() would
          // plan a new one and leave this plan un-finalized).
          if (sys.env.get("GRAFT_EXPLAIN_EXEC").contains("1")) { df.collect(); () }
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case e: Throwable =>
            Files.writeString(Paths.get(s"$outDir/$name.txt"), s"ERROR: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
