package graft

import org.apache.spark.sql.functions.{col, count, xxhash64}

object Bench {
  /** Per-query timed runs; the reported number is the median, so one
    * GC pause / scheduler hiccup cannot fake a 3× regression (a single
    * outlier steered round-2's dedup_exact reading).  Overridable via
    * SPARK_GRAFT_BENCH_RUNS for the hour-scale decades (the sf10
    * full-suite run is single-pass by design — its role is the
    * suite-wide linearity anchor, not a medians file).
    */
  private val Runs =
    math.max(1, sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))

  /** Per-stage GC and task-time accumulator: with per-run snapshots
    * (bus drained around each), every query carries its own measured
    * executor-side cost — the in-driver telemetry that lets a bench
    * riser be adjudicated as co-tenancy/GC pressure vs a real plan
    * regression WITHOUT a separate isolated-probe session (three
    * rounds of the pair-graph cluster needed exactly this).
    */
  private final class Telemetry extends org.apache.spark.scheduler.SparkListener {
    val gcMs = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        taskMs.addAndGet(m.executorRunTime)
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same session config as the product builder — benchmark the plans
    // the library actually produces
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed query to warm codegen, parquet readers and shuffle
    // machinery
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    // page-cache warmup must DECODE data pages: a bare count() prunes
    // all columns and reads only row-group metadata, leaving the first
    // timed query per table to pay the cold column read.  Hashing every
    // column defeats pruning, so the scan touches every data page.
    // Per-table try: one unreadable table must not leave the rest cold.
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = graft.sources.Tables.table(spark, sfDir, t)
        df.agg(count(xxhash64(df.columns.map(col): _*))).collect()
        ()
      } catch { case _: Throwable => }
    }
    val telem = new Telemetry
    spark.sparkContext.addSparkListener(telem)
    def drained[A](body: => A): A = {
      org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
      body
    }
    // per run: (wall sec, gc sec, task sec) with the listener bus
    // drained around the snapshots so stage events land in the right
    // query's window
    // which query paid which Materialize artifact build: diffing the
    // build counts around each query makes the cold-cache accounting
    // mechanical — the first consumer's run-1 carries the build and the
    // committed builds file names it, instead of a prose claim
    val buildsByQuery = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    // nop drift sentinel (round 18): a FIXED workload — 64M-row codegen
    // hash-count, no IO, no library code — sampled at suite start, every
    // 64 queries, and suite end.  Its calibrated cost is a few hundred
    // ms at 32 threads and INDEPENDENT of the suite, so a driver
    // reading where nop_sec is several× the committed value
    // adjudicates itself as environment drift (co-tenancy/GC pressure)
    // without a builder-side probe session — the gap that cost r17 a
    // separate isolation pass for decontaminate/graph_kcore.
    val nopSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    def nopOnce(): Unit = {
      // NonFatal only, and a FAILED probe records -1 rather than
      // vanishing (r19 ADVICE): a sentinel that dies under exactly the
      // drift it exists to detect must stay visible in the telemetry,
      // not let nop_sec be computed from the surviving benign samples;
      // OOM/interrupts propagate — a bench that can't run the sentinel
      // can't certify anything it measures either.
      try {
        val t0 = System.nanoTime()
        spark.range(64L * 1000 * 1000).select(xxhash64(col("id")).as("h"))
          .agg(count(col("h"))).collect()
        nopSamples += (System.nanoTime() - t0) / 1e9
        ()
      } catch { case scala.util.control.NonFatal(_) => nopSamples += -1.0 }
    }
    nopOnce()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), qi) =>
      if (qi % 64 == 63) nopOnce()
      // a full GC between queries keeps one query's garbage from
      // surfacing as another's pause: with 70+ queries × 3 runs in one
      // JVM, byte-identical queries have moved 2–8× run-to-run on
      // accumulated heap pressure alone
      System.gc()
      val b0 = graft.sources.Materialize.buildCounts
      val runs = (1 to Runs).map { _ =>
        val (g0, k0) = drained((telem.gcMs.get, telem.taskMs.get))
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          val (g1, k1) = drained((telem.gcMs.get, telem.taskMs.get))
          (t, (g1 - g0) / 1e3, (k1 - k0) / 1e3)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            (-1.0, 0.0, 0.0)
        }
      }
      val b1 = graft.sources.Materialize.buildCounts
      val paid = b1.collect { case (a, n) if n > b0.getOrElse(a, 0) => a }.toSeq.sorted
      if (paid.nonEmpty) buildsByQuery(name) = paid
      // a failed query must read as a failure (-1), not a fast success;
      // gc/task ride along with their own run, so the median row is a
      // CONSISTENT (wall, gc, task) observation, not a mix of runs
      name -> (if (runs.exists(_._1 < 0)) Seq((-1.0, 0.0, 0.0)) else runs.sortBy(_._1))
    }
    nopOnce()
    // precision budget: the driver keeps only the last ~2000 chars of
    // output, and 85 full-precision doubles push the final JSON line
    // past that window (rounds 1–5 all came back unparsed).  The
    // queries map rounds to 10 ms (well under the measured run-to-run
    // spread); the spread line below keeps ms precision.
    def ms(x: Double): Double = math.rint(x * 1000) / 1000
    def cs(x: Double): Double = math.rint(x * 100) / 100
    def ds(x: Double): Double = math.rint(x * 10) / 10
    def qsAt(prec: Double => Double): String =
      results.map { case (k, t) => s"\"" + k + "\":" + prec(t(t.length / 2)._1) }
        .mkString("{", ",", "}")
    // failures stay -1 per query but must never shrink the headline:
    // total sums successful queries only, and a nonzero failed count
    // flags the run as invalid
    val failed = results.count(_._2.head._1 < 0)
    val total = ms(results.collect { case (_, t) if t.head._1 >= 0 => t(t.length / 2)._1 }.sum)
    // suite-level executor telemetry (sums of the median run's gc/task
    // deltas): two scalar fields on the machine-read line, per-query
    // detail in the committed telemetry file
    val gcTotal = ms(results.collect { case (_, t) if t.head._1 >= 0 => t(t.length / 2)._2 }.sum)
    val taskTotal = ms(results.collect { case (_, t) if t.head._1 >= 0 => t(t.length / 2)._3 }.sum)
    // sf as the directory BASENAME: the full path spent 16 chars of
    // the ~1997-char tail ceiling on information the driver already
    // records in its own sf field
    val sfName = new java.io.File(sfDir).getName
    // degraded-precision pointers must name the medians file for THIS
    // SF — a hardcoded sf0.1 pointer next to a dynamic sf field sent
    // readers of any other-SF run to the wrong committed evidence
    val mediansFile = s"bench_medians_$sfName.json"
    // median nop sample: ONE scalar the driver reads next to gc_sec —
    // the all-samples list rides the committed telemetry file
    // failed probes (-1 markers) are excluded from the median but stay
    // in the committed all-samples list; an all-failed sentinel reads
    // as -1, the same "no signal" value as a sentinel that never ran
    val nopOk = nopSamples.filter(_ >= 0)
    val nopSec =
      if (nopOk.isEmpty) -1.0
      else ms(nopOk.sorted.apply(nopOk.length / 2))
    // in-line adjudication block: the top movers by median wall, each
    // with its own (gc, task, artifact builds) — the three facts that
    // separate "plan regression" from "paid a cold build" from
    // "environment drift", ON the machine-read line itself.  6 entries
    // ≈ 500 chars, reserved BEFORE the queries map packs the rest of
    // the window (an adjudicable top-6 beats 25 more 0.1 s-precision
    // tail entries).
    val adj = {
      val byCost = results.filter(_._2.head._1 >= 0)
        .sortBy { case (_, t) => -t(t.length / 2)._1 }.take(6)
      byCost.map { case (k, t) =>
        val m = t(t.length / 2)
        val as = buildsByQuery.getOrElse(k, Nil)
        val shown = as.take(3).map("\"" + _ + "\"") ++
          (if (as.length > 3) Seq("\"+" + (as.length - 3) + "\"") else Nil)
        s"\"" + k + s"""\":{"w":${ds(m._1)},"g":${ds(m._2)},"t":${ds(m._3)},"b":[${shown.mkString(",")}]}"""
      }.mkString("{", ",", "}")
    }
    def lineWith(qs: String): String =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"gc_sec":$gcTotal,"task_sec":$taskTotal,"nop_sec":$nopSec,"adj":$adj,"queries":$qs,"sf":"$sfName"}"""
    // self-healing precision, guarded on the ASSEMBLED line (the map
    // alone once under-counted the fixed fields' share of the window):
    // 10 ms per-query values, then 100 ms (the run-to-run spread
    // exceeds 100 ms anyway, so nothing real is lost), and if even the
    // coarse map overflows the driver tail, the map yields to a
    // pointer at the committed full-precision medians file — the
    // headline total/failed must stay machine-readable at ANY query
    // count.  Ceiling 1960: the driver keeps the last 2000 chars and
    // since round 7 NOTHING follows this line (StdoutOutput, no sbt
    // success trailer), so line+newline just has to stay under 2000;
    // 1960 fits the 98-query map at 100 ms (1936 chars) with margin —
    // a 1900 ceiling silently dropped the whole map at 98 queries.
    // past the 100 ms ceiling the map degrades to a PARTIAL one —
    // slowest queries first (the only entries adjudication ever
    // reads; a 0.2 s query's value at 100 ms precision is noise),
    // packed to the budget with an explicit count + full-file
    // pointer so a partial map can never masquerade as complete.
    // The bare pointer remains the terminal stage.
    def qsTop(): String = {
      val fixed = """"n_queries":""" + results.length +
        s""","_full":"$mediansFile""""
      val byCost = results.sortBy { case (_, t) => -t(t.length / 2)._1 }
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      var used = lineWith("{" + fixed + "}").length
      byCost.foreach { case (k, t) =>
        val e = "\"" + k + "\":" + ds(t(t.length / 2)._1)
        if (used + e.length + 1 <= 1960) { parts += e; used += e.length + 1 }
      }
      "{" + (parts :+ fixed).mkString(",") + "}"
    }
    val line = {
      val l10ms = lineWith(qsAt(cs))
      if (l10ms.length <= 1960) l10ms
      else {
        val l100ms = lineWith(qsAt(ds))
        if (l100ms.length <= 1960) l100ms
        else {
          val lTop = lineWith(qsTop())
          if (lTop.length <= 1960) lTop
          else lineWith(s"""{"_see":"$mediansFile"}""")
        }
      }
    }
    // per-query max−min of the timed runs: a reader can tell scheduler/
    // GC wobble (spread ≈ the delta vs last round) from a real plan
    // regression (tight spread at the new, higher median).  The driver
    // keeps only the last ~2000 chars of output and the final JSON line
    // alone is ~1800 of them, so the spread line packs the LARGEST
    // spreads into whatever window space remains (round 6's full ~85-key
    // spread line was front-truncated exactly when it was needed); the
    // full map goes to a file named on the same line, which tools/
    // gate.sh copies into the repo as committed evidence.
    val spreadsAll = results.collect { case (k, t) if t.head._1 >= 0 =>
      k -> ms(t.last._1 - t.head._1)
    }
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val spreadFile = "target/bench_spread.json"
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(spreadFile), jmap(spreadsAll) + "\n")
      // ms-precision medians too: the tail line's self-healing
      // precision fallback coarsens per-query values to fit the
      // window, so the full-precision record lives here (gate.sh
      // commits both files as round evidence)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_medians.json"),
        jmap(results.collect { case (k, t) if t.head._1 >= 0 =>
          k -> ms(t(t.length / 2)._1) }) + "\n")
      // per-query executor telemetry of the median run: wall vs task
      // time exposes parallelism (task/wall ≈ busy cores), gc/wall
      // exposes heap pressure — the two axes a co-tenancy adjudication
      // needs.  Committed by gate.sh next to medians/spread.
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_telemetry.json"),
        (results.collect { case (k, t) if t.head._1 >= 0 =>
          val m = t(t.length / 2)
          s"\"" + k + s"""\":{"wall":${ms(m._1)},"gc":${ms(m._2)},"task":${ms(m._3)}}"""
        } :+ s""""_nop":${nopSamples.map(ms).mkString("[", ",", "]")}""")
          .mkString("{", ",", "}") + "\n")
      // build attribution: empty map = fully warm run (evidence that a
      // bench hid every build cost is itself committed)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_builds.json"),
        buildsByQuery.map { case (q, as) =>
          s"\"" + q + "\":[" + as.map("\"" + _ + "\"").mkString(",") + "]"
        }.mkString("{", ",", "}") + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] diagnostics write failed: $e") }
    val budget = 1920 - line.length - s"spread_top {} full=$spreadFile".length
    val top = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 0
    spreadsAll.sortBy(-_._2).foreach { case (k, v) =>
      val w = k.length + v.toString.length + 4
      if (used + w <= budget) { top += ((k, v)); used += w }
    }
    println(s"spread_top ${jmap(top.toSeq)} full=$spreadFile")
    // the machine-read line: printed AFTER spark.stop() so no Spark
    // shutdown chatter can follow it — with build.sbt's StdoutOutput +
    // showSuccess:=false this is the bare LAST line of the sbt run
    spark.stop()
    println(line)
  }
}
