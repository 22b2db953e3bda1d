package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-query fixed-overhead profiler — the r20 item-1 measurement tool.
  *
  * The r19 driver bench showed the 8-core suite total equal to the
  * 32-core total at sf0.1 (~0.5 s/query while task seconds are a
  * fraction of wall): most of the driver-visible cost is per-query
  * FIXED overhead, not compute.  This probe splits one query's wall
  * into the phases that can each be attacked separately:
  *
  *   construct — `fn(spark, sfDir)`: driver-side DataFrame assembly,
  *               incl. `spark.read.parquet` listing + footer schema
  *   analyze   — `qe.analyzed` forced
  *   optimize  — `qe.optimizedPlan` forced
  *   plan      — `qe.executedPlan` forced (physical planning)
  *   exec      — `df.count()` (job submission + run; with AQE this is
  *               one job per materialized stage)
  *
  * plus the job/task counts of the exec phase (scheduling volume).
  * Repeats each query `runs` times on a warmed session and prints the
  * per-phase MEDIANS as one JSON object per query.  Measurement-only:
  * never used by any declared query.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val (names0, runs) = args.lastOption.filter(_.forall(_.isDigit)) match {
      case Some(n) => (args.dropRight(1).toSeq, n.toInt)
      case None    => (args.toSeq, 9)
    }
    val names = if (names0.nonEmpty) names0 else Seq("active_users")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    import org.apache.spark.sql.functions.{col, count, xxhash64}
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = graft.sources.Tables.table(spark, sfDir, t)
        df.agg(count(xxhash64(df.columns.map(col): _*))).collect(); ()
      } catch { case _: Throwable => }
    }
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val gcMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) { taskMs.addAndGet(m.executorRunTime); gcMs.addAndGet(m.jvmGCTime); () }
      }
    })
    // GRAFT_STAGE_LOG=1: print every completed stage's width and wall —
    // the serial-chain diagnosis view (which stages run single-task,
    // where the wall sits between task time and stage gaps)
    if (sys.env.get("GRAFT_STAGE_LOG").contains("1")) {
      val t00 = System.currentTimeMillis()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b
          println(s"[stage] id=${i.stageId} tasks=${i.numTasks} " +
            s"wall=${ms.getOrElse(-1L)}ms task=${i.taskMetrics.executorRunTime}ms " +
            s"${i.name.take(60)}")
        }
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val ti = t.taskInfo
          if (ti != null && ti.duration > 1000) {
            println(s"[task] stage=${t.stageId} tid=${ti.taskId} " +
              s"launch=+${ti.launchTime - t00}ms dur=${ti.duration}ms " +
              s"run=${if (t.taskMetrics != null) t.taskMetrics.executorRunTime else -1}ms " +
              s"gc=${if (t.taskMetrics != null) t.taskMetrics.jvmGCTime else -1}ms")
          }
        }
      })
    }
    // Janino whole-stage/expression compile volume: count + total ms
    // from Spark's own codegen metrics source — the direct test of the
    // "per-job floor is codegen compilation" hypothesis
    import org.apache.spark.metrics.source.CodegenMetrics
    def cgCount(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def ms(x: Double): Double = math.rint(x * 10000) / 10000
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[overhead] unknown query: $name")
        case Some(fn) =>
          val samples = (1 to runs).map { _ =>
            System.gc()
            org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
            val (j0, k0) = (jobs.get, tasks.get)
            val (tm0, g0) = (taskMs.get, gcMs.get)
            val c0 = cgCount()
            var t = System.nanoTime()
            val df = fn(spark, sfDir)
            val tConstruct = (System.nanoTime() - t) / 1e9
            val qe = df.queryExecution
            t = System.nanoTime()
            qe.analyzed
            val tAnalyze = (System.nanoTime() - t) / 1e9
            t = System.nanoTime()
            qe.optimizedPlan
            val tOptimize = (System.nanoTime() - t) / 1e9
            t = System.nanoTime()
            qe.executedPlan
            val tPlan = (System.nanoTime() - t) / 1e9
            t = System.nanoTime()
            df.count()
            val tExec = (System.nanoTime() - t) / 1e9
            org.apache.spark.graftshim.ListenerShim.drain(spark.sparkContext)
            (tConstruct, tAnalyze, tOptimize, tPlan, tExec,
              (jobs.get - j0).toDouble, (tasks.get - k0).toDouble,
              (cgCount() - c0).toDouble,
              (taskMs.get - tm0) / 1e3, (gcMs.get - g0) / 1e3)
          }
          val rec = s"""{"query":"$name","cpus":$cpus,"runs":$runs,""" +
            s""""construct":${ms(med(samples.map(_._1)))},""" +
            s""""analyze":${ms(med(samples.map(_._2)))},""" +
            s""""optimize":${ms(med(samples.map(_._3)))},""" +
            s""""plan":${ms(med(samples.map(_._4)))},""" +
            s""""exec":${ms(med(samples.map(_._5)))},""" +
            s""""total":${ms(med(samples.map(s => s._1 + s._2 + s._3 + s._4 + s._5)))},""" +
            s""""jobs":${med(samples.map(_._6))},"tasks":${med(samples.map(_._7))},""" +
            s""""task_sec":${ms(med(samples.map(_._9)))},"gc_sec":${ms(med(samples.map(_._10)))},""" +
            s""""codegen_compiles":${med(samples.map(_._8))},""" +
            s""""codegen_mean_ms":${ms(CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean)}}"""
          println(rec)
      }
    }
    spark.stop()
  }
}
