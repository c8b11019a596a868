package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Round-6 optimization measurement harness (guide §1: measure first; §1.4
 * noop-sink isolation). NOT part of the frozen driver contract — Bench.scala
 * is untouched; this main exists so per-query timings and plan dumps can be
 * cited in OPTIMIZATION_r06.md without touching the frozen harness.
 *
 * Usage: runMain graft.BenchExtra <sfDir> [reps] [query,query,...|all] [planDir]
 *  - times each named query with the noop sink, `reps` reps, reports min
 *    (same session config as Bench part 1: local[$SPARK_GRAFT_CPUS],
 *    shuffle.partitions = cpus, AQE on);
 *  - runs the 1-thread/16-thread CPU probes before and after so a reader can
 *    judge the VM window (CLAUDE.md noise doctrine);
 *  - with planDir set, writes <planDir>/<query>.txt containing
 *    .explain("formatted") for each query.
 */
object BenchExtra {

  private def cpuProbeSec(): Double = {
    val t0 = System.nanoTime()
    var i = 0L; var acc = 0L
    while (i < 200000000L) {
      acc = java.lang.Long.rotateLeft(acc + i, 7) * 0x9E3779B97F4A7C15L
      i += 1
    }
    if (acc == 42L) print("")
    (System.nanoTime() - t0) / 1e9
  }

  private def cpuProbe16Sec(): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until 16).map { t =>
      new Thread(() => {
        var i = 0L; var acc = t.toLong
        while (i < 100000000L) {
          acc = java.lang.Long.rotateLeft(acc + i, 7) * 0x9E3779B97F4A7C15L
          i += 1
        }
        if (acc == 42L) print("")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all")
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val planDir = if (args.length > 3) Some(args(3)) else None

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val probeBefore = (cpuProbeSec(), cpuProbe16Sec())

    // per-query job/stage/task accounting: separates fixed scheduling
    // overhead (many tiny stages) from real compute (task time)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val diag = sys.env.get("SPARK_GRAFT_BENCH_EXTRA_DIAG").contains("1")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (diag) jobStartNs.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (diag) Option(jobStartNs.remove(j.jobId)).foreach { t0 =>
          println(f"JOB ${j.jobId} wall=${(System.nanoTime() - t0) / 1e9}%.3f")
        }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (diag) {
          val name = s.stageInfo.name.takeWhile(_ != '\n').take(60)
          val nt = s.stageInfo.numTasks
          val ms = s.stageInfo.taskMetrics
          println(f"STAGE ${s.stageInfo.stageId} tasks=$nt execRunMs=${ms.executorRunTime} " +
            f"cpuMs=${ms.executorCpuTime / 1000000} deserMs=${ms.executorDeserializeTime} $name")
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    })

    val times = names.map { name =>
      val fn = SparkEntry.queries(name)
      var lastJobs = 0; var lastStages = 0; var lastTaskMs = 0L
      val secs = (1 to reps).map { _ =>
        val j0 = jobs.get(); val s0 = stages.get(); val t0m = taskMs.get()
        val t0 = System.nanoTime()
        materialize(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120) // let the listener bus drain (diagnostics only)
        lastJobs = jobs.get() - j0; lastStages = stages.get() - s0
        lastTaskMs = taskMs.get() - t0m
        dt
      }
      val st = f"jobs=$lastJobs stages=$lastStages taskSec=${lastTaskMs / 1e3}%.2f"
      println(s"STATS $name $st")
      planDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, s"$name.txt"), plan)
      }
      println(f"TIME $name min=${secs.min}%.3f reps=${secs.map(s => f"$s%.3f").mkString(",")}")
      name -> (secs.min, secs, st)
    }

    val probeAfter = (cpuProbeSec(), cpuProbe16Sec())
    val qs = times.map { case (k, v) => "\"" + k + "\":" + f"${v._1}%.3f" }.mkString("{", ",", "}")
    val json = f"""{"metric":"bench-extra sec","value":${times.map(_._2._1).sum}%.3f,"unit":"sec","queries":$qs,"cpu_probe_sec":[[${probeBefore._1}%.2f,${probeBefore._2}%.2f],[${probeAfter._1}%.2f,${probeAfter._2}%.2f]],"sf":"$sfDir"}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_OUT", "/tmp/bench_extra_out.jsonl")
    val lines = times.map { case (k, (mn, secs, st)) =>
      f"TIME $k min=$mn%.3f reps=${secs.map(s => f"$s%.3f").mkString(",")} $st"
    }.mkString("", "\n", "\n") + json + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), lines,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
