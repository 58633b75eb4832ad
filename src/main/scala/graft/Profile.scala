package graft

import java.nio.file.{Files, Paths}

/** Dev tool for the optimization rounds: time named queries exactly the way
  * Bench does (two passes, count() action, min reported) and optionally dump
  * each query's formatted physical plan to a file.
  *
  *   sbt "runMain graft.Profile <name>..."        — timings only
  *   SPARK_GRAFT_PLANS=plans/r17 ... -- suffix    — also write <name>_<suffix>.txt
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * Not part of the driver contract; Bench.scala remains the only timed
  * artifact the driver reads.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS")
    val (names, suffix) = args.indexOf("--") match {
      case -1 => (args.toSeq, "plan")
      case i => (args.take(i).toSeq, args(i + 1))
    }
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    // Empirical accounting (guide §1.1/§7): per pass, the number of Spark
    // jobs/stages/tasks and the summed in-stage task time. Wall minus
    // in-job time ~ driver-side planning + scheduling gaps.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val jobStart =
          scala.collection.concurrent.TrieMap.empty[Int, Long]
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); jobStart(e.jobId) = e.time
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobStart.remove(e.jobId).foreach(t0 =>
            jobWallMs.addAndGet(e.time - t0))
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskInfo != null && e.taskInfo.finished)
            taskMs.addAndGet(e.taskInfo.duration)
      })
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"warmup: ${e.getMessage}") }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(n)
      val times = (1 to 2).map { _ =>
        Seq(jobs, stages, tasks).foreach(_.set(0))
        Seq(taskMs, jobWallMs).foreach(_.set(0))
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan = System.nanoTime()
        df.count()
        val t1 = System.nanoTime()
        ((t1 - t0) / 1e9, jobs.get, stages.get, tasks.get, taskMs.get / 1e3,
          jobWallMs.get / 1e3, (tPlan - t0) / 1e9)
      }
      val (w2, j2, s2, t2, tm2, jw2, pl2) = times.last
      println(f"[profile] $n%-28s min=${times.map(_._1).min}%7.3f  passes=" +
        times.map(t => f"${t._1}%.3f").mkString("[", ",", "]") +
        f"  p2: jobs=$j2 stages=$s2 tasks=$t2 taskSum=$tm2%.2fs" +
        f" jobWall=$jw2%.2fs plan=$pl2%.2fs gap=${w2 - jw2 - pl2}%.2fs")
      plansDir.foreach { pd =>
        Files.createDirectories(Paths.get(pd))
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$pd/${n}_$suffix.txt"), plan)
      }
    }
    spark.stop()
  }
}
