package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scaling diagnosis for the ER pass: splits wall time into executor task
  * time (parallelizable) vs everything else (driver planning, scheduling
  * gaps, collects) — the Amdahl split the scaling-efficiency number rides
  * on. Usage: runMain graft.tools.ScaleDiag <cores> <nClusters> [passes]
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nClusters = args(1).toLong
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val partitions = args.lift(3).map(_.toInt).getOrElse(3 * cores)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.default.parallelism", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskTime = new LongAdder
    val gcTime = new LongAdder
    val nJobs = new AtomicLong
    val jobTime = new LongAdder // sum of per-job wall (jobEnd - jobStart)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageTask = new java.util.concurrent.ConcurrentHashMap[String, LongAdder]()
    // per-job: (wall ms, taskSum ms, representative stage site) — the jobs
    // whose wall does NOT shrink with cores are the serial floor
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, LongAdder]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(st: SparkListenerStageSubmitted): Unit = {
        val site = st.stageInfo.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("tools"))
          .getOrElse(st.stageInfo.name).trim
        stageNames.put(st.stageInfo.stageId, site); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskTime.add(t.taskMetrics.executorRunTime)
          gcTime.add(t.taskMetrics.jvmGCTime)
          val key = stageNames.getOrDefault(t.stageId, s"stage-${t.stageId}")
          stageTask.computeIfAbsent(key, _ => new LongAdder).add(t.taskMetrics.executorRunTime)
          val jid = stageJob.getOrDefault(t.stageId, -1)
          if (jid >= 0) jobTask.computeIfAbsent(jid, _ => new LongAdder)
            .add(t.taskMetrics.executorRunTime)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStarts.put(j.jobId, j.time); nJobs.incrementAndGet()
        jobStages.put(j.jobId, j.stageIds)
        j.stageIds.foreach(sid => stageJob.put(sid, j.jobId)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(j.jobId)
        if (s != 0L) {
          jobTime.add(j.time - s)
          val sites = jobStages.getOrDefault(j.jobId, Seq.empty)
            .flatMap(sid => Option(stageNames.get(sid))).distinct.mkString(" | ")
          val tsk = Option(jobTask.get(j.jobId)).map(_.sum()).getOrElse(0L)
          jobLog.add(f"job=${j.jobId}%3d wall=${(j.time - s) / 1e3}%6.2f taskSum=${tsk / 1e3}%7.2f  $sites")
        }
      }
    })

    val corpusDir = graft.util.Scratch.unique("diag_corpus") + "/webpages"
    graft.sources.WebPagesGen.webpages(spark, nClusters)
      .repartition(48).write.mode("overwrite").parquet(corpusDir)
    (1 to passes).foreach { i =>
      taskTime.reset(); gcTime.reset(); jobTime.reset(); nJobs.set(0)
      val (docs, sec) = graft.pipeline.EntityResolution.runOnTable(spark, corpusDir)
      val task = taskTime.sum() / 1e3
      val gc = gcTime.sum() / 1e3
      val jobs = nJobs.get()
      val jobWall = jobTime.sum() / 1e3
      println(f"[scalediag] cores=$cores pass=$i docs=$docs wall=$sec%.2f " +
        f"taskSum=$task%.1f taskSum/cores=${task / cores}%.2f gcSum=$gc%.1f " +
        f"jobs=$jobs jobWall=$jobWall%.1f interJobGap=${sec - jobWall}%.2f")
      if (i == passes) {
        import scala.jdk.CollectionConverters._
        stageTask.asScala.toSeq.sortBy(-_._2.sum()).take(14).foreach { case (k, v) =>
          println(f"[scalediag]   ${v.sum() / 1e3}%8.1f s  $k")
        }
        jobLog.asScala.foreach(l => println(s"[scalediag]   $l"))
      }
      stageTask.clear(); jobLog.clear(); jobTask.clear()
    }
    spark.stop()
  }
}
