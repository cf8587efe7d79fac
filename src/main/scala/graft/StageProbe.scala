package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job/stage breakdown for a named query (round-18 optimization tooling):
  * runs the query like QueryProbe (same session shape, same cache clears)
  * with a SparkListener attached, then prints per-job wall-clock, stage
  * count, task count and summed task time — the local[N] stand-in for the
  * Spark UI's Jobs/Stages pages (the UI is disabled in every measured
  * session). This is what distinguishes "the seconds are in one heavy
  * shuffle" from "the seconds are 40 tiny stages of scheduling overhead",
  * which the bench's single wall-clock number cannot.
  *
  * Usage: runMain graft.StageProbe [sfDir] [reps] query[,query...]
  * Reps >= 2 recommended: rep 1 pays codegen, rep 2+ is the steady state
  * the bench medians measure.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: StageProbe [sfDir] [reps] q1[,q2...]"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Collected per job: (jobId, submitted, completed, #stages, #tasks,
    // sum of task runtimes ms).
    case class JobRec(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L)
    case class StageRec(id: Int, name: String, var tasks: Int = 0,
      var taskMs: Long = 0L)
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, JobRec]
    val stages = scala.collection.concurrent.TrieMap.empty[Int, StageRec]
    val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, e.time)
        r.stages = e.stageIds.size
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages(e.stageInfo.stageId) =
          StageRec(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        jobs.get(stageToJob.getOrElse(e.stageId, -1)).foreach { r =>
          r.tasks += 1
          if (e.taskInfo != null) r.taskMs += e.taskInfo.duration
        }
        stages.get(e.stageId).foreach { s =>
          s.tasks += 1
          if (e.taskInfo != null) s.taskMs += e.taskInfo.duration
        }
      }
    }

    names.foreach { name =>
      (1 to reps).foreach { rep =>
        graft.ext.Dedup.clearCaches(spark)
        graft.ext.TextAnalysis.clearCaches(spark)
        graft.ext.Similarity.clearCaches(spark)
        graft.ext.Curation.clearCaches(spark)
        graft.queries.Report.clearCaches(spark)
        graft.ops.Kmv.clearCaches(spark)
        jobs.clear(); stages.clear(); stageToJob.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        queries.Registry.queryMap(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // Let straggler listener events drain before reading the maps.
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        val rows = jobs.values.toSeq.sortBy(_.id)
        val jobWall = rows.map(r => (r.t1 - r.t0).max(0L)).sum / 1e3
        println(f"[sprobe] $name rep$rep wall=$wall%.2f s, " +
          f"${rows.size} jobs (Σjob ${jobWall}%.2f s), " +
          f"${rows.map(_.stages).sum} stages, ${rows.map(_.tasks).sum} tasks, " +
          f"Σtask ${rows.map(_.taskMs).sum / 1e3}%.2f s")
        if (rep == reps) {
          rows.foreach { r =>
            println(f"[sprobe]   job ${r.id}%3d ${(r.t1 - r.t0).max(0L) / 1e3}%6.2f s " +
              f"${r.stages}%3d stages ${r.tasks}%4d tasks Σtask ${r.taskMs / 1e3}%7.2f s")
          }
          stages.values.toSeq.sortBy(-_.taskMs).take(12).foreach { s =>
            println(f"[sprobe]   stage ${s.id}%4d ${s.tasks}%4d tasks " +
              f"Σtask ${s.taskMs / 1e3}%7.2f s  ${s.name}%s")
          }
        }
      }
    }
    spark.stop()
  }
}
