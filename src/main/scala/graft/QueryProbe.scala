package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query rep runner — the tool behind BASELINE_BENCH's
  * standing ">= 3-rep isolated adjudication" policy, so mover verdicts
  * stop being hand-rolled throwaway mains. One fresh session, each named
  * query run `reps` times back-to-back (rep 1 = cold build, later reps =
  * steady state) with EXACTLY the cache set Bench.timeQuiet clears
  * cleared before every rep (Dedup/TextAnalysis/Similarity memos — NOT
  * Report's monthly rollup, which Bench's reruns also keep warm): an
  * adjudication only means something if it measures the same quantity
  * as the committed median it adjudicates.
  *
  * Usage: runMain graft.QueryProbe [sfDir] [reps] query[,query...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: QueryProbe [sfDir] [reps] q1[,q2...]"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // Same nanos handling as Bench/Verify: without it the event-family
      // queries (x15/x31/x64/x141...) crash on TIMESTAMP(NANOS) parquet
      // and the adjudication tool can't adjudicate event movers.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        graft.ext.Dedup.clearCaches(spark)
        graft.ext.TextAnalysis.clearCaches(spark)
        graft.ext.Similarity.clearCaches(spark)
        graft.queries.Report.clearCaches(spark)
        graft.ops.Kmv.clearCaches(spark)
        val t0 = System.nanoTime()
        queries.Registry.queryMap(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[qprobe] $name: ${times.map(t => f"$t%.2f").mkString(" ")}" +
        f" -> median $med%.2f s")
    }
    spark.stop()
  }
}
