package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query rep runner — the tool behind BASELINE_BENCH's
  * standing ">= 3-rep isolated adjudication" policy, so mover verdicts
  * stop being hand-rolled throwaway mains. One fresh session, each named
  * query run `reps` times back-to-back (rep 1 = cold build, later reps =
  * steady state) with the library memo caches cleared before every rep,
  * exactly like Bench's rerun sweeps.
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
      .config("spark.sql.codegen.cache.maxEntries", "20000")
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
