package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Plan inspection: `sbt "runMain graft.Explain <sfDir> <query>..."`
  * prints the formatted physical plan of each named query (all benched
  * queries when none named) — the tool used to keep broadcasts, pushed
  * filters, and whole-stage codegen spans honest.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.benchSet.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Same extensions as Bench/Verify: without GraftExtensions'
      // MergePercentiles rule this tool would print plans (N separate
      // percentile buffers) that the benched session never executes.
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      Registry.queryMap(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
