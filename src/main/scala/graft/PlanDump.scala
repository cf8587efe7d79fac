package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan dump for any registered query — the adjudication tool's
  * plan-diff half (QueryProbe is the timing half): when a bench mover has
  * a code change attached, the standing policy wants its plan inspected
  * before the baseline row moves. Prints the formatted plan (scan
  * pushdowns, codegen spans, exchange count) per query name.
  *
  * usage: runMain graft.PlanDump [sfDir] q1[,q2...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // One arg = just the query list (default dir); two = dir + list.
    val (dir, names) = args.toSeq match {
      case Seq(qs)    => ("/root/testdata/sf0.001", qs.split(",").toSeq)
      case Seq(d, qs) => (d, qs.split(",").toSeq)
      case _          => sys.error("usage: PlanDump [sfDir] q1[,q2...]")
    }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = queries.Registry.queryMap.getOrElse(name,
        sys.error(s"unknown query: $name (see queries.Registry)"))
      println(s"=== plan: $name ===")
      println(q(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
