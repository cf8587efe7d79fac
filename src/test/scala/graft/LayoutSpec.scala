package graft

import graft.io.{Layout, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout guarantees: bucketed joins elide the shuffle;
  * partitioned writes prune at the directory level.
  */
class LayoutSpec extends SparkSuite {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val t = Tables(spark, Sf)
    // The in-memory catalog forgets tables between JVMs but their
    // warehouse directories survive — clear both or CTAS refuses.
    for (tbl <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Layout.writeBucketed(t.orders, "orders_b", "o_orderkey", numBuckets = 8)
    Layout.writeBucketed(t.lineitem, "lineitem_b", "l_orderkey", numBuckets = 8)
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() === t.lineitem.count())
  }

  test("unbucketed fact-fact join DOES shuffle (the baseline being saved)") {
    val t = Tables(spark, Sf)
    val joined = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
    // AQE may pick broadcast at this tiny scale; force the shuffle path
    // off to observe the structural difference.
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("Exchange") || plan.contains("Broadcast"),
      s"expected a shuffle or broadcast in the unbucketed plan:\n$plan")
  }

  test("partition filter prunes at the scan (PartitionFilters, not post-filter)") {
    val out = java.nio.file.Files.createTempDirectory("layout-part").toString
    Layout.writePartitioned(Tables(spark, Sf).events, out, "event_type")
    val read = spark.read.parquet(out).filter(col("event_type") === "click")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"no partition pruning visible:\n$scan")
    // Only the click directory's rows are read.
    val expected = Tables(spark, Sf).events.filter(col("event_type") === "click").count()
    assert(read.count() === expected)
  }
}
