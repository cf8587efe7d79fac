package graft

import graft.io.{Layout, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout guarantees: bucketed joins elide the shuffle;
  * partitioned writes prune at the directory level.
  */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

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

  test("zone-clustered parquet actually SKIPS row groups for a selective predicate") {
    // The reader half of x63's zone-map statistics: parquet keeps min/max
    // per row group (the zone map), and the vectorized reader drops whole
    // groups whose bounds exclude a pushed predicate. Clustering is what
    // makes the bounds selective — the A/B below runs ONE query against
    // two layouts of the same rows and reads the scan node's own
    // numOutputRows metric: clustered skips, scrambled reads everything.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.FileSourceScanExec
    val orders = Tables(spark, Sf).orders
    val total = orders.count()
    val clustered = "/tmp/graft-zone-clustered"
    val scrambled = "/tmp/graft-zone-scrambled"
    // Tiny row groups (the writer checks the block budget every ~100
    // records) so even the sf0.001 file carries many zones.
    orders.orderBy("o_orderkey").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024).parquet(clustered)
    orders.orderBy(md5(col("o_orderkey").cast("string"))).coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024).parquet(scrambled)
    def scanRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path).filter(col("o_orderkey") <= 100)
      // collect(), not count(): count() builds a NEW aggregate plan whose
      // metrics live elsewhere — the skip proof must read the metric of
      // the exact plan instance that executed.
      val result = df.collect().length.toLong
      val scanned = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (result, scanned)
    }
    val (hitC, scanC) = scanRows(clustered)
    val (hitS, scanS) = scanRows(scrambled)
    assert(hitC === hitS, "same rows must match under both layouts")
    assert(scanS === total,
      s"scrambled layout should read every row (no skippable zones), scanned $scanS of $total")
    assert(scanC < total / 2,
      s"clustered layout skipped nothing: scanned $scanC of $total")
  }

  test("z-ordered parquet skips row groups on BOTH keys; linear sort only on its leading key") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // Z-order skip resolution is bounded by the number of row groups, so
    // the fixture needs enough rows for ~150 zones (the sf0.001 tables
    // carry too few) — 20k rows with independent uniform keys.
    val rows = spark.range(20000).select(
      col("id").as("ka"),
      pmod(conv(substring(md5(concat(lit("zb|"), col("id").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long"), lit(20000L)).as("kb"))
    val total = rows.count()
    val zpath = "/tmp/graft-zorder"
    val linear = "/tmp/graft-zorder-linear"
    graft.io.Layout.writeZOrdered(rows.coalesce(1), zpath,
      "ka", "kb", rowGroupBytes = 16 * 1024)
    rows.orderBy("ka").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024).parquet(linear)
    def scanRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path).filter(pred)
      val hits = df.collect().length.toLong
      val scanned = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (hits, scanned)
    }
    val predA = col("ka") <= 1250L
    val predB = col("kb") <= 1250L
    // Leading-key predicate: both layouts skip.
    val (hitZa, scanZa) = scanRows(zpath, predA)
    val (hitLa, scanLa) = scanRows(linear, predA)
    assert(hitZa === hitLa)
    assert(scanLa < total / 4, s"linear layout should skip on its own key ($scanLa of $total)")
    assert(scanZa < total / 2, s"z-order should skip on key A ($scanZa of $total)")
    // Second-key predicate: z-order still skips, the linear layout cannot.
    val (hitZb, scanZb) = scanRows(zpath, predB)
    val (hitLb, scanLb) = scanRows(linear, predB)
    assert(hitZb === hitLb)
    assert(scanLb === total,
      s"linear-by-A layout has no selective bounds on B, scanned $scanLb of $total")
    assert(scanZb < total / 2,
      s"z-order skipped nothing on key B: scanned $scanZb of $total")
  }

  test("compact rewrites a many-small-files table into the planned file count, row-identical") {
    val in = java.nio.file.Files.createTempDirectory("compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString + "/t"
    val docs = Tables(spark, Sf).documents
    docs.repartition(40).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    val before = parquetFiles(in)
    assert(before.length === 40, "fixture must start fragmented")
    val totalBytes = before.map(_.length).sum
    val target = totalBytes / 3 // plan: ceil(bytes / (bytes/3)) = 3..4 files
    val audit = Layout.compact(spark, in, out, target).collect()(0)
    assert(audit.getLong(0) === 40)
    assert(audit.getLong(1) === totalBytes)
    val planned = audit.getLong(2)
    assert(planned >= 3 && planned <= 4, s"planned $planned")
    assert(parquetFiles(out).length === planned.toInt)
    // Content identical.
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0)
    // Range-sorted compaction restores per-file clustering on the key:
    // file-level [min,max] doc_id intervals must not overlap.
    val out2 = out + "_sorted"
    Layout.compact(spark, in, out2, target, sortCol = Some("doc_id"))
    val spans = spark.read.parquet(out2)
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("lo").select("lo", "hi").as[(Long, Long)].collect()
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file spans overlap: $hi1 >= $lo2")
      case _ =>
    }
    // PARTITIONED input (files under key=value subdirs): a flat listing
    // would see only directories, report bytes_before = 0, and compact
    // the whole table into ONE partition. The recursive walk must find
    // the real files and plan accordingly.
    val pin = java.nio.file.Files.createTempDirectory("compact-part-in").toString
    val pout = java.nio.file.Files.createTempDirectory("compact-part-out").toString + "/t"
    Layout.writePartitioned(
      Tables(spark, Sf).events.repartition(8), pin, "event_type")
    val pFiles = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(pin)).filter(_.getName.endsWith(".parquet"))
    }
    val pBytes = pFiles.map(_.length).sum
    val pAudit = Layout.compact(spark, pin, pout, pBytes / 3).collect()(0)
    assert(pAudit.getLong(0) === pFiles.length.toLong,
      s"files_before ${pAudit.getLong(0)} != ${pFiles.length} nested files")
    assert(pAudit.getLong(1) === pBytes, "bytes_before must count nested files")
    assert(pAudit.getLong(2) >= 3, s"planned ${pAudit.getLong(2)} — flat listing regression")
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

  test("DYNAMIC partition pruning: a filtered dim prunes the partitioned " +
    "fact's directories at runtime — the 100 TB star-join contract") {
    // The static test above needs the predicate ON the partition column;
    // a star join filters the DIMENSION and Spark must push a runtime
    // subquery into the fact scan's PartitionFilters (DPP). Without it,
    // every date-partitioned fact scan reads all of history whenever the
    // filter lives on the dim attributes — the single most expensive
    // planner miss a partitioned warehouse can make.
    val t = Tables(spark, Sf)
    val out = java.nio.file.Files.createTempDirectory("layout-dpp").toString
    Layout.writePartitioned(
      t.orders.withColumn("o_year", year(col("o_orderdate"))), out, "o_year")
    val fact = spark.read.parquet(out)
    val nYears = fact.select("o_year").distinct().count()
    assert(nYears >= 3, "fixture must span several partitions")
    // Dimension: one attribute row per year; the filter selects ONE year
    // by an attribute the fact doesn't carry.
    val dim = fact.select(col("o_year").as("d_year")).distinct()
      .withColumn("d_tag", concat(lit("y"), col("d_year")))
    val tag = dim.orderBy("d_year").limit(1).collect()(0).getString(1)
    val joined = fact.join(dim.filter(col("d_tag") === tag),
      col("o_year") === col("d_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery reached the fact scan's PartitionFilters:\n$plan")
    // And it is not cosmetic: the join reads exactly the one year's rows.
    val wantYear = tag.drop(1).toInt
    assert(joined.count() ===
      t.orders.filter(year(col("o_orderdate")) === wantYear).count())
  }
}
