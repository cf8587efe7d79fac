package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical layout control — the two levers that replace the reference's
  * B-tree indexes at cluster scale (SURVEY.md §1.4, §4):
  *
  *   - **Partitioned parquet** (directory-level pruning): a filter on the
  *     partition column skips whole directories before any IO. The
  *     analytics-date and category columns are the natural keys.
  *
  *   - **Bucketed tables** (co-located joins): both fact tables bucketed
  *     on the join key land join-compatible — Catalyst elides the shuffle
  *     entirely (no Exchange in the plan), which at 100 TB turns the
  *     orders⋈lineitem join from the dominant network cost into a local
  *     zip. Bucketing requires the table catalog (`saveAsTable`);
  *     `spark.sql.sources.bucketing.enabled` is on by default.
  *
  * Verified by LayoutSpec: the bucketed fact-fact join plan contains no
  * shuffle exchange, and a partition filter shows up as PartitionFilters
  * in the scan (not a post-scan filter).
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Partitioned AND bucketed catalog table — the layout for MUTABLE
    * big tables maintained by partition-overwrite merges (the streaming
    * gram index's cluster shape, [[graft.streaming.Streams
    * .mergeSubstrIndexPartitioned]]): the partition column bounds what a
    * merge must rewrite (dynamic partition overwrite touches only
    * partitions present in the written frame), while bucketing+sorting
    * on the probe key keeps per-partition files sorted for tight
    * row-group statistics on that key. */
  def writeBucketedPartitioned(df: DataFrame, table: String,
      bucketCol: String, partitionCol: String, numBuckets: Int = 4): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Zone-clustered parquet — the READER half of zone-map statistics
    * (x63 computes the stats; this layout makes them selective): a global
    * sort on the cluster key before writing gives every parquet row group
    * a tight min/max on that key, so a pushed range predicate skips whole
    * groups without touching their bytes. `rowGroupBytes` sets zone
    * granularity (smaller groups = finer skipping = more footer overhead;
    * the 128 MB default is the production setting, tests shrink it so a
    * toy file still carries many zones). Skipping is proven from the scan
    * node's own metrics in LayoutSpec and wall-clocked in Bench's layout
    * demo.
    */
  def writeZoneClustered(df: DataFrame, path: String, clusterCol: String,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.sort(clusterCol)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)

  /** Z-order (Morton-curve) clustering on TWO keys — the multi-column
    * generalization of [[writeZoneClustered]] (the lakehouse OPTIMIZE
    * ZORDER move): a linear sort gives tight row-group bounds on its
    * leading key only, so a predicate on the second key skips nothing;
    * interleaving the bits of both keys gives every row group a bounded
    * extent in BOTH dimensions, so single-column range predicates on
    * EITHER key skip row groups. Each key min-max normalizes to a 16-bit
    * grid (one tiny bounds aggregate, broadcast back), the 32-bit Morton
    * code is a pure bit-interleave expression — codegen'd, no shuffle
    * beyond the final range sort every clustered write already pays.
    * Proven from scan-node metrics in LayoutSpec the same way the
    * one-key zone layout is.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions._
    val bounds = df.agg(
      min(col(colA).cast("double")).as("amin"),
      max(col(colA).cast("double")).as("amax"),
      min(col(colB).cast("double")).as("bmin"),
      max(col(colB).cast("double")).as("bmax"))
    def grid(x: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
        hi: org.apache.spark.sql.Column) =
      when(hi > lo,
        floor((x.cast("double") - lo) * lit(65535.0) / (hi - lo)).cast("long"))
        .otherwise(lit(0L))
    val ua = grid(col(colA), col("amin"), col("amax"))
    val ub = grid(col(colB), col("bmin"), col("bmax"))
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .plus(shiftleft(shiftright(ua, b).bitwiseAND(lit(1L)), 2 * b + 1))
        .plus(shiftleft(shiftright(ub, b).bitwiseAND(lit(1L)), 2 * b))
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .sort("__z")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Small-file compaction — the lakehouse OPTIMIZE/rewrite move. A table
    * that accumulated thousands of tiny files (streaming micro-batches,
    * over-parallel writes, per-partition dribble) taxes every future scan
    * three ways: listing RPCs, one scheduler task per file, and a parquet
    * footer read per file that can exceed the data read itself. Compaction
    * rewrites the table into ceil(bytes / targetBytes) files.
    *
    * `sortCol = Some(k)` uses a RANGE repartition on k so the rewrite also
    * restores zone clustering (tight per-file min/max on k — see
    * [[writeZoneClustered]]); `None` uses round-robin, which balances
    * output file sizes exactly but keeps no ordering.
    *
    * Driver state is file METADATA only (the listing being compacted away
    * is the pathology, and it is exactly bounded by the pre-compaction
    * file count); the data path is one distributed read → shuffle →
    * write. Returns a one-row audit frame (files/bytes before, files
    * planned) — read back the directory for files-after if needed.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      sortCol: Option[String] = None): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(inPath != outPath, "compaction must write to a fresh directory")
    import org.apache.spark.sql.functions._
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // RECURSIVE listing: a partitioned table keeps its files under
    // key=value subdirectories — a flat listStatus would see only
    // directories, report bytes_before = 0, and "compact" a multi-GB
    // table into ONE output partition (a single straggler task and one
    // giant file). The recursion is the same metadata walk the scan
    // itself performs.
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(inPath), true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) files += st
    }
    val bytesBefore = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val repartitioned = sortCol match {
      case Some(k) => df.repartitionByRange(nOut, col(k))
      case None    => df.repartition(nOut)
    }
    repartitioned.write.mode(SaveMode.Overwrite).parquet(outPath)
    import spark.implicits._
    Seq((files.length.toLong, bytesBefore, nOut.toLong))
      .toDF("files_before", "bytes_before", "files_planned")
  }
}
