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
}
