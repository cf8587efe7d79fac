package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without an equi key — the shape Spark's
  * planner turns into a BroadcastNestedLoopJoin if written naively, which
  * is the classic 100 TB range-join trap. The scalable form used here is
  * time-axis binning (the standard trick in Spark range-join literature,
  * also what Databricks' range-join optimization does under the hood):
  *
  *   1. each interval explodes into the fixed-width bins it overlaps
  *      (linear in interval length / bin width);
  *   2. each point computes its single bin;
  *   3. candidates come from a plain hash EQUI-join on the bin id — a
  *      shuffle join, never a nested loop;
  *   4. the exact `start <= t < end` predicate filters candidates.
  *
  * Each point lands in exactly one bin and every overlapping interval
  * covers that bin, so the candidate set is complete and pair-unique — no
  * dedup pass is needed. Bin widths are measured in seconds but bin
  * membership is computed at MICROSECOND precision (Spark's timestamp
  * resolution): an interval ending at 01:00:00.500 covers the bin that
  * holds 01:00:00.200 — a whole-second bin computation would miss the
  * final fractional-second slice. Bin width is the recall/fan-out dial:
  * it should be on the order of the typical interval length, so each
  * interval explodes into O(1) bins and each bin holds a bounded slice
  * of points.
  *
  * Analog of a native engine's interval-index range scan, re-expressed as
  * the explode + equi-join Spark actually executes well at scale.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them
    * (half-open: start <= ts < end). Column sets must be disjoint and
    * neither input may carry the reserved `_bin`/`_bins` names; the
    * output carries all columns of both inputs, one row per (point,
    * containing interval). Empty or reversed intervals (end <= start)
    * contain nothing by definition and are dropped before binning — a
    * corrupt far-past/far-future end would otherwise explode into one
    * bin row per binSeconds of the gap.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, start: String, end: String,
      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"inputs share columns: $overlap")
    val reserved = (points.columns ++ intervals.columns).toSet intersect Set("_bin", "_bins")
    require(reserved.isEmpty,
      s"columns $reserved are reserved by pointInInterval (withColumn would clobber them)")
    val binMicros = binSeconds * 1000000L
    // Column names are interpolated into SQL expressions (`div` has no
    // Column-API form and double division would lose microseconds at
    // 1.7e18) — backtick-quote them so dots/spaces/hyphens in a name
    // resolve as the column, not as a path expression.
    def q(name: String) = "`" + name.replace("`", "``") + "`"

    // Interval [s, e) covers bins bin(s) .. bin(e - 1µs): the end bin is
    // excluded when the interval ends exactly on a bin boundary.
    val binned = intervals
      .filter(col(q(end)) > col(q(start)))
      .withColumn("_bins",
        sequence(
          expr(s"unix_micros(${q(start)}) div $binMicros"),
          expr(s"(unix_micros(${q(end)}) - 1) div $binMicros")))
      .withColumn("_bin", explode(col("_bins"))).drop("_bins")

    points.withColumn("_bin", expr(s"unix_micros(${q(pointTs)}) div $binMicros"))
      .join(binned, "_bin")
      .filter(col(q(pointTs)) >= col(q(start)) && col(q(pointTs)) < col(q(end)))
      .drop("_bin")
  }
}
