package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window anomaly detection over keyed time series — the
  * data-quality monitor a production ingest pipeline runs alongside the
  * rollups it maintains: flag the hours whose event volume deviates from
  * the recent trailing window by more than k standard deviations. The
  * batch twin of a streaming alerting job, and the classical complement
  * of the MAD-based whole-series outlier pass (x90): MAD scores points
  * against the GLOBAL distribution, this scores each point against its
  * own trailing context, so a slow drift never desensitizes the flag.
  */
object Anomaly {

  /** Per-(key, time) anomaly flag from a trailing z-test computed in
    * EXACT integer arithmetic. For each row x with trailing-window count
    * n, sum s, and sum-of-squares ss (the `lookback` rows strictly
    * before it, per key, in time order):
    *
    *   z² > k²  ⟺  (n·x − s)² · (n−1)  >  k² · n · (n·ss − s²)
    *
    * — the sample-variance z-test cleared of every division, so the flag
    * is a pure BIGINT predicate: no engine's avg/stddev rounding (Welford
    * vs sum-of-squares, distributed vs serial order) can shift a boundary
    * row, which is what lets a serial SQL oracle replay a distributed
    * flag bit-for-bit. Rows with fewer than `minWindow` trailing
    * observations report false (not NULL): "not enough history" is a
    * non-alert, and the window stats columns expose the evidence.
    *
    * A constant trailing window (variance 0) flags ANY deviation — the
    * right-hand side collapses to 0, so x ≠ mean alerts; x = mean never
    * does (0 > 0 fails). The degenerate case needs no special-casing.
    *
    * Scale shape: one window function pass, hash-partitioned by key and
    * sorted by time within the partition — no join, no self-join against
    * shifted copies, no driver state. Overflow envelope: with values up
    * to v and lookback L, the dominant term is k²·n²·ss ≤ k²·L³·v²;
    * the default (k=3, L=24) admits v up to ~2·10⁶ per hour-bucket with
    * 10³× headroom in a signed 64-bit long.
    */
  def trailingAnomaly(series: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, lookback: Int = 24, kSigma: Int = 3,
      minWindow: Int = 12): DataFrame = {
    require(lookback >= 2 && minWindow >= 2 && minWindow <= lookback,
      "need at least 2 trailing rows for a sample variance")
    require(kSigma >= 1, "kSigma must be a positive integer")
    // Tie-break on the value: duplicate (key, time) pairs would leave
    // the within-tie order — and therefore the trailing frame contents —
    // up to shuffle nondeterminism, voiding the bit-replay contract for
    // exactly the tied rows. (Rows identical in key, time AND value are
    // interchangeable, so (time, value) is a sufficient total order.)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("x"))
      .rowsBetween(-lookback, -1)
    val n = col("trail_n")
    val s = col("trail_sum")
    val ss = col("trail_sumsq")
    val x = col("x")
    series
      .select(col(keyCol), col(timeCol), col(valueCol).cast("long").as("x"))
      .withColumn("trail_n", count(x).over(w))
      .withColumn("trail_sum", coalesce(sum(x).over(w), lit(0L)))
      .withColumn("trail_sumsq", coalesce(sum(x * x).over(w), lit(0L)))
      // coalesce: a NULL value (or a non-numeric string the cast
      // nulled) is a NON-alert, not a 3VL leak into the flag column.
      .withColumn("is_anomaly",
        coalesce(
          n >= minWindow &&
            (n * x - s) * (n * x - s) * (n - lit(1L)) >
              lit(kSigma.toLong * kSigma) * n * (n * ss - s * s),
          lit(false)))
      .withColumnRenamed("x", valueCol)
  }
}
