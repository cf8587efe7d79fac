package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — an operator Spark lacks natively (DuckDB: ASOF JOIN,
  * kdb: aj, Flink: temporal join): for every left row, attach the latest
  * right row whose time is <= the left row's time, per key.
  *
  * Spark-first shape: NOT a join + filter + rank (which materializes the
  * full left×right-within-key product before pruning — quadratic per key)
  * but the sort-merge/streaming shape: union both sides, one window pass
  * ordered by (time, side) carrying the right payload forward with
  * last(ignoreNulls). One shuffle on the key, linear in |left|+|right|,
  * and the per-key window is the same partitioned window every
  * sessionization uses — no global ordering anywhere.
  */
object AsOf {

  /** @param key       equi-join key column (present on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightTieBreak optional right column ordering simultaneous
    *   right rows (the later wins); without it, ties on (key, time) pick
    *   an arbitrary — but value-identical if payloads agree — row
    * @param prefix    prepended to every right column in the output
    *
    * Output: every `left` row + `prefix`-named right payload columns
    * (NULL when no right row precedes the left row's time).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Option[String] = None, prefix: String = "asof_"): DataFrame = {
    val rPayload = right.columns.filterNot(_ == key)
    require(!rPayload.map(prefix + _).exists(left.columns.contains),
      s"prefix '$prefix' collides with a left column")
    val reserved = Seq("__t", "__side", "__p")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"columns ${reserved.mkString("/")} are reserved by asofJoin")
    // The whole right payload travels as ONE struct, so the attached row
    // is atomic: a NULL field in the latest right row stays NULL instead
    // of being backfilled per-column from an older row (per-column
    // last(ignoreNulls) would stitch a chimera of several right rows —
    // not what ASOF means). The struct itself is never NULL for right
    // rows, so last(ignoreNulls) skips exactly the left rows.
    // A right row with a NULL event time precedes NOTHING — ascending
    // sort is NULLS FIRST, so an unfiltered NULL-time row would sort to
    // the head of every key partition and become the default enrichment
    // for every early left row (one corrupt timestamp poisoning the
    // key). Such rows are excluded; the affected left rows correctly
    // read NULL.
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key), struct(rPayload.map(col).toIndexedSeq: _*).as("__p"))
      .withColumn("__t", col("__p").getField(rightTime))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // Right rows sort before left rows at equal time => inclusive (<=).
    val order = Seq(col("__t").asc, col("__side").asc) ++
      rightTieBreak.map(c => col("__p").getField(c).asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        rPayload.map(c => col("__p").getField(c).as(prefix + c))).toIndexedSeq: _*)
  }

  /** FORWARD as-of join — the time-mirror of [[asofJoin]]: for every left
    * row, attach the EARLIEST right row whose time is >= the left row's
    * time, per key (next-event attribution: the purchase after the error,
    * the deploy after the alert, the SLA-clock stop after the start).
    *
    * Same linear union-window shape, mirrored BY REVERSING THE SORT, not
    * the frame: "first right row at-or-after me" under ascending time is
    * exactly "last right row at-or-before me" under DESCENDING time, so
    * the pass stays a running last(ignoreNulls) over
    * [unboundedPreceding, currentRow] — the frame Spark accumulates
    * incrementally, O(rows) per partition. The naive mirror (a
    * first(ignoreNulls) over [currentRow, unboundedFollowing]) is NOT
    * symmetric in cost: Spark's UnboundedFollowingWindowFunctionFrame
    * re-aggregates the remaining suffix for every row, O(rows²) per key
    * partition — a hot key with 10⁶ events would pay 10¹² frame steps at
    * 100 TB while the running frame pays 10⁶ (the 30× ScaleProbe already
    * showed the drift: exponent 0.77 quadratic-shaped vs 0.5-ish for the
    * backward twin). At equal times the right row is visible to the left
    * row (inclusive >=) because right rows sort BEFORE left rows within
    * a timestamp under the descending order; simultaneous right rows
    * order by `rightTieBreak` DESCENDING so the running last() crowns
    * the tie-break-ASCENDING earliest — the same winner as the ascending
    * formulation.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Option[String] = None, prefix: String = "next_"): DataFrame = {
    val rPayload = right.columns.filterNot(_ == key)
    require(!rPayload.map(prefix + _).exists(left.columns.contains),
      s"prefix '$prefix' collides with a left column")
    val reserved = Seq("__t", "__side", "__p")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"columns ${reserved.mkString("/")} are reserved by asofJoinForward")
    // NULL-time right rows follow nothing — excluded, mirroring
    // [[asofJoin]] (descending sort puts them last, where they would
    // attach to NULL-time left rows as a phantom "next event").
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key), struct(rPayload.map(col).toIndexedSeq: _*).as("__p"))
      .withColumn("__t", col("__p").getField(rightTime))
      .withColumn("__side", lit(2))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // DESCENDING time: right rows (side 2) sort before left rows (side 1)
    // at equal time => inclusive (>=); tie-break descending so the
    // running last() picks the tie-break-ascending earliest right row.
    val order = Seq(col("__t").desc, col("__side").desc) ++
      rightTieBreak.map(c => col("__p").getField(c).desc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        rPayload.map(c => col("__p").getField(c).as(prefix + c))).toIndexedSeq: _*)
  }
}
