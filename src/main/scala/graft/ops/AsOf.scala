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
    val r = right.select(col(key),
        struct(rPayload.map(col).toIndexedSeq: _*).as("__p"))
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
    * Same linear union-window shape, mirrored: one shuffle on the key,
    * a first(ignoreNulls) over the FOLLOWING frame. At equal times the
    * right row is visible to the left row (inclusive >=) because right
    * rows sort after left rows within a timestamp; simultaneous right
    * rows are ordered by `rightTieBreak` ascending, the EARLIEST winning.
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
    val r = right.select(col(key),
        struct(rPayload.map(col).toIndexedSeq: _*).as("__p"))
      .withColumn("__t", col("__p").getField(rightTime))
      .withColumn("__side", lit(2))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // Left rows sort before right rows at equal time => inclusive (>=).
    val order = Seq(col("__t").asc, col("__side").asc) ++
      rightTieBreak.map(c => col("__p").getField(c).asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        rPayload.map(c => col("__p").getField(c).as(prefix + c))).toIndexedSeq: _*)
  }
}
