package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta) maintenance of materialized aggregates — the
  * batch analog of the streaming view in `graft.streaming`: instead of
  * recomputing an aggregate from a 100 TB base after every change, apply
  * the (tiny) CDC changelog's algebraic delta to the previous aggregate.
  * COUNT and SUM form an abelian group under deltas (insert adds,
  * delete subtracts, update adds the difference), which is exactly why
  * they — unlike MAX or COUNT DISTINCT — are incrementally maintainable
  * without auxiliary state.
  */
object Incremental {

  /** Apply a both-images changelog ([[Upsert.snapshotDiffImages]] shape)
    * to a (groupKey, n, total) aggregate. The changelog's group-key
    * column must be STABLE across updates (a key migration must arrive
    * as delete+insert — the standard CDC contract; this function cannot
    * see a move expressed as an in-place update).
    *
    * Exactness: with a DECIMAL `total` the delta addition is exact and
    * order-free, so the incremental result is bit-identical to a full
    * recompute — the property the x92 gate proves against DuckDB.
    * Groups whose count reaches zero drop (matching recompute, where
    * the group no longer exists). NULL value images contribute 0 to the
    * total on whichever side is NULL (an insert of a NULL value adds
    * nothing; a NULL→v update adds v; a v→NULL update subtracts v) —
    * matching sum()'s NULL-skipping in a full recompute, instead of the
    * whole delta evaluating to NULL and being silently dropped. One
    * inherent divergence remains: a surviving group whose values are ALL
    * NULL reports total 0 where a full recompute's sum() reports NULL —
    * (n, total) state cannot distinguish "all NULL" from "sums to 0"
    * without a third counter; callers for whom that distinction matters
    * should 0-coalesce values at ingestion.
    *
    * Scale shape: one aggregate over the changelog (tiny), one
    * full-outer join against the previous aggregate on the group key —
    * at 100 TB both sides hash-partition on that key, and the join is
    * broadcast when the delta is a day's changes against a big rollup.
    */
  def applyCountSumDelta(agg: DataFrame, changelog: DataFrame,
      groupKey: String, oldVal: String, newVal: String): DataFrame = {
    val delta = changelog.groupBy(col(groupKey))
      .agg(
        sum(when(col("action") === "insert", 1L)
          .when(col("action") === "delete", -1L)
          .otherwise(0L)).as("__dn"),
        sum(when(col("action") === "insert", coalesce(col(newVal), lit(0)))
          .when(col("action") === "delete", -coalesce(col(oldVal), lit(0)))
          .otherwise(coalesce(col(newVal), lit(0)) - coalesce(col(oldVal), lit(0))))
          .as("__dtotal"))
    // NULL-SAFE group match (the Hll.cardinalityByGroup convention): a
    // plain equi-join would split a NULL group into two output rows —
    // the prior state on one, the delta on the other — breaking the
    // bit-identical-to-recompute guarantee for NULL-keyed groups.
    val d = delta.withColumnRenamed(groupKey, "__dkey")
    agg.join(d, col(groupKey) <=> col("__dkey"), "full_outer")
      .select(coalesce(col(groupKey), col("__dkey")).as(groupKey),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0)) + coalesce(col("__dtotal"), lit(0)))
          .as("total"))
      .filter(col("n") > 0)
  }
}
