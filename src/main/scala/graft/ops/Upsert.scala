package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SCD type-1 MERGE (upsert) — the one warehouse mutation the read-only
  * reference never needed but any user of a real deployment does:
  * same-key rows from `updates` replace rows in `target`, unmatched
  * update keys insert.
  *
  * Spark shape: NOT a full-outer join + per-column coalesce (wide, builds
  * both sides) but `updates UNION (target ANTI-JOIN update-keys)` — the
  * anti join carries only the key columns of the small side and
  * broadcasts when updates are small (the common case: a day's changes
  * against a 100 TB dimension). At scale the result lands back in a
  * bucketed table so the next merge's anti join stays co-located.
  *
  * Last-writer-wins requires `updates` itself to be key-unique — enforced
  * upstream or with a dropDuplicates on the caller's chosen ordering
  * (nondeterministic otherwise, so this function does not guess one).
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.toSeq == updates.columns.toSeq,
      s"schemas must align: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    require(keys.forall(target.columns.contains), s"missing key column in ${keys.mkString(",")}")
    updates.unionByName(
      target.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }
}
