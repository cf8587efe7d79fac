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
    // NULL-SAFE anti join: a plain equi-anti never matches NULL keys, so
    // a NULL-key update would ADD a row beside the stale NULL-key target
    // row instead of replacing it — the table would grow on every merge.
    val ukeys = updates.select(keys.map(k => col(k).as(s"_u_$k")): _*)
    val cond = keys.map(k => col(k) <=> col(s"_u_$k")).reduce(_ && _)
    updates.unionByName(target.join(ukeys, cond, "left_anti"))
  }

  /** SCD type-2 MERGE — history-preserving dimension maintenance: the
    * history table carries one row per (key, validity interval) with
    * `valid_from`/`valid_to` date-string columns (`valid_to` NULL =
    * current). Applying a key-unique `updates` batch effective at
    * `effectiveDate`:
    *
    *   - a current row whose payload differs from its update CLOSES
    *     (valid_to = effectiveDate) and the update OPENS a new current
    *     row (valid_from = effectiveDate, valid_to NULL);
    *   - a current row with an identical payload is untouched (no
    *     churn rows — re-applying the same batch is a no-op);
    *   - an update for an unseen key opens its first row;
    *   - already-closed rows pass through unchanged.
    *
    * Spark shape: already-closed history passes through without touching
    * the join at all; the open slice full-outer-joins the (small,
    * typically broadcast) update batch once, and each side of the
    * output union is a projection of that single join — no per-column
    * coalesce pyramid, no second shuffle. On a transactional store this
    * whole function is the canonical MERGE INTO ... WHEN MATCHED AND
    * payload-differs template; payload NULLs compare with null-safe
    * equality so NULL→value transitions close rows correctly.
    */
  def scd2(history: DataFrame, updates: DataFrame, key: String,
      payload: Seq[String], effectiveDate: String): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    require((Seq(key) ++ payload ++ Seq("valid_from", "valid_to"))
      .forall(history.columns.contains), "history must carry key, payload, valid_from, valid_to")
    require((key +: payload).forall(updates.columns.contains),
      "updates must carry key and payload")

    val closed = history.filter(col("valid_to").isNotNull)
    // Side-presence MARKERS, not key nullability: a NULL-key open row
    // used to satisfy neither keep (key.isNotNull) nor close/openNew
    // (no NULL==NULL match) and silently VANISHED from the history.
    // With markers it passes through `keep` untouched; a NULL-key
    // update opens its own row (standard join semantics — NULL keys
    // never match each other; an SCD dimension should not have them,
    // but a merge primitive must never lose rows).
    val open = history.filter(col("valid_to").isNull)
      .withColumn("_h", org.apache.spark.sql.functions.lit(1))
    val u = updates.select(
      (org.apache.spark.sql.functions.lit(1).as("_u") +:
        col(key).as("_u_key") +: payload.map(c => col(c).as(s"_u_$c"))): _*)
    val j = open.join(u, col(key) === col("_u_key"), "full_outer")
    val samePayload = payload.map(c => col(c) <=> col(s"_u_$c")).reduce(_ && _)
    val histCols = history.columns.map(col)

    // Open rows with no update, or with an identical payload: unchanged.
    // (The history marker keeps an unseen-key update whose payload is
    // entirely NULL — null-safe-equal to the absent history side — from
    // materializing a phantom all-null history row here.)
    val keep = j.filter(col("_h").isNotNull && (col("_u").isNull || samePayload))
      .select(histCols.toIndexedSeq: _*)
    // Changed: the old row closes at the effective date...
    val close = j.filter(col("_h").isNotNull && col("_u").isNotNull && !samePayload)
      .select(history.columns.map(c =>
        if (c == "valid_to") org.apache.spark.sql.functions.lit(effectiveDate).as(c)
        else col(c)).toIndexedSeq: _*)
    // ...and the update (changed or brand-new key) opens the new row.
    val openNew = j.filter(col("_u").isNotNull && (col("_h").isNull || !samePayload))
      .select(history.columns.map(c =>
        if (c == key) col("_u_key").as(c)
        else if (payload.contains(c)) col(s"_u_$c").as(c)
        else if (c == "valid_from") org.apache.spark.sql.functions.lit(effectiveDate).as(c)
        // Non-payload extras (valid_to, audit columns, ...) null out in
        // the HISTORY column's own type: a string-typed null would make
        // unionByName silently coerce e.g. a long audit column to string.
        else org.apache.spark.sql.functions.lit(null)
          .cast(history.schema(c).dataType).as(c)).toIndexedSeq: _*)
    closed.unionByName(keep).unionByName(close).unionByName(openNew)
  }

  /** The READ path of [[scd2]] — time-travel reconstruction: the table as
    * it stood at `asOf`, from the history's validity intervals. Interval
    * semantics are half-open [valid_from, valid_to): a row is effective
    * ON its valid_from day and stops at its valid_to day, so querying
    * exactly at a merge's effective date sees the NEW rows — the
    * convention under which [[scd2]]'s close-at/open-at pairs never
    * overlap and never gap. Validity columns are ISO date strings, so
    * the comparison is the same lexicographic compare in any engine.
    * One codegen'd filter over the history scan; at 100 TB a
    * zone-clustered layout on valid_from makes it skip.
    */
  def asOfSnapshot(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .drop("valid_from", "valid_to")

  /** Dimension-as-of-EVENT-time enrichment — the other read path of
    * [[scd2]] (where [[asOfSnapshot]] fixes one date for the whole
    * table, this fixes each fact's own date): every fact row joins the
    * single history row whose [valid_from, valid_to) interval contains
    * the fact's date column. Because a well-formed history partitions
    * time per key (the [[scd2]] invariant — no overlap, no gap after
    * first validity), the join multiplicity is exactly one for facts
    * inside the dimension's lifetime; earlier facts drop (inner join —
    * there was no dimension row to describe them).
    *
    * Scale shape: a plain equi-join on the key plus the interval
    * predicate — per-key history is a handful of rows, so the key
    * equality carries all the selectivity and the join hash-partitions
    * (or broadcasts) like any dimension join; no range-binning needed
    * (that machinery is for KEYLESS containment — ops.RangeJoin).
    * `dateCol` must be an ISO yyyy-MM-dd string like the validity
    * columns, so the comparison is engine-portable string ordering.
    */
  def temporalJoin(facts: DataFrame, history: DataFrame,
      factKey: String, histKey: String, dateCol: String): DataFrame = {
    val overlap = facts.columns.toSet intersect history.columns.toSet
    require(overlap.isEmpty, s"inputs share columns: $overlap")
    facts.join(history,
      col(factKey) === col(histKey) &&
        col(dateCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(dateCol) < col("valid_to")))
      .drop(histKey, "valid_from", "valid_to")
  }

  /** Snapshot diff — the INVERSE of [[upsert]]: given two versions of a
    * keyed table, derive the CDC changelog that MERGE would have applied
    * to turn the old snapshot into the new one. Per key:
    *
    *   - `insert`: key only in the new snapshot (row = new image);
    *   - `delete`: key only in the old snapshot (row = OLD image — the
    *     standard CDC convention: a delete record carries what vanished);
    *   - `update`: key in both with any payload difference under
    *     null-safe compare (row = new image; NULL→value and value→NULL
    *     transitions count as changes, 3VL never hides one);
    *   - `unchanged` rows are dropped unless `includeUnchanged`.
    *
    * Spark shape: ONE full-outer join on the key with presence flags and
    * a null-safe payload comparison — no per-column coalesce pyramid
    * beyond the single image projection, no second shuffle. At 100 TB
    * both snapshots hash-partition on the key (bucketed snapshots make
    * the join co-located), and the changelog this emits is exactly what
    * a downstream incremental consumer (or the [[graft.streaming]] sinks)
    * replays.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"schemas must align: ${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(oldSnap.columns.contains),
      s"missing key column in ${keys.mkString(",")}")
    val payload = oldSnap.columns.filterNot(keys.contains).toSeq
    val o = oldSnap.select((keys.map(col) ++
      payload.map(c => col(c).as(s"__old_$c"))): _*)
      .withColumn("__in_old", org.apache.spark.sql.functions.lit(true))
    val n = newSnap.select((keys.map(col) ++
      payload.map(c => col(c).as(s"__new_$c"))): _*)
      .withColumn("__in_new", org.apache.spark.sql.functions.lit(true))
    val j = o.join(n, keys, "full_outer")
    val inOld = org.apache.spark.sql.functions.coalesce(col("__in_old"),
      org.apache.spark.sql.functions.lit(false))
    val inNew = org.apache.spark.sql.functions.coalesce(col("__in_new"),
      org.apache.spark.sql.functions.lit(false))
    val differs =
      if (payload.isEmpty) org.apache.spark.sql.functions.lit(false)
      else payload.map(c => !(col(s"__old_$c") <=> col(s"__new_$c"))).reduce(_ || _)
    val action = org.apache.spark.sql.functions
      .when(!inOld, "insert")
      .when(!inNew, "delete")
      .when(differs, "update")
      .otherwise("unchanged")
    val image = payload.map { c =>
      org.apache.spark.sql.functions
        .when(action === "delete", col(s"__old_$c"))
        .otherwise(col(s"__new_$c")).as(c)
    }
    val out = j.select((keys.map(col) :+ action.as("action")) ++ image: _*)
    if (includeUnchanged) out else out.filter(col("action") =!= "unchanged")
  }

  /** [[snapshotDiff]] with BOTH images — `old_<c>` and `new_<c>` per
    * payload column — the changelog shape incremental aggregate
    * maintenance needs: an update's delta is new−old, which the
    * single-image changelog cannot express. Inserts carry NULL old
    * columns, deletes NULL new columns.
    */
  def snapshotDiffImages(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"schemas must align: ${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(oldSnap.columns.contains),
      s"missing key column in ${keys.mkString(",")}")
    val payload = oldSnap.columns.filterNot(keys.contains).toSeq
    val o = oldSnap.select((keys.map(col) ++
      payload.map(c => col(c).as(s"old_$c"))): _*)
      .withColumn("__in_old", org.apache.spark.sql.functions.lit(true))
    val n = newSnap.select((keys.map(col) ++
      payload.map(c => col(c).as(s"new_$c"))): _*)
      .withColumn("__in_new", org.apache.spark.sql.functions.lit(true))
    val j = o.join(n, keys, "full_outer")
    val inOld = org.apache.spark.sql.functions.coalesce(col("__in_old"),
      org.apache.spark.sql.functions.lit(false))
    val inNew = org.apache.spark.sql.functions.coalesce(col("__in_new"),
      org.apache.spark.sql.functions.lit(false))
    val differs =
      if (payload.isEmpty) org.apache.spark.sql.functions.lit(false)
      else payload.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    val action = org.apache.spark.sql.functions
      .when(!inOld, "insert")
      .when(!inNew, "delete")
      .when(differs, "update")
      .otherwise("unchanged")
    j.select((keys.map(col) :+ action.as("action")) ++
        payload.map(c => col(s"old_$c")) ++ payload.map(c => col(s"new_$c")): _*)
      .filter(col("action") =!= "unchanged")
  }
}
