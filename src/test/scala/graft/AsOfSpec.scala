package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** Edge semantics of the generic as-of join (ops/AsOf): inclusive ties,
  * NULL when nothing precedes, per-key isolation, tie-break ordering.
  * (The oracle gate cross-checks the operator against DuckDB's native
  * ASOF JOIN on real data — x31; these pin the corners.)
  */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")),
    (4L, 30L, ts("2024-01-01 09:00:00"))
  ).toDF("id", "k", "t")

  private val right = Seq(
    (10L, ts("2024-01-01 09:30:00"), "a"),
    (10L, ts("2024-01-01 12:00:00"), "b"), // == left id=2's time: inclusive
    (20L, ts("2024-01-01 11:00:00"), "late") // after left id=3: excluded
  ).toDF("k", "rt", "v")

  private lazy val joined =
    AsOf.asofJoin(left, right, "k", "t", "rt", rightTieBreak = Some("rt"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap

  test("latest right row at or before the left time is attached") {
    assert(joined(1L).contains("a"))
  }

  test("a right row at exactly the left time wins (inclusive)") {
    assert(joined(2L).contains("b"))
  }

  test("no preceding right row -> NULL payload") {
    assert(joined(3L).isEmpty) // right row exists but is later
    assert(joined(4L).isEmpty) // key has no right rows at all
  }

  test("every left row survives exactly once") {
    val all = AsOf.asofJoin(left, right, "k", "t", "rt")
    assert(all.count() === 4)
    assert(all.select("id").distinct().count() === 4)
    assert(all.columns.toSet === Set("id", "k", "t", "asof_rt", "asof_v"))
  }

  test("simultaneous right rows: tie-break column decides (later wins)") {
    val r2 = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1L, "first"),
      (10L, ts("2024-01-01 09:30:00"), 2L, "second")
    ).toDF("k", "rt", "seq", "v")
    val out = AsOf.asofJoin(left.filter($"id" === 1L), r2, "k", "t", "rt",
      rightTieBreak = Some("seq"))
    assert(out.select("asof_v").as[String].head() === "second")
  }

  test("attached right row is atomic: a NULL field in the latest row stays NULL") {
    // Older right row has v='x'; latest has v=NULL. Per-column carry
    // would stitch (a from latest, v from older) — the attached row must
    // be exactly the latest one, NULLs included.
    val r = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some("x"), 1L),
      (10L, ts("2024-01-01 09:30:00"), None: Option[String], 2L)
    ).toDF("k", "rt", "v", "a")
    val out = AsOf.asofJoin(left.filter($"id" === 1L), r, "k", "t", "rt")
      .select("asof_v", "asof_a").collect().head
    assert(out.isNullAt(0))
    assert(out.getLong(1) === 2L)
  }

  test("prefix collision is rejected") {
    val bad = left.withColumnRenamed("id", "asof_rt")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(bad, right, "k", "t", "rt")
    }
  }

  test("forward as-of: earliest right at or after the left time, else NULL") {
    val fwd = AsOf.asofJoinForward(left, right, "k", "t", "rt",
        rightTieBreak = Some("v"))
      .select("id", "next_v").as[(Long, Option[String])].collect().toMap
    assert(fwd(1L).contains("b"), "next right after 10:00 is 12:00/b")
    assert(fwd(2L).contains("b"), "equal time is inclusive (>=)")
    assert(fwd(3L).contains("late"), "11:00 follows 09:00")
    assert(fwd(4L).isEmpty, "key 30 has no right rows at all")
  }

  test("forward as-of: simultaneous right rows tie-break ascending (earliest wins)") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq(
      (10L, ts("2024-01-01 10:30:00"), "z"),
      (10L, ts("2024-01-01 10:30:00"), "a")).toDF("k", "rt", "v")
    val fwd = AsOf.asofJoinForward(l, r, "k", "t", "rt", rightTieBreak = Some("v"))
      .select("next_v").as[String].collect()
    assert(fwd.toSeq === Seq("a"))
  }

  test("upsert: update wins, untouched rows survive, new keys insert") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n")
    val updates = Seq((2L, "B!", 99), (9L, "new", 1)).toDF("k", "v", "n")
    val merged = graft.ops.Upsert.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(merged === Seq((1L, "a", 10), (2L, "B!", 99), (3L, "c", 30), (9L, "new", 1)))
    intercept[IllegalArgumentException] {
      graft.ops.Upsert.upsert(target, updates.select("v", "k", "n"), Seq("k"))
    }
  }

  test("scd2: changed rows close+reopen, same payload no-ops, new keys open, closed rows pass") {
    val hist = Seq(
      (1L, "A", "2000-01-01", null.asInstanceOf[String]), // payload changes
      (2L, "B", "2000-01-01", null.asInstanceOf[String]), // same payload -> no-op
      (3L, "C", "2000-01-01", "2000-06-01"),              // already closed
      (3L, "D", "2000-06-01", null.asInstanceOf[String])  // current for 3, no update
    ).toDF("k", "seg", "valid_from", "valid_to")
    val upd = Seq((1L, "Z"), (2L, "B"), (9L, "N")).toDF("k", "seg")
    val out = graft.ops.Upsert.scd2(hist, upd, "k", Seq("seg"), "2001-01-01")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(rows(out) === Seq(
      (1L, "A", "2000-01-01", "2001-01-01"),
      (1L, "Z", "2001-01-01", null),
      (2L, "B", "2000-01-01", null),
      (3L, "C", "2000-01-01", "2000-06-01"),
      (3L, "D", "2000-06-01", null),
      (9L, "N", "2001-01-01", null)))
    // Idempotence: re-applying the same batch later changes nothing —
    // the every-row-identical payload comparison yields only no-ops.
    val again = graft.ops.Upsert.scd2(out, upd, "k", Seq("seg"), "2002-01-01")
    assert(rows(again) === rows(out))
  }

  test("scd2 idempotence law at width: re-applying any batch is a no-op, twice-changed keys close once") {
    // 200 keys with hash-derived segments; updates flip every third key.
    val hist = (1L to 200L).map(k => (k, s"seg${k % 7}", "2000-01-01", null.asInstanceOf[String]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val upd = (1L to 200L).map(k => (k, if (k % 3 == 0) "FLIPPED" else s"seg${k % 7}"))
      .toDF("k", "seg")
    val once = graft.ops.Upsert.scd2(hist, upd, "k", Seq("seg"), "2001-01-01")
    val flipped = (1L to 200L).count(_ % 3 == 0)
    assert(once.count() === 200L + flipped)          // one closed row per change
    assert(once.filter(col("valid_to").isNull).count() === 200L) // exactly one open row per key
    val twice = graft.ops.Upsert.scd2(once, upd, "k", Seq("seg"), "2002-01-01")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "valid_from").collect().map(_.toSeq).toSeq
    assert(canon(twice) === canon(once), "second application must be a pure no-op")
  }

  test("scd2: non-string extra history columns keep their type (null, not coerced)") {
    // An audit column OUTSIDE key/payload/validity must survive the merge
    // with its own dataType — new rows carry a typed null, and unionByName
    // must not widen the long column to string.
    val hist = Seq((1L, "A", 42L, "2000-01-01", null.asInstanceOf[String]))
      .toDF("k", "seg", "audit_id", "valid_from", "valid_to")
    val out = graft.ops.Upsert.scd2(hist, Seq((1L, "Z")).toDF("k", "seg"),
      "k", Seq("seg"), "2001-01-01")
    assert(out.schema("audit_id").dataType === org.apache.spark.sql.types.LongType)
    val byFrom = out.orderBy("valid_from").collect()
    assert(byFrom(0).getAs[Long]("audit_id") === 42L)   // closed row keeps value
    assert(byFrom(1).isNullAt(byFrom(1).fieldIndex("audit_id"))) // new row: typed null
  }

  test("asOfSnapshot: one row per key at every probe date; boundary day sees the new row") {
    val hist = Seq((1L, "A", "2000-01-01", null.asInstanceOf[String]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val v2 = graft.ops.Upsert.scd2(hist, Seq((1L, "B")).toDF("k", "seg"),
      "k", Seq("seg"), "2001-01-01")
    val v3 = graft.ops.Upsert.scd2(v2, Seq((1L, "C")).toDF("k", "seg"),
      "k", Seq("seg"), "2002-01-01")
    def at(d: String) = graft.ops.Upsert.asOfSnapshot(v3, d)
      .as[(Long, String)].collect().toSeq
    assert(at("2000-06-15") === Seq((1L, "A")))
    // Exactly AT an effective date: the new row, not the closed one.
    assert(at("2001-01-01") === Seq((1L, "B")))
    assert(at("2001-12-31") === Seq((1L, "B")))
    assert(at("2002-01-01") === Seq((1L, "C")))
    // Before the first validity: no row at all.
    assert(at("1999-12-31") === Seq.empty)
  }

  test("temporalJoin: exactly one dimension row per fact inside the lifetime; earlier facts drop") {
    val hist = Seq((1L, "A", "2000-01-01", null.asInstanceOf[String]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val v3 = graft.ops.Upsert.scd2(
      graft.ops.Upsert.scd2(hist, Seq((1L, "B")).toDF("k", "seg"),
        "k", Seq("seg"), "2001-01-01"),
      Seq((1L, "C")).toDF("k", "seg"), "k", Seq("seg"), "2002-01-01")
    val facts = Seq(
      (10L, 1L, "1999-06-01"),  // before first validity -> drops
      (11L, 1L, "2000-06-01"),  // A
      (12L, 1L, "2001-01-01"),  // boundary day -> B
      (13L, 1L, "2003-01-01"),  // C
      (14L, 2L, "2001-01-01"))  // unknown key -> drops
      .toDF("fid", "fk", "d")
    val out = graft.ops.Upsert.temporalJoin(facts, v3, "fk", "k", "d")
      .select("fid", "seg").as[(Long, String)].collect().toMap
    assert(out === Map(11L -> "A", 12L -> "B", 13L -> "C"))
  }

  test("applyCountSumDelta: groups appear, vanish at zero, and update deltas net out") {
    import org.apache.spark.sql.functions.{count => cnt}
    val v1 = Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 9.0))
      .toDF("id", "grp", "v")
    val v2 = Seq((1L, 10L, 6.0), (4L, 30L, 2.0))  // upd id1, del id2/id3, ins id4
      .toDF("id", "grp", "v")
    def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp")
      .agg(cnt(lit(1)).as("n"), sum(queries.money(col("v"))).as("total"))
    val cl = graft.ops.Upsert.snapshotDiffImages(v1, v2, Seq("id"))
      .select(coalesce(col("new_grp"), col("old_grp")).as("grp"), col("action"),
        queries.money(col("old_v")).as("old_p"), queries.money(col("new_v")).as("new_p"))
    val inc = graft.ops.Incremental.applyCountSumDelta(agg(v1), cl, "grp", "old_p", "new_p")
      .select(col("grp"), col("n"), col("total").cast("double"))
      .orderBy("grp").as[(Long, Long, Double)].collect().toSeq
    val full = agg(v2)
      .select(col("grp"), col("n"), col("total").cast("double"))
      .orderBy("grp").as[(Long, Long, Double)].collect().toSeq
    assert(inc === full)
    // Group 20 vanished entirely (count reached zero); group 30 is new.
    assert(inc.map(_._1) === Seq(10L, 30L))
  }

  test("applyCountSumDelta: NULL value images contribute 0, matching sum()'s NULL-skip") {
    import org.apache.spark.sql.functions.{count => cnt}
    // grp 10: v->NULL update (id1) + NULL->v update (id2);
    // grp 20: delete a valued row (id3) AND a NULL row (id5) -> vanishes;
    // grp 30: insert a NULL row (id4) alongside a valued one (id6).
    val v1 = Seq((1L, 10L, Some(5.0)), (2L, 10L, None), (3L, 20L, Some(9.0)),
      (5L, 20L, None: Option[Double])).toDF("id", "grp", "v")
    val v2 = Seq((1L, 10L, None), (2L, 10L, Some(4.0)), (4L, 30L, None),
      (6L, 30L, Some(2.0))).toDF("id", "grp", "v")
    def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp")
      .agg(cnt(lit(1)).as("n"), sum(queries.money(col("v"))).as("total"))
    val cl = graft.ops.Upsert.snapshotDiffImages(v1, v2, Seq("id"))
      .select(coalesce(col("new_grp"), col("old_grp")).as("grp"), col("action"),
        queries.money(col("old_v")).as("old_p"), queries.money(col("new_v")).as("new_p"))
    val inc = graft.ops.Incremental.applyCountSumDelta(agg(v1), cl, "grp", "old_p", "new_p")
      .select(col("grp"), col("n"), col("total").cast("double"))
      .orderBy("grp").as[(Long, Long, Double)].collect().toSeq
    val full = agg(v2)
      .select(col("grp"), col("n"), col("total").cast("double"))
      .orderBy("grp").as[(Long, Long, Double)].collect().toSeq
    // Before the 0-coalesce fix the grp-10 delta was NULL (silently
    // dropped by sum) and the total diverged from the recompute.
    assert(inc === full)
    assert(inc === Seq((10L, 2L, 4.0), (30L, 2L, 2.0)))
  }

  test("snapshotDiff: insert/delete/update classified; deletes carry the old image; NULL flips count") {
    val oldSnap = Seq(
      (1L, Some("a"), 10L),  // unchanged
      (2L, Some("b"), 20L),  // payload update
      (3L, Some("c"), 30L),  // deleted
      (4L, None: Option[String], 40L)) // NULL -> value update
      .toDF("k", "seg", "v")
    val newSnap = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 20L),
      (4L, Some("d"), 40L),
      (5L, Some("e"), 50L))  // inserted
      .toDF("k", "seg", "v")
    val d = graft.ops.Upsert.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .orderBy("k").as[(Long, String, Option[String], Long)].collect().toSeq
    assert(d === Seq(
      (2L, "update", Some("B"), 20L),
      (3L, "delete", Some("c"), 30L),  // the OLD image
      (4L, "update", Some("d"), 40L),
      (5L, "insert", Some("e"), 50L)))
    // includeUnchanged surfaces key 1 too; replaying the changelog via
    // upsert + delete reproduces the new snapshot exactly.
    val all = graft.ops.Upsert.snapshotDiff(oldSnap, newSnap, Seq("k"),
      includeUnchanged = true)
    assert(all.count() === 5)
    val applied = graft.ops.Upsert.upsert(
      oldSnap,
      d.filter(r => r._2 == "insert" || r._2 == "update")
        .map(r => (r._1, r._3, r._4)).toDF("k", "seg", "v"),
      Seq("k"))
      .join(d.filter(_._2 == "delete").map(r => Tuple1(r._1)).toDF("k"),
        Seq("k"), "left_anti")
    assert(applied.orderBy("k").collect().toSeq ===
      newSnap.orderBy("k").collect().toSeq)
  }
}
