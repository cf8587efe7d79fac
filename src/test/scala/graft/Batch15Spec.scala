package graft

import org.apache.spark.sql.functions._

/** Algebra pins for the round-15 reconciliation drill-down: rowDiff's
  * multiset semantics (multiplicity mismatches, not just presence),
  * the NULL-vs-empty-string canonicalization the fingerprint family
  * guarantees, the equal-tables fast path, and the feed-grain diff's
  * localization contract. Real-data paths stay oracle-gated
  * (x240/x241).
  */
class Batch15Spec extends SparkSuite {
  import spark.implicits._

  private def t(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "v")

  test("rowDiff: equal tables produce zero rows — the bucket set is " +
    "empty so no row-level work survives the semi-join") {
    val a = t((0L until 40L).map(i => (i, s"v$i")): _*)
    val d = graft.ops.Reconcile.rowDiff(a, a, Seq("id", "v"), nBuckets = 8)
    assert(d.count() == 0L)
  }

  test("rowDiff: a changed row emits both versions, sided; an a-only " +
    "row emits side a") {
    val a = t((0L until 30L).map(i => (i, s"v$i")): _*)
    val b = a.withColumn("v",
        when(col("id") === 7L, lit("CHANGED")).otherwise(col("v")))
      .filter(col("id") =!= 13L)
    val rows = graft.ops.Reconcile.rowDiff(a, b, Seq("id", "v"), nBuckets = 8)
      .collect().map(r => (r.getAs[String]("side"), r.getAs[Long]("id"),
        r.getAs[String]("v"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      .toSet
    assert(rows == Set(
      ("a", 7L, "v7", 1L, 0L),       // the original, only in a
      ("b", 7L, "CHANGED", 0L, 1L),  // the corruption, only in b
      ("a", 13L, "v13", 1L, 0L)))    // the deletion
  }

  test("rowDiff: multiset semantics — a duplicated row with differing " +
    "multiplicity is a diff even though both sides contain it") {
    val a = t((5L, "dup"), (5L, "dup"), (1L, "x"))
    val b = t((5L, "dup"), (1L, "x"))
    val rows = graft.ops.Reconcile.rowDiff(a, b, Seq("id", "v"), nBuckets = 4)
      .collect().map(r => (r.getAs[String]("side"), r.getAs[Long]("id"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    assert(rows.toSeq == Seq(("a", 5L, 2L, 1L)),
      "the surplus side is a, with both multiplicities reported")
  }

  test("rowDiff: NULL and empty string are different rows — the " +
    "sentinel canonicalization carries into the drill-down") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    val b = Seq((1L, "")).toDF("id", "v")
    val rows = graft.ops.Reconcile.rowDiff(a, b, Seq("id", "v"), nBuckets = 4)
      .collect().map(r => (r.getAs[String]("side"), r.getAs[String]("v")))
      .toSet
    assert(rows == Set(("a", null), ("b", "")),
      "(1, NULL) and (1, '') must not collide")
  }

  test("checksumIncremental: the base+delta fold equals the full " +
    "fingerprint bit for bit, for disjoint splits, duplicated rows, " +
    "and an empty delta") {
    val rows = (0L until 60L).map(i =>
      (i, if (i % 7 == 0) null else s"v${i % 13}")) // dup values + NULLs
    val all = rows.toDF("id", "v")
    val cols = Seq("id", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Reconcile.tableChecksum(df, cols, nBuckets = 8)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
    val base = all.filter(col("id") % 3 =!= 0L)
    val delta = all.filter(col("id") % 3 === 0L)
    assert(graft.ops.Reconcile.checksumIncremental(base, delta, cols, 8)
      .collect().map(_.toSeq).toSeq === fp(all),
      "fold of a disjoint split must equal the full fingerprint")
    // Multiset semantics: folding the SAME rows again must equal the
    // fingerprint of the doubled table, not collapse to the original.
    assert(graft.ops.Reconcile.checksumIncremental(all, all, cols, 8)
      .collect().map(_.toSeq).toSeq === fp(all.unionByName(all)),
      "the fold is multiset addition, not set union")
    assert(graft.ops.Reconcile.checksumIncremental(all, all.limit(0), cols, 8)
      .collect().map(_.toSeq).toSeq === fp(all),
      "an empty delta is the identity of the fold")
  }

  test("mgMergeAudit: the merged summary obeys every Agarwal-et-al " +
    "bound on a skewed stream that genuinely compresses") {
    // 3 heavy tokens (spread across all shards) + a long tail: with
    // k=4 counters every shard must evict, so eps_budget > 0 and the
    // audit exercises real compression, not the degenerate exact case.
    val docs = (0L until 64L).map { i =>
      val heavy = s"h${i % 3} " * 6
      val tail = s"t${i % 29} u${(i * 7) % 31}"
      (i, s"s${i % 2}", heavy + tail)
    }.toDF("doc_id", "source", "text")
    val r = graft.ext.Frequent.mgMergeAudit(docs, nShards = 4, k = 4)
      .collect()(0)
    assert(r.getAs[Long]("eps_budget") > 0L,
      "the fixture must force real compression")
    assert(r.getAs[Boolean]("eps_within_bound"),
      "sum of per-shard s_(k+1) must obey the N/(k+1) pigeonhole")
    assert(r.getAs[Long]("n_bound_violations") == 0L,
      "every merged estimate must sit in [exact - eps, exact]")
    assert(r.getAs[Long]("n_missed_heavy") == 0L,
      "any token heavier than the error budget must survive the merge")
    assert(r.getAs[Long]("n_summary") <= 4L * 4L,
      "the merged summary is nShards*k-bounded")
    assert(r.getAs[Long]("max_underestimate") <= r.getAs[Long]("eps_budget"))
  }

  test("reserved-name guard: rowDiff and applyRepair fail fast with a " +
    "real message when a payload column collides with an internal name") {
    val a = t((1L, "x"))
    val bad = a.withColumnRenamed("v", "bucket")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Reconcile.rowDiff(bad, bad, Seq("id", "bucket"))
    }
    assert(e.getMessage.contains("bucket"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Reconcile.applyRepair(bad,
        a.select(col("id"), col("v"), lit(1L).as("n_a"), lit(0L).as("n_b")),
        Seq("id", "n_a"))
    }
    assert(e2.getMessage.contains("n_a"))
  }

  test("checksumDiffByGroup: divergence localizes to the corrupted " +
    "group only; NULL group keys reconcile null-safely") {
    val a = Seq((1L, "f1", "x"), (2L, "f1", "y"), (3L, "f2", "z"),
      (4L, null.asInstanceOf[String], "w")).toDF("id", "src", "v")
    val b = a.withColumn("v",
      when(col("id") === 3L, lit("ZAPPED")).otherwise(col("v")))
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Reconcile.tableChecksumByGroup(df, "src", Seq("id", "v"),
        nBuckets = 4)
    val d = graft.ops.Reconcile.checksumDiffByGroup(fp(a), fp(b), "src")
      .collect()
    val bySrc = d.groupBy(r => Option(r.getAs[String]("src")))
    assert(bySrc(Some("f1")).forall(_.getAs[Boolean]("bucket_match")),
      "untouched feed f1 must be all-green")
    assert(bySrc(None).forall(_.getAs[Boolean]("bucket_match")),
      "the NULL-keyed feed must match itself, not vanish into 3VL")
    assert(bySrc(Some("f2")).exists(!_.getAs[Boolean]("bucket_match")),
      "the corrupted feed must carry the mismatch")
    assert(d.forall(r => !r.isNullAt(r.fieldIndex("bucket_match"))),
      "verdicts are 3VL-safe: never NULL")
  }
}
