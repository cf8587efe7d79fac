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
