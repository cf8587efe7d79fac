package graft

import graft.ops.Reconcile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generative invariants for the reconciliation family: each law is
  * checked on SEEDED random row multisets (deterministic, so failures
  * reproduce), exercising shapes the hand fixtures don't — duplicate
  * rows with random multiplicities, NULL-heavy columns, random
  * insert/delete/mutate corruption. These are the algebraic contracts
  * that must hold for ANY pair of tables, not just the golden
  * corrupted-copy scenario.
  */
class ReconcilePropertySpec extends SparkSuite {
  import spark.implicits._

  private val Cols = Seq("id", "grp", "v")

  /** Random multiset of rows: duplicate keys on purpose (multiplicity
    * up to 3), NULLs in both payload columns. */
  private def randomRows(seed: Int, n: Int = 50): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).flatMap { i =>
      val row = (i.toLong % 37,
        if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(4)}",
        if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(20)}")
      Seq.fill(1 + rnd.nextInt(3))(row)
    }
  }

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("id", "grp", "v")

  /** Exact multiset symmetric difference, computed naively on the
    * driver — the oracle rowDiff must reproduce distributed-side. */
  private def naiveDiff(a: Seq[(Long, String, String)],
      b: Seq[(Long, String, String)]): Map[(Long, String, String), (Long, Long)] = {
    val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (ca.keySet ++ cb.keySet).iterator
      .map(k => k -> ((ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))))
      .filter { case (_, (na, nb)) => na != nb }
      .toMap
  }

  test("rowDiff law: for ANY two random multisets, the emitted rows are " +
    "exactly the multiset symmetric difference with true multiplicities") {
    for (seed <- 1 to 4) {
      val a = randomRows(seed)
      val b = randomRows(seed + 100)
      val got = Reconcile.rowDiff(df(a), df(b), Cols, nBuckets = 8)
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"),
          r.getAs[String]("v")) -> ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))))
        .toMap
      assert(got === naiveDiff(a, b), s"seed $seed: rowDiff != naive diff")
    }
  }

  test("rowDiff law: side always names the surplus holder, and a " +
    "self-diff is empty for any multiset") {
    for (seed <- 5 to 7) {
      val a = randomRows(seed)
      assert(Reconcile.rowDiff(df(a), df(a), Cols, nBuckets = 8).count() == 0L)
      val b = randomRows(seed + 100)
      Reconcile.rowDiff(df(a), df(b), Cols, nBuckets = 8).collect().foreach { r =>
        val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
        assert(r.getAs[String]("side") == (if (na > nb) "a" else "b"))
        assert(na != nb)
      }
    }
  }

  test("checksum law: the diff is all-green iff the multisets are equal " +
    "— equality is order- and partitioning-blind, any corruption flips " +
    "at least one bucket") {
    for (seed <- 8 to 11) {
      val rnd = new scala.util.Random(seed)
      val a = randomRows(seed)
      // Same multiset, shuffled order and different partitioning.
      val sameFp = Reconcile.tableChecksum(
        df(rnd.shuffle(a)).repartition(7), Cols, 8)
      val diff0 = Reconcile.checksumDiff(
        Reconcile.tableChecksum(df(a), Cols, 8), sameFp).collect()
      assert(diff0.forall(_.getAs[Boolean]("bucket_match")),
        s"seed $seed: equal multisets must fingerprint identically")
      // Random single corruption: mutate, drop, or duplicate one row.
      val idx = rnd.nextInt(a.size)
      val b = rnd.nextInt(3) match {
        case 0 => a.updated(idx, (a(idx)._1, a(idx)._2, "MUTATED"))
        case 1 => a.patch(idx, Nil, 1)
        case 2 => a :+ a(idx)
      }
      val diff1 = Reconcile.checksumDiff(
        Reconcile.tableChecksum(df(a), Cols, 8),
        Reconcile.tableChecksum(df(b), Cols, 8)).collect()
      assert(diff1.exists(!_.getAs[Boolean]("bucket_match")),
        s"seed $seed: a corrupted copy must flip at least one bucket")
    }
  }

  test("repair law: applyRepair(B, rowDiff(A, B)) is multiset-equal to " +
    "A for ANY two random multisets — the loop closes exactly") {
    for (seed <- 16 to 19) {
      val a = randomRows(seed)
      val b = randomRows(seed + 100)
      val diff = Reconcile.rowDiff(df(a), df(b), Cols, nBuckets = 8)
      val repaired = Reconcile.applyRepair(df(b), diff, Cols)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"),
          r.getAs[String]("v"))).sortBy(t => (t._1, s"${t._2}", s"${t._3}"))
      val want = a.sortBy(t => (t._1, s"${t._2}", s"${t._3}"))
      assert(repaired.toSeq === want, s"seed $seed: repair != reference")
      // And the repaired side must now fingerprint green.
      val verdict = Reconcile.checksumDiff(
        Reconcile.tableChecksum(df(a), Cols, 8),
        Reconcile.tableChecksum(Reconcile.applyRepair(df(b), diff, Cols),
          Cols, 8)).collect()
      assert(verdict.forall(_.getAs[Boolean]("bucket_match")))
    }
  }

  test("fixedPoint law: round-half-up onto the 10^-scale grid, NULL " +
    "passes through, and non-finite or envelope-breaking values raise") {
    val vals: Seq[java.lang.Double] = Seq(1.005, -1.005, 0.0, -0.0,
      2.675, 1234.56, -99.994, -99.995, null)
    val got = vals.toDF("x")
      .select(Reconcile.fixedPoint(col("x"), 2).as("fp"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val want = vals.map {
      case null => null
      case d    => math.floor(d * 100.0 + 0.5).toLong
    }
    assert(got.toSeq === want,
      "the snap must be floor(x*10^s + 0.5) — bit-deterministic, not " +
        "engine-native rounding")
    // NaN / Inf have no grid cell: loud failure, never a silent NULL
    // (which would collide with genuine NULLs in the fingerprint).
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      val e = intercept[Exception] {
        Seq(bad).toDF("x").select(Reconcile.fixedPoint(col("x"), 2))
          .collect()
      }
      assert(e.getMessage.contains("non-finite"), s"for $bad")
    }
    // Past the BIGINT envelope Spark's double->long would saturate
    // silently while DuckDB errors — so the Spark side must raise too.
    val e2 = intercept[Exception] {
      Seq(1.0e18).toDF("x").select(Reconcile.fixedPoint(col("x"), 2))
        .collect()
    }
    assert(e2.getMessage.contains("BIGINT envelope"))
    intercept[IllegalArgumentException](Reconcile.fixedPoint(col("x"), 10))
    intercept[IllegalArgumentException](Reconcile.fixedPointSql("x", -1))
  }

  test("epochMicros law: the canonical instant is the epoch integer — " +
    "NULL passes through, a known instant lands on its exact " +
    "microsecond count, and TIMESTAMP_NTZ inputs are accepted under " +
    "the UTC-session convention") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123456")
    val got = Seq(Some(ts), None).toDF("t")
      .select(Reconcile.epochMicros(col("t")).as("us"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // 2024-01-01T00:00:00Z = 1704067200 s (the DuckDB epoch_us twin
    // returns the same integer for the same naive value).
    assert(got.toSeq === Seq(1704067200123456L, null))
    val ntz = Seq(Some(ts), None).toDF("t")
      .select(col("t").cast("timestamp_ntz").as("t"))
      .select(Reconcile.epochMicros(col("t")).as("us"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(ntz.toSeq === Seq(1704067200123456L, null),
      "NTZ wall-clocks read in the UTC session = epoch_us's reading")
  }

  test("column discipline is enforced, not documented: a raw FLOAT/" +
    "DOUBLE column is rejected at every fingerprint entry point, and " +
    "the fixedPoint canonicalization is accepted") {
    val d = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "score")
    val withFp = d.select(col("id"),
      Reconcile.fixedPoint(col("score"), 6).as("score_fp"))
    for (call <- Seq[() => Any](
        () => Reconcile.tableChecksum(d, Seq("id", "score"), 8),
        () => Reconcile.tableChecksumByGroup(d, "id", Seq("score"), 8),
        // A float GROUP KEY is rejected too: it is never hashed, but it
        // IS emitted as an output value the comparison layer renders
        // per engine (the same divergence, one layer up).
        () => Reconcile.tableChecksumByGroup(d, "score", Seq("id"), 8),
        () => Reconcile.checksumDiffByGroup(
          d.withColumnRenamed("score", "g"),
          d.withColumnRenamed("score", "g"), "g"),
        () => Reconcile.rowDiff(d, d, Seq("id", "score"), 8),
        () => Reconcile.applyRepair(d,
          Reconcile.rowDiff(withFp, withFp, Seq("id", "score_fp"), 8),
          Seq("id", "score")))) {
      val e = intercept[IllegalArgumentException](call())
      assert(e.getMessage.contains("fixedPoint"),
        "the rejection must name the fix")
    }
    // The canonicalized spelling goes straight through.
    assert(Reconcile.tableChecksum(withFp, Seq("id", "score_fp"), 8)
      .count() > 0)
    // Containers must not smuggle floats past the guard: ARRAY<DOUBLE>
    // and a struct with a float field render engine-dependently too.
    val arr = Seq((1L, Seq(0.5, 1.5))).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException](
      Reconcile.tableChecksum(arr, Seq("id", "vec"), 8))
    assert(e1.getMessage.contains("vec"))
    val st = Seq((1L, (0.5f, "a"))).toDF("id", "s")
    val e2 = intercept[IllegalArgumentException](
      Reconcile.tableChecksum(st, Seq("id", "s"), 8))
    assert(e2.getMessage.contains("s"))
  }

  test("rowDiffByKey law: keyed insert/delete/update classification " +
    "matches the naive driver-side diff, NULL keys pair null-safely, " +
    "and changed_columns names exactly the differing payload columns") {
    // Reference side a: keys 0..39 (+ a NULL key), payload (grp, v)
    // with NULLs sprinkled in.
    def payload(k: Long) =
      (if (k % 13 == 0) null else s"g${k % 4}",
        if (k % 11 == 0) null else s"v$k")
    val aRows = (0L until 40L).map(k => (Option(k), payload(k)._1, payload(k)._2)) :+
      ((Option.empty[Long], "gN", "vN"))
    // Divergent side b: keys %7==0 missing (-> insert), extra keys
    // 100..102 (-> delete), v mutated for %5==1, grp AND v mutated for
    // %9==4 (incl. NULL->value and value->NULL flips), NULL key's
    // payload mutated (-> the NULL key must classify as update).
    val bRows = aRows.flatMap {
      case (Some(k), _, _) if k % 7 == 0 => Nil
      case (Some(k), g, v) if k % 5 == 1 => Seq((Option(k), g, s"MUT$k"))
      case (Some(k), _, _) if k % 9 == 4 => Seq((Option(k), "MUTG", s"MUTV$k"))
      case (None, g, _)                  => Seq((Option.empty[Long], g, "MUTN"))
      case r                             => Seq(r)
    } ++ Seq((Option(100L), "gX", "vX"), (Option(101L), null, null),
      (Option(102L), "gY", null))
    def kdf(rows: Seq[(Option[Long], String, String)]) =
      rows.map(r => (r._1.map(Long.box).orNull, r._2, r._3))
        .toDF("id", "grp", "v")
    val got = Reconcile.rowDiffByKey(kdf(aRows), kdf(bRows),
        Seq("id"), Seq("grp", "v"), nBuckets = 8)
      .collect()
      .map(r => (Option(r.getAs[java.lang.Long]("id")).map(_.toLong),
        r.getAs[String]("verdict"), r.getAs[String]("changed_columns")))
      .toSet
    val am = aRows.map(r => r._1 -> ((r._2, r._3))).toMap
    val bm = bRows.map(r => r._1 -> ((r._2, r._3))).toMap
    val want = (am.keySet ++ bm.keySet).flatMap { k =>
      (am.get(k), bm.get(k)) match {
        case (Some(_), None) => Some((k, "insert", null: String))
        case (None, Some(_)) => Some((k, "delete", null: String))
        case (Some(pa), Some(pb)) if pa != pb =>
          val changed = Seq("grp" -> (pa._1 != pb._1), "v" -> (pa._2 != pb._2))
            .collect { case (c, true) => c }.mkString(",")
          Some((k, "update", changed))
        case _ => None
      }
    }
    assert(got === want, "classification must equal the naive keyed diff")
    assert(got.exists(_._1.isEmpty), "the NULL key must classify")
    assert(got.exists(t => t._2 == "update" && t._3 == "grp,v"),
      "a both-columns mutation must list both, in cols order")
    // Equal tables classify to nothing, with zero row-level work.
    assert(Reconcile.rowDiffByKey(kdf(aRows), kdf(aRows),
      Seq("id"), Seq("grp", "v"), nBuckets = 8).count() === 0L)
  }

  test("applyChangelog law: executing the changelog reproduces the " +
    "reference side exactly, agrees with the applyRepair write path, " +
    "and the changelog is the verdict table plus the new row images") {
    // The same keyed divergence shapes as the classification law:
    // inserts (keys missing from b), deletes (extra keys in b), updates
    // (payload mutations incl. NULL flips), and a NULL key.
    def payload(k: Long) =
      (if (k % 13 == 0) null else s"g${k % 4}",
        if (k % 11 == 0) null else s"v$k")
    val aRows = (0L until 40L).map(k =>
      (Option(k), payload(k)._1, payload(k)._2)) :+
      ((Option.empty[Long], "gN", "vN"))
    val bRows = aRows.flatMap {
      case (Some(k), _, _) if k % 7 == 0 => Nil
      case (Some(k), g, v) if k % 5 == 1 => Seq((Option(k), g, s"MUT$k"))
      case (Some(k), _, _) if k % 9 == 4 => Seq((Option(k), "MUTG", s"MUTV$k"))
      case (None, g, _)                  => Seq((Option.empty[Long], g, "MUTN"))
      case r                             => Seq(r)
    } ++ Seq((Option(100L), "gX", "vX"), (Option(101L), null, null),
      (Option(102L), "gY", null))
    def kdf(rows: Seq[(Option[Long], String, String)]) =
      rows.map(r => (r._1.map(Long.box).orNull, r._2, r._3))
        .toDF("id", "grp", "v")
    val (keys, cols) = (Seq("id"), Seq("grp", "v"))
    val a = kdf(aRows)
    val b = kdf(bRows)
    val cl = Reconcile.changelog(a, b, keys, cols, nBuckets = 8)
    // The changelog IS rowDiffByKey plus the reference-side images:
    // same keys/verdicts/changed_columns (the shared classification),
    // a-side payload on inserts/updates, NULLs on deletes.
    val clRows = cl.collect()
    val verdictOnly = clRows.map(r => (r.getAs[java.lang.Long]("id"),
      r.getAs[String]("verdict"), r.getAs[String]("changed_columns"))).toSet
    val fromRdbk = Reconcile.rowDiffByKey(a, b, keys, cols, nBuckets = 8)
      .collect().map(r => (r.getAs[java.lang.Long]("id"),
        r.getAs[String]("verdict"), r.getAs[String]("changed_columns"))).toSet
    assert(verdictOnly === fromRdbk,
      "changelog must never fork from rowDiffByKey's classification")
    val am = aRows.map(r => (r._1.map(Long.box).orNull, (r._2, r._3))).toMap
    clRows.foreach { r =>
      val img = (r.getAs[String]("grp"), r.getAs[String]("v"))
      if (r.getAs[String]("verdict") == "delete")
        assert(img == ((null, null)), "deletes carry no image")
      else
        assert(img == am(r.getAs[java.lang.Long]("id")),
          "insert/update images are the reference side's row")
    }
    // Executing the changelog reproduces the reference side exactly...
    def multiset(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[java.lang.Long]("id"),
        r.getAs[String]("grp"), r.getAs[String]("v")))
        .groupBy(identity).view.mapValues(_.length).toMap
    val applied = Reconcile.applyChangelog(b, cl, keys, cols)
    assert(multiset(applied) === multiset(a),
      "applyChangelog(b, changelog(a, b)) must equal a")
    // ...and agrees with the multiset write path on the same scenario.
    val repaired = Reconcile.applyRepair(b,
      Reconcile.rowDiff(a, b, keys ++ cols, 8), keys ++ cols)
    assert(multiset(applied) === multiset(repaired),
      "the keyed and multiset write paths must converge")
    // An empty changelog applies to the identity.
    val idApplied = Reconcile.applyChangelog(a,
      Reconcile.changelog(a, a, keys, cols, nBuckets = 8), keys, cols)
    assert(multiset(idApplied) === multiset(a))
  }

  test("applyChangelog generative law: for ANY pair of random KEYED " +
    "tables, executing the changelog reproduces the reference exactly " +
    "and converges with the applyRepair write path") {
    // Keyed variant of randomRows: unique keys per side (the
    // changelog's contract), random missing keys, random payload
    // mutations incl. NULL flips, random extra keys.
    def keyedRows(seed: Int): Seq[(Long, String, String)] = {
      val rnd = new scala.util.Random(seed)
      (0L until 40L).flatMap { k =>
        if (rnd.nextInt(6) == 0) Nil // this side lacks the key
        else Seq((k,
          if (rnd.nextInt(8) == 0) null else s"g${rnd.nextInt(4)}",
          if (rnd.nextInt(8) == 0) null else s"v${rnd.nextInt(20)}"))
      } ++ (0 until rnd.nextInt(4)).map(i =>
        (1000L + seed * 10 + i, s"gx$i", s"vx$i"))
    }
    def multiset(d: DataFrame) =
      d.collect().map(r => (r.getAs[java.lang.Long]("id"),
        r.getAs[String]("grp"), r.getAs[String]("v")))
        .groupBy(identity).view.mapValues(_.length).toMap
    for (seed <- 21 to 24) {
      val a = df(keyedRows(seed))
      val b = df(keyedRows(seed + 100))
      val cl = Reconcile.changelog(a, b, Seq("id"), Seq("grp", "v"),
        nBuckets = 8)
      val applied = Reconcile.applyChangelog(b, cl, Seq("id"), Seq("grp", "v"))
      assert(multiset(applied) === multiset(a),
        s"seed $seed: applyChangelog(b, changelog(a, b)) != a")
      val repaired = Reconcile.applyRepair(b,
        Reconcile.rowDiff(a, b, Cols, 8), Cols)
      assert(multiset(applied) === multiset(repaired),
        s"seed $seed: keyed and multiset write paths diverge")
    }
  }

  test("rowDiffByKey law: a key holding more than one differing row on " +
    "a side is a primary-key violation — loud failure, never a wrong " +
    "changelog") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    // Key 1 appears twice in b with two DIFFERENT payloads: pairing is
    // ambiguous, so classification must refuse.
    val b = Seq((1L, "p"), (1L, "q"), (2L, "y")).toDF("id", "v")
    val e = intercept[Exception] {
      Reconcile.rowDiffByKey(a, b, Seq("id"), Seq("v"), nBuckets = 8)
        .collect()
    }
    assert(e.getMessage.contains("primary"),
      "the failure must say WHY: keyCols are not a primary key")
    // The sneakier violation: the SAME bytes at different multiplicities
    // (once in a, twice in b) emit a single diff row with n_a+n_b = 3 —
    // invisible to the per-side dup window — which would masquerade as
    // a clean delete. Must raise, not classify.
    val b2 = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("id", "v")
    val e2 = intercept[Exception] {
      Reconcile.rowDiffByKey(a, b2, Seq("id"), Seq("v"), nBuckets = 8)
        .collect()
    }
    assert(e2.getMessage.contains("multiplicity"),
      "a multiplicity violation must raise too")
  }

  test("incremental law: fold(fingerprint(A), fingerprint(B)) equals " +
    "fingerprint(A ++ B) for ANY split, including overlapping multisets") {
    for (seed <- 12 to 15) {
      val a = randomRows(seed)
      val b = randomRows(seed + 50)
      val folded = Reconcile.checksumIncremental(df(a), df(b), Cols, 8)
        .collect().map(_.toSeq).toSeq
      val full = Reconcile.tableChecksum(df(a ++ b), Cols, 8)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(folded === full, s"seed $seed: fold != full recompute")
    }
  }
}
