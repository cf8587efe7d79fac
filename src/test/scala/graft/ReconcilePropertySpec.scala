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
