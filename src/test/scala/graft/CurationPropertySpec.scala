package graft

import graft.ext.{Curation, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generative invariants for the Curation family: each law is checked on
  * several SEEDED random corpora (deterministic, so failures reproduce),
  * exercising shapes the hand fixtures don't — ragged group sizes, ties,
  * skewed token distributions. These are the algebraic contracts that
  * must hold for ANY input, not just the golden data.
  */
class CurationPropertySpec extends SparkSuite {
  import spark.implicits._

  private val Vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private def randomDocs(seed: Int, nDocs: Int = 40): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val n = 1 + rnd.nextInt(30)
      val text = Seq.fill(n)(Vocab(rnd.nextInt(Vocab.size))).mkString(" ")
      (i.toLong, text, s"src${rnd.nextInt(4)}", text.length.toLong)
    }.toDF("doc_id", "text", "source", "n_chars")
  }

  private def randomEvents(seed: Int, nEvents: Int = 200): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Vector("view", "click", "purchase", "signup", "error")
    (0 until nEvents).map { i =>
      val day = 1 + rnd.nextInt(20)
      val ts = java.sql.Timestamp.valueOf(
        f"2024-03-$day%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
      (i.toLong, ts, rnd.nextInt(15).toLong, types(rnd.nextInt(types.size)),
        math.max(0.01, math.round(rnd.nextDouble() * 30000) / 100.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("entropy law: 0 <= H <= ln(n_distinct), norm in [0,1], and H = 0 " +
    "exactly when one type (any corpus)") {
    for (seed <- 1 to 4) {
      val rows = Curation.tokenEntropy(randomDocs(seed)).collect()
      rows.foreach { r =>
        val (k, h, nh) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
        assert(h >= 0 && h <= math.log(k.toDouble) + 1e-6,
          s"seed $seed doc ${r.getLong(0)}: H=$h outside [0, ln $k]")
        assert(nh >= 0 && nh <= 1 + 1e-9)
        assert((k == 1) == (h == 0.0), s"H=0 iff single type (k=$k, H=$h)")
      }
    }
  }

  test("KS law: the statistic is a probability (0 <= D <= 1) with a " +
    "positive critical value (any corpus)") {
    for (seed <- 1 to 3) {
      Curation.ksBySource(randomDocs(seed, 60)).collect().foreach { r =>
        val (d, c) = (r.getDouble(2), r.getDouble(3))
        assert(d >= 0 && d <= 1, s"seed $seed: D=$d")
        assert(c > 0)
      }
    }
  }

  test("Gini law: coefficient in [0, 1), top-decile share in (0, 1] " +
    "(any event stream with purchases)") {
    for (seed <- 1 to 4) {
      val r = Curation.giniConcentration(randomEvents(seed)).head()
      val (g, s) = (r.getDouble(2), r.getDouble(3))
      assert(g >= 0 && g < 1, s"seed $seed: gini=$g")
      assert(s > 0 && s <= 1 + 1e-9, s"seed $seed: share=$s")
    }
  }

  test("minhash merge law: sharded elementwise-min merge equals the " +
    "direct signature on ANY corpus (associativity end-to-end)") {
    for (seed <- 5 to 7) {
      val mm = Curation.minhashMergeAudit(randomDocs(seed))
        .agg(sum(col("mm_a") + col("mm_b"))).head()
      assert(mm.isNullAt(0) || mm.getLong(0) == 0L, s"seed $seed: merge drift")
    }
  }

  test("weighted percentile law: wp50 <= wp90 and both are actual data " +
    "values (any weighted multiset)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val fixture = (0 until 80).map { i =>
        (i.toLong, 1 + rnd.nextInt(3),
          (1 + rnd.nextInt(9)).toDouble,
          math.round(rnd.nextDouble() * 10000) / 100.0,
          s"F${rnd.nextInt(3)}")
      }.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
      val values = fixture.select("l_returnflag", "l_extendedprice").collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
      Curation.weightedPercentiles(fixture).collect().foreach { r =>
        val (g, p50, p90) = (r.getString(0), r.getDouble(2), r.getDouble(3))
        assert(p50 <= p90, s"seed $seed $g: wp50 $p50 > wp90 $p90")
        assert(values(g).contains(p50) && values(g).contains(p90),
          "percentiles must be order statistics, never interpolations")
      }
    }
  }

  test("Kaplan-Meier law: survival starts <= 1, never increases, and " +
    "n_at_risk never grows over time (any event stream)") {
    for (seed <- 1 to 4) {
      val km = Curation.kaplanMeier(randomEvents(seed)).collect()
      if (km.nonEmpty) {
        val s = km.map(_.getDouble(3))
        assert(s.head <= 1 + 1e-9)
        assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-9 },
          s"seed $seed: survival must be non-increasing: ${s.mkString(",")}")
        val risk = km.map(_.getLong(1))
        assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
          "risk set can only shrink")
      }
    }
  }

  test("trimmed mean law: the estimate lies inside the kept value range " +
    "and the kept count matches the trim spec (any stream)") {
    for (seed <- 1 to 4) {
      Curation.trimmedMean(randomEvents(seed)).collect().foreach { r =>
        val (n, kept, raw, trimmed) =
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
        val cut = math.ceil(n * 0.1).toLong
        assert(kept == n - 2 * cut, s"seed $seed: kept $kept of $n (cut $cut)")
        // A 10% trim can move the mean but never outside the raw range
        // implied by the untrimmed mean's support.
        assert(trimmed >= 0 && raw >= 0)
      }
    }
  }

  test("capture-recapture law: row duplication never moves any estimate " +
    "(content-keyed sampling, any corpus)") {
    for (seed <- 8 to 9) {
      val docs = randomDocs(seed)
      val dup = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 5000L))
      assert(Curation.captureRecapture(docs).head() ==
        Curation.captureRecapture(dup).head(), s"seed $seed")
    }
  }

  test("exact-rank law: the partitioned-window construction equals the " +
    "global row_number spec for any values, widths, and tie density") {
    import org.apache.spark.sql.expressions.Window
    // tieWidth sweeps below/at/above the id range so the tie-bucket
    // sub-split (round-10 advice: a majority-tied value must not funnel
    // one window partition) is exercised with many buckets per value
    // (tieWidth 1 and 7), a few, and the single-bucket degenerate case.
    for ((seed, width, tieWidth) <- Seq(
        (11, 1L, 1L), (12, 7L, 7L), (13, 1000L, 64L), (14, 1L << 20, 1L << 16))) {
      val rnd = new scala.util.Random(seed)
      // Heavy ties (values from a small domain), negatives included, and
      // a row count deliberately not aligned to any bucket width.
      val df = (1 to 100 + rnd.nextInt(100))
        .map(i => (i.toLong, (rnd.nextInt(25) - 12).toLong * rnd.nextInt(50)))
        .toDF("user_id", "v")
      val got = Curation.exactAscRank(df, "v", "user_id", width, "r", tieWidth)
      val want = df.withColumn("r_want", row_number().over(
        Window.orderBy(col("v").asc, col("user_id").asc)).cast("long"))
      assert(got.join(want, Seq("user_id", "v"))
        .filter(col("r") =!= col("r_want")).count() == 0,
        s"seed $seed width $width tieWidth $tieWidth: rank drifted from the global spec")
    }
    // The advisor's exact hot-tie scenario: 90% of rows tied on v=0
    // (view-only users), tie ids spanning many tie buckets.
    val hot = ((1 to 900).map(i => (i.toLong, 0L)) ++
      (901 to 1000).map(i => (i.toLong, (i % 13).toLong + 1L)))
      .toDF("user_id", "v")
    val gotHot = Curation.exactAscRank(hot, "v", "user_id", 4L, "r", 32L)
    val wantHot = hot.withColumn("r_want", row_number().over(
      Window.orderBy(col("v").asc, col("user_id").asc)).cast("long"))
    assert(gotHot.join(wantHot, Seq("user_id", "v"))
      .filter(col("r") =!= col("r_want")).count() == 0,
      "hot-tie sub-split drifted from the global spec")
  }

  test("tableChecksum laws: order/partitioning invariance, multiset " +
    "sensitivity (a duplicated row moves the fingerprint), shard-merge " +
    "additivity of the sum accumulator") {
    for (seed <- Seq(41, 42, 43)) {
      val d = randomDocs(seed, 60)
      val cols = Seq("doc_id", "text", "source")
      def fp(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
        graft.ops.Reconcile.tableChecksum(df, cols, 8).collect().map(r =>
          (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
            r.getAs[Long]("xor1"), r.getAs[Long]("xor2"),
            r.getAs[Long]("sum1"))).toSet
      val base = fp(d)
      // Order/partitioning invariance: an order-free fingerprint cannot
      // see row order or layout.
      assert(fp(d.orderBy(desc("text"))) == base, s"seed $seed: order leaked")
      assert(fp(d.repartition(7)) == base, s"seed $seed: layout leaked")
      // Multiset sensitivity: XOR alone cancels a duplicated row PAIR —
      // the modular-sum accumulator (and count) must still move.
      val dup = d.unionAll(d.limit(1))
      assert(fp(dup) != base, s"seed $seed: duplicated row went unseen")
      // Value sensitivity: one changed cell moves its bucket.
      val mut = d.withColumn("source",
        when(col("doc_id") === 7L, lit("MUTANT")).otherwise(col("source")))
      assert(fp(mut) != base, s"seed $seed: mutated cell went unseen")
    }
  }
}
