package graft

import graft.ext.Curation
import graft.io.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic contracts for the ext.Curation batch (x172–x178): each test
  * pins a property a correct implementation cannot fail — planted
  * fixtures for the detectors, algebraic identities for the sketches —
  * rather than re-running the oracle comparison the gate already does.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables(spark, Sf).documents
  private def events = Tables(spark, Sf).events
  private def embeddings = Tables(spark, Sf).embeddings

  // ------------------------------------------------------------------ DSIR

  test("x172 DSIR: target-source docs score strictly higher on average, " +
    "and the selection cut is exactly ceil(topFrac * n)") {
    val w = Curation.dsirWeights(docs, "src0").join(
      docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val avg = w.groupBy(col("source") === "src0")
      .agg(org.apache.spark.sql.functions.avg(col("logw_fp")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"target docs must score higher: target=${avg(true)} rest=${avg(false)}")
    val nSel = w.filter(col("selected")).count()
    val n = w.count()
    assert(nSel == math.ceil(0.2 * n).toLong)
  }

  // --------------------------------------------------------------- entropy

  test("x173 entropy: uniform distinct tokens give ln(k); constant doc gives 0") {
    val fixture = Seq(
      (1L, "a b c d"),       // 4 distinct, uniform -> H = ln 4
      (2L, "a a a a"),       // constant -> H = 0
      (3L, "a a b b")        // 2 distinct, uniform -> H = ln 2
    ).toDF("doc_id", "text")
    val r = Curation.tokenEntropy(fixture).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(math.abs(r(1L).getDouble(3) - math.log(4)) < 1e-6)
    assert(math.abs(r(1L).getDouble(4) - 1.0) < 1e-6)
    assert(r(2L).getDouble(3) == 0.0 && r(2L).getDouble(4) == 0.0)
    assert(math.abs(r(3L).getDouble(3) - math.log(2)) < 1e-6)
    assert(math.abs(r(3L).getDouble(4) - 1.0) < 1e-6)
  }

  test("x173 entropy: a repetitive doc scores strictly below a diverse doc " +
    "of the same length") {
    val real = Curation.tokenEntropy(docs)
    val fixture = Seq((900001L, Seq.fill(40)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val spamEnt = Curation.tokenEntropy(fixture).head().getDouble(3)
    val minReal = real.agg(min(col("entropy"))).head().getDouble(0)
    assert(spamEnt == 0.0 && minReal > spamEnt)
  }

  // -------------------------------------------------------------- SemDeDup

  test("x174 SemDeDup: an exact duplicate vector is dropped (keep-first), " +
    "and per-cell counts are conserved") {
    // Duplicate vec 0 under a fresh high id: cosine(dup, orig) = 1 >= tau,
    // same cell by construction, larger id -> must be the dropped one.
    val dup = embeddings.filter(col("vec_id") === 0L)
      .select(lit(900000L).as("vec_id"), col("embedding"), col("label"))
    val aug = embeddings.unionByName(dup)
    val base = Curation.semanticDedup(embeddings, tau = 0.4)
    val withDup = Curation.semanticDedup(aug, tau = 0.4)
    val totBase = base.agg(sum("n_vecs"), sum("n_dropped")).head()
    val totDup = withDup.agg(sum("n_vecs"), sum("n_dropped")).head()
    assert(totDup.getLong(0) == totBase.getLong(0) + 1)
    assert(totDup.getLong(1) == totBase.getLong(1) + 1,
      "the planted duplicate must be dropped")
    // Retention is n_kept/n_vecs on every row.
    val bad = withDup.filter(
      abs(col("retention") - round((col("n_vecs") - col("n_dropped"))
        .cast("double") / col("n_vecs").cast("double"), 6)) > lit(1e-9)).count()
    assert(bad == 0)
  }

  // ------------------------------------------------------ MinHash merging

  test("x175 merge audit: sharded-then-merged signatures equal direct ones " +
    "(zero mismatches) and the k=16 estimator tracks exact Jaccard") {
    val r = Curation.minhashMergeAudit(docs)
    assert(r.agg(sum(col("mm_a") + col("mm_b"))).head().getLong(0) == 0L,
      "elementwise-min merge must reproduce the direct signature exactly")
    // k=16 one-permutation estimate: stderr <= sqrt(J(1-J)/16) <= 0.125;
    // assert the MEAN abs error is inside two stderr and no pair is
    // wildly off (5 sigma).
    val stats = r.agg(avg(col("abs_err")), max(col("abs_err"))).head()
    assert(stats.getDouble(0) < 0.25, s"mean abs_err ${stats.getDouble(0)}")
    assert(stats.getDouble(1) < 0.65, s"max abs_err ${stats.getDouble(1)}")
  }

  // ------------------------------------------------------------------- DP

  test("x176 DP histogram: noise is bounded by the mechanism's support and " +
    "noisy = true + noise exactly") {
    val r = Curation.dpNoisyCounts(events).collect()
    r.foreach { row =>
      val (t, noise, noisy) =
        (row.getLong(1), row.getDouble(2), row.getDouble(3))
      // u on the (r+0.5)/1e6 grid -> |noise| <= ln(1e6) ~ 13.82 at eps=1.
      assert(math.abs(noise) <= math.log(1e6) + 1e-9)
      assert(math.abs(noisy - (t + noise)) < 1e-6)
      assert(row.getDouble(4) == 1.0)
    }
    // Derandomized noise must not be constant across buckets.
    assert(r.map(_.getDouble(2)).distinct.length > 1)
  }

  // ----------------------------------------------------------- changepoint

  test("x177 CUSUM: a planted mean shift is located at the true day") {
    // 10 days at 5 events/day then 10 days at 50/day, shift after day 10.
    val rows = (0 until 20).flatMap { d =>
      val n = if (d < 10) 5 else 50
      (0 until n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"),
        i.toLong, "evt", 1.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cp = Curation.changepoint(ev).head()
    // |C_d| peaks at the last day of the low regime.
    assert(cp.getString(0) == "2024-03-10")
    assert(cp.getLong(1) == 20L)
    assert(cp.getDouble(3) == 5.0, "mean before the shift")
    assert(cp.getDouble(4) == 50.0, "mean after the shift")
  }

  test("x177 CUSUM: constant series degenerates to the earliest day with " +
    "zero deviation") {
    val rows = (0 until 5).flatMap { d =>
      (0 until 7).map(i => (d.toLong * 100 + i,
        java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 01:00:00"),
        i.toLong, "evt", 1.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cp = Curation.changepoint(ev).head()
    assert(cp.getString(0) == "2024-03-01" && cp.getDouble(2) == 0.0)
  }

  // -------------------------------------------------------------- outliers

  test("x174 SemDeDup cellCap: a cell wider than the cap is excluded from " +
    "pruning and reported unpruned") {
    // 30 copies of vector 0 under fresh ids overflow a cellCap of 8:
    // that cell must report within_cap = false with NULL drop stats
    // (unknown — not "fully retained"), while a small cap-respecting run
    // on the same data does drop.
    val dup = (1 to 30).map(i => embeddings.filter(col("vec_id") === 0L)
      .select(lit(900000L + i).as("vec_id"), col("embedding"), col("label")))
      .reduce(_ unionByName _)
    val aug = embeddings.unionByName(dup)
    val capped = Curation.semanticDedup(aug, tau = 0.4, cellCap = 8)
    val hot = capped.filter(!col("within_cap"))
    assert(hot.count() >= 1, "the flooded cell must be flagged")
    assert(hot.filter(col("n_dropped").isNotNull
      || col("retention").isNotNull).count() == 0,
      "capped-out cells must report null drop stats, never retention=1.0")
    val uncapped = Curation.semanticDedup(aug, tau = 0.4, cellCap = 256)
    assert(uncapped.agg(sum("n_dropped")).head().getLong(0) >= 30,
      "with room under the cap the duplicates do get dropped")
  }

  // ------------------------------------------------------------------- KS

  test("x179 KS: disjoint supports give D = 1 and flag; identical " +
    "distributions give D = 0 and pass") {
    // Fixture 1: two sources over the SAME value multiset -> D = 0.
    val same = ((0 until 50).map(i => (i.toLong, "sameA", 100L + (i % 10))) ++
      (50 until 100).map(i => (i.toLong, "sameB", 100L + (i % 10))))
      .toDF("doc_id", "source", "n_chars")
    val rSame = Curation.ksBySource(same).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(rSame("sameA").getDouble(2) == 0.0 && !rSame("sameA").getBoolean(4))
    assert(rSame("sameB").getDouble(2) == 0.0 && !rSame("sameB").getBoolean(4))
    // Fixture 2: disjoint supports -> D = 1 for both sides, significant.
    val split = ((0 until 50).map(i => (i.toLong, "low", 100L + (i % 10))) ++
      (50 until 100).map(i => (i.toLong, "high", 2000L + (i % 10))))
      .toDF("doc_id", "source", "n_chars")
    val rSplit = Curation.ksBySource(split).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(rSplit("low").getDouble(2) == 1.0 && rSplit("low").getBoolean(4))
    assert(rSplit("high").getDouble(2) == 1.0 && rSplit("high").getBoolean(4))
  }

  // ------------------------------------------------------------------- KM

  test("x180 KM: hand-computed survival on a planted cohort") {
    // 4 users, first events on day 0. A converts day 1, B day 2, C and D
    // never (censored at the horizon, day 3).
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d $hour%02d:00:00")
    val rows = Seq(
      (1L, ts(0, 1), 1L, "signup", 1.0, "{}"), (2L, ts(1, 1), 1L, "purchase", 1.0, "{}"),
      (3L, ts(0, 1), 2L, "signup", 1.0, "{}"), (4L, ts(2, 1), 2L, "purchase", 1.0, "{}"),
      (5L, ts(0, 1), 3L, "signup", 1.0, "{}"), (6L, ts(3, 1), 3L, "view", 1.0, "{}"),
      (7L, ts(0, 1), 4L, "signup", 1.0, "{}"), (8L, ts(3, 1), 4L, "click", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val km = Curation.kaplanMeier(ev).collect()
    // Event durations: day 1 (A, 4 at risk -> S = 3/4), day 2 (B, 3 at
    // risk -> S = 3/4 * 2/3 = 1/2). Censored users never appear as rows.
    assert(km.length == 2)
    assert(km(0).getLong(0) == 1L && km(0).getLong(1) == 4L
      && km(0).getLong(2) == 1L && math.abs(km(0).getDouble(3) - 0.75) < 1e-6)
    assert(km(1).getLong(0) == 2L && km(1).getLong(1) == 3L
      && math.abs(km(1).getDouble(3) - 0.5) < 1e-6)
  }

  test("x180 KM: survival hits exactly 0 when the last at-risk users all " +
    "convert, and stays 0") {
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 01:00:00")
    val rows = Seq(
      (1L, ts(0), 1L, "signup", 1.0, "{}"), (2L, ts(1), 1L, "purchase", 1.0, "{}"),
      (3L, ts(0), 2L, "signup", 1.0, "{}"), (4L, ts(1), 2L, "purchase", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val km = Curation.kaplanMeier(ev).collect()
    assert(km.length == 1 && km(0).getDouble(3) == 0.0)
  }

  // -------------------------------------------------------------- Benford

  test("x181 Benford: digit extraction is exact on decimal boundaries and " +
    "fractions sum to 1") {
    // 100.00, 0.01-adjacent, and 9.99 style boundary values: the integer-
    // cents route must never produce a digit outside 1-9.
    val rows = Seq(100.00, 10.00, 1.00, 0.10, 0.01, 9.99, 99.99, 0.99, 55.5, 200.0)
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
          1L, "view", v, "{}")
      }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.benford(ev).collect()
    assert(r.map(_.getInt(0)).forall(d => d >= 1 && d <= 9))
    val fracSum = r.map(_.getDouble(2)).sum
    assert(math.abs(fracSum - 1.0) < 1e-5)
    // 100.00 -> cents 10000 -> digit 1; 9.99 -> 999 -> 9; 0.01 -> 1 -> 1.
    val byDigit = r.map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(byDigit(1L.toInt) == 5L, "1xx digits: 100.00, 10.00, 1.00, 0.10, 0.01")
    assert(byDigit(9) == 3L, "9.99, 99.99, 0.99")
  }

  test("x181 Benford: benford_p decreases in d and sums to ~1") {
    val r = Curation.benford(events).collect()
    val ps = r.sortBy(_.getInt(0)).map(_.getDouble(3))
    assert(ps.zip(ps.tail).forall { case (a, b) => a > b })
    assert(math.abs(ps.sum - 1.0) < 1e-4)
  }

  // --------------------------------------------- weighted percentiles

  test("x183 weighted percentiles: hand-computed crossing on a tiny group") {
    val fixture = Seq(
      (1L, 1, 1.0, 10.0, "A"), (2L, 1, 2.0, 20.0, "A"), (3L, 1, 1.0, 30.0, "A"),
      (4L, 1, 5.0, 99.0, "B"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
    val r = Curation.weightedPercentiles(fixture).collect()
      .map(x => x.getString(0) -> x).toMap
    // Group A: W=4; sorted (10,w1)->cw1, (20,w2)->cw3, (30,w1)->cw4.
    // p50: first cw*2>=4 -> 20. p90: first cw*10>=36 -> 30.
    assert(r("A").getLong(1) == 4L)
    assert(r("A").getDouble(2) == 20.0 && r("A").getDouble(3) == 30.0)
    // Single-row group: both percentiles are that row's value.
    assert(r("B").getDouble(2) == 99.0 && r("B").getDouble(3) == 99.0)
  }

  // ---------------------------------------------------------- attribution

  test("x184 attribution: U-shaped credit on a planted journey and " +
    "near-conservation of total credit") {
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")
    // One user: view, click, view, view then purchase -> k=4 touches,
    // credits 0.4 (first view), 0.1 (click), 0.1 (view), 0.4 (last view).
    val rows = Seq(
      (1L, ts(1, 1), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 2), 1L, "click", 1.0, "{}"),
      (3L, ts(1, 3), 1L, "view", 1.0, "{}"),
      (4L, ts(1, 4), 1L, "view", 1.0, "{}"),
      (5L, ts(1, 5), 1L, "purchase", 10.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.multiTouchAttribution(ev).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("view").getDouble(2) - 0.9) < 1e-6,
      "view: 0.4 first + 0.1 middle + 0.4 last")
    assert(math.abs(r("click").getDouble(2) - 0.1) < 1e-6)
    // Real data: credit mass per purchase is 1.0 minus at most (k-3) ulps
    // of the 1e-6 grid -> totals never exceed attributed purchases.
    val real = Curation.multiTouchAttribution(events)
    val totalCredit = real.agg(sum(col("credit"))).head().getDouble(0)
    val attributed = {
      val ev2 = events.selectExpr("user_id", "event_type", "unix_micros(ts) as us")
      val p = ev2.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"))
      val t = ev2.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("us").as("t_us"))
      p.join(t, Seq("user_id"))
        .filter(col("t_us") < col("p_us")
          && col("t_us") >= col("p_us") - lit(7L * 86400000000L))
        .select("p_us", "user_id").distinct().count()
    }
    assert(totalCredit <= attributed + 1e-6)
    assert(totalCredit >= attributed * 0.99 - 1.0,
      s"credit mass $totalCredit must track attributed purchases $attributed")
  }

  // ------------------------------------------------------------ Theil–Sen

  test("x185 Theil-Sen: recovers an exact linear trend through one wild " +
    "outlier day (where OLS cannot)") {
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    // y = 3i + 7 for i=1..15, except day 8 is corrupted to 500 events.
    var id = 0L
    val rows = (1 to 15).flatMap { i =>
      val n = if (i == 8) 500 else 3 * i + 7
      (0 until n).map { _ => id += 1
        (id, ts(i), id % 7, "view", 1.0, "{}")
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.theilSen(ev).head()
    assert(r.getLong(0) == 15L)
    assert(r.getDouble(1) == 3.0, s"robust slope must be exactly 3, got ${r.getDouble(1)}")
    assert(r.getDouble(2) == 7.0, s"robust intercept must be exactly 7, got ${r.getDouble(2)}")
  }

  // ------------------------------------------------------------------ RFM

  test("x186 RFM: scores are 5=best on every axis and quintiles cover 1..5") {
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    // 5 users with strictly increasing activity: user 5 is most recent,
    // most frequent, biggest spender -> all three scores 5; user 1 the
    // reverse -> all scores 1.
    var id = 0L
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map { p => id += 1
        (id, ts(u * 3 + p), u.toLong, "purchase", u * 10.0, "{}")
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.rfmSegmentation(ev).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(5L).getLong(4) == 5L && r(5L).getLong(5) == 5L && r(5L).getLong(6) == 5L)
    assert(r(1L).getLong(4) == 1L && r(1L).getLong(5) == 1L && r(1L).getLong(6) == 1L)
    assert(r(5L).getDouble(7) == 1.0, "largest spender sits at cume_dist 1.0")
    // Monetary is exact cents: user u spent u purchases x u x 10.00.
    (1 to 5).foreach(u => assert(r(u.toLong).getLong(3) == u.toLong * u * 1000))
  }

  test("x186 RFM on real events: quintiles stay in range and users are " +
    "preserved") {
    val r = Curation.rfmSegmentation(events)
    val nUsers = events.select("user_id").distinct().count()
    assert(r.count() == nUsers)
    assert(r.filter(col("r_q") < 1 || col("r_q") > 5
      || col("f_q") < 1 || col("f_q") > 5
      || col("m_q") < 1 || col("m_q") > 5).count() == 0)
    assert(r.filter(col("m_cume") <= 0 || col("m_cume") > 1).count() == 0)
  }

  test("exactAscRank equals the global row_number spec bit-for-bit — " +
    "ties, negative values, and bucket boundaries included") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 257).map(i => (i.toLong, (rnd.nextInt(19) - 9).toLong))
      .toDF("user_id", "v")
    val got = Curation.exactAscRank(df, "v", "user_id", 3L, "r")
    val want = df.withColumn("r_want", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("v").asc, col("user_id").asc)).cast("long"))
    assert(got.join(want, Seq("user_id", "v"))
      .filter(col("r") =!= col("r_want")).count() == 0,
      "partitioned-rank construction must reproduce the global order exactly")
  }

  test("x186 RFM: partitioned-rank scores are bit-identical to the global " +
    "ntile/cume_dist spec on a heavily-tied fixture") {
    def mkTs(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-02-${d % 27 + 1}%02d ${h % 24}%02d:00:00")
    var id = 0L
    val rows = (1 to 43).flatMap { u =>
      (0 to u % 5).map { j =>
        id += 1
        (id, mkTs(u % 9 + j, j),
          u.toLong, if (j % 2 == 0) "purchase" else "view",
          (u % 7) * 10.0 + j, "{}")
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Curation.rfmSegmentation(ev)
    // Independent spec: the global-window formulation (fine at test
    // scale) the oracle also runs.
    import org.apache.spark.sql.expressions.Window
    val horizon = ev.agg(max(expr("unix_micros(ts)")).as("tmax"))
    val per = ev
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(max(col("us")).as("last_us"),
        sum(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
          .as("frequency"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(lit(0L))).as("monetary_cents"))
    val want = per.crossJoin(broadcast(horizon))
      .withColumn("recency_days", expr("(tmax - last_us) div 86400000000"))
      .withColumn("w_r_q", (lit(6) - ntile(5).over(
        Window.orderBy(col("recency_days").asc, col("user_id").asc))).cast("long"))
      .withColumn("w_f_q", (lit(6) - ntile(5).over(
        Window.orderBy(col("frequency").desc, col("user_id").asc))).cast("long"))
      .withColumn("w_m_q", (lit(6) - ntile(5).over(
        Window.orderBy(col("monetary_cents").desc, col("user_id").asc))).cast("long"))
      .withColumn("w_m_cume", round(cume_dist().over(
        Window.orderBy(col("monetary_cents").asc, col("user_id").asc)), 6))
      .select("user_id", "w_r_q", "w_f_q", "w_m_q", "w_m_cume")
    val bad = got.join(want, Seq("user_id"))
      .filter(col("r_q") =!= col("w_r_q") || col("f_q") =!= col("w_f_q")
        || col("m_q") =!= col("w_m_q") || col("m_cume") =!= col("w_m_cume"))
    assert(bad.count() == 0,
      s"rank-derived scores drifted from the ntile spec: ${bad.collect().mkString(";")}")
  }

  // ----------------------------------------------------------------- Gini

  test("x187 Gini: perfect equality gives 0, near-total concentration " +
    "gives (n-1)/n") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    val equal = (1 to 10).map(u =>
      (u.toLong, ts(u), u.toLong, "purchase", 25.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val gEq = Curation.giniConcentration(equal).head()
    assert(gEq.getDouble(2) == 0.0)
    assert(gEq.getLong(0) == 10L && gEq.getLong(1) == 25000L)
    // One whale: 9 users at 0.01, one at 1000.00.
    val whale = ((1 to 9).map(u =>
      (u.toLong, ts(u), u.toLong, "purchase", 0.01, "{}")) :+
      (10L, ts(10), 10L, "purchase", 1000.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val gW = Curation.giniConcentration(whale).head()
    assert(gW.getDouble(2) > 0.89 && gW.getDouble(2) < 0.9,
      s"whale Gini should approach (n-1)/n = 0.9: ${gW.getDouble(2)}")
    assert(gW.getDouble(3) > 0.999, "top decile = the whale")
  }

  // --------------------------------------------------------------- Spearman

  test("x207 Spearman: exact +1 for co-monotone series, -1 for " +
    "anti-monotone (any monotone transform)") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    var id = 0L
    def mk(day: Int, t: String, n: Int) = (0 until n).map { _ =>
      id += 1; (id, ts(day), id % 5, t, 1.0, "{}")
    }
    // views: 1,2,...,10 per day; purchases: squared growth (monotone but
    // non-linear -> Pearson < 1, Spearman exactly 1).
    val co = (1 to 10).flatMap(d => mk(d, "view", d) ++ mk(d, "purchase", d * d))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Curation.spearmanDaily(co).head().getDouble(1) == 1.0)
    id = 0L
    val anti = (1 to 10).flatMap(d =>
      mk(d, "view", d) ++ mk(d, "purchase", (11 - d) * (11 - d)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Curation.spearmanDaily(anti).head().getDouble(1) == -1.0)
  }

  // --------------------------------------------------------------- seasonal

  test("x208 seasonal anomaly: a planted spike is flagged against its own " +
    "weekday, quiet weekdays are not") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    var id = 0L
    // 28 days: weekday-dependent stable counts (10 + dow), except day 20
    // which explodes to 500.
    val rows = (1 to 28).flatMap { d =>
      val dow = java.time.LocalDate.of(2024, 3, d).getDayOfWeek.getValue
      val n = if (d == 20) 500 else 10 + dow + (d % 2) // small jitter -> MAD > 0
      (0 until n).map { _ => id += 1; (id, ts(d), id % 7, "view", 1.0, "{}") }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.seasonalAnomaly(ev).collect()
    val flagged = r.filter(_.getBoolean(5)).map(_.getString(0))
    assert(flagged.sameElements(Array("2024-03-20")),
      s"only the planted spike should flag: ${flagged.mkString(",")}")
  }

  // -------------------------------------------------------------- item CF

  test("x205 item-item CF: a customer missing one part of a popular basket " +
    "gets exactly that part recommended first") {
    // Customers 1-3 own {10, 20, 30}; customer 4 owns {10, 20} only.
    val baskets = Seq(
      1L -> Seq(10L, 20L, 30L), 2L -> Seq(10L, 20L, 30L),
      3L -> Seq(10L, 20L, 30L), 4L -> Seq(10L, 20L))
    val orders = baskets.map { case (c, _) => (c * 100, c) }
      .toDF("o_orderkey", "o_custkey")
    val lineitem = baskets.flatMap { case (c, ps) => ps.map(p => (c * 100, p)) }
      .toDF("l_orderkey", "l_partkey")
    val r = Curation.itemItemCf(orders, lineitem, Seq(4L)).collect()
    assert(r.nonEmpty && r.head.getLong(2) == 30L,
      s"the missing basket member must top the list: ${r.map(_.getLong(2)).mkString(",")}")
    assert(r.head.getLong(3) == 2L, "reached via both owned parts")
    // Owned parts are never recommended back.
    assert(!r.map(_.getLong(2)).exists(Seq(10L, 20L).contains))
  }

  test("x205 basket cap: a planted whale contributes at most maxBasket " +
    "parts to pair generation, keeping the popular ones") {
    // 20 normal customers share parts {1,2,3}; customer 99 is a whale
    // with 500 distinct parts (including 1..3). The capped matrix must
    // bound the whale to 64 parts — C(64,2) pairs, not C(500,2) — and
    // popularity ranking must keep the co-purchase-informative ones.
    val orders = ((1 to 20).map(c => (c.toLong * 10, c.toLong)) :+ (900L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = ((1 to 20).flatMap(c => Seq(1L, 2L, 3L).map(p => (c.toLong * 10, p))) ++
      (1L to 500L).map(p => (900L, p)))
      .toDF("l_orderkey", "l_partkey")
    val capped = Curation.cappedPurchaseMatrix(
      Curation.rawPurchaseMatrix(orders, lineitem), 64)
    val byCust = capped.groupBy("cust").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byCust(99L) == 64L, s"whale basket must be capped at 64: ${byCust(99L)}")
    assert((1 to 20).forall(c => byCust(c.toLong) == 3L),
      "under-cap baskets pass through untouched")
    val whaleParts = capped.filter(col("cust") === 99L)
      .select("part").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L).subsetOf(whaleParts),
      "frequency-ranked cap keeps the most co-purchased parts")
  }

  // --------------------------------------------------------- forecast skill

  test("x206 MASE: a perfect trend model scores 0, and the scaling " +
    "denominator is the IN-SAMPLE naive MAE (canonical Hyndman-Koehler)") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    var id = 0L
    val rows = (1 to 25).flatMap { i =>
      (0 until 3 * i + 7).map { _ => id += 1
        (id, ts(i), id % 5, "view", 1.0, "{}")
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.forecastSkill(ev).head()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 0.0, "exact line -> zero model error")
    assert(r.getDouble(2) == 3.0,
      "in-sample naive MAE: the one-step naive trails the slope by 3 on every training day")
    assert(r.getDouble(3) == 0.0)
  }

  // ------------------------------------------------------------ A/B harness

  test("x204 A/B: the hash split is an A/A test on real data — the CI " +
    "covers zero and SRM stays quiet") {
    val r = Curation.abTestHarness(events).head()
    assert(r.getDouble(6) <= 0 && r.getDouble(7) >= 0,
      s"A/A interval [${r.getDouble(6)}, ${r.getDouble(7)}] must cover 0")
    assert(!r.getBoolean(9), "hash assignment cannot produce an SRM")
  }

  test("x204 A/B: a planted treatment effect lands outside the interval") {
    // Recompute the harness's own arm hash in-JVM so the fixture can put
    // a real effect on arm 1: md5 first-4-bytes parity of "<uid>|ab".
    def arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u|ab".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % 2).toInt
    }
    val byArm = (1L to 60L).groupBy(arm)
    val users = byArm(0).take(10).map((_, 10.0)) ++ byArm(1).take(10).map((_, 100.0))
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    var id = 0L
    val rows = users.toSeq.map { case (u, v) => id += 1
      (id, ts(id.toInt), u, "purchase", v, "{}")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.abTestHarness(ev).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 100.0)
    assert(r.getDouble(4) == -90.0)
    assert(r.getDouble(7) < 0,
      s"a -90 effect must push the whole CI below zero: hi=${r.getDouble(7)}")
  }

  test("x204 A/B: a planted sample-ratio mismatch trips the SRM guard") {
    // Selection bias fixture: a user filter that (unknowingly) correlates
    // with the arm hash — 60 users in arm 0, only 6 in arm 1 survive.
    // chi2 = (60-6)^2/66 = 44.2 >> 3.841, so srm_flag MUST trip; a
    // harness that misses this would happily report the biased readout.
    def arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u|ab".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % 2).toInt
    }
    val byArm = (1L to 300L).groupBy(arm)
    val users = byArm(0).take(60) ++ byArm(1).take(6)
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    var id = 0L
    val rows = users.toSeq.map { u => id += 1
      (id, ts(id.toInt), u, "purchase", 10.0, "{}")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.abTestHarness(ev).head()
    assert(r.getLong(0) == 60L && r.getLong(1) == 6L)
    assert(r.getDouble(8) > 3.841, s"chi2 ${r.getDouble(8)} must exceed the 5% cut")
    assert(r.getBoolean(9), "the SRM guard must flag a 60/6 split")
  }

  // ------------------------------------------------------------ James-Stein

  test("x201 James-Stein: a tiny group shrinks hardest and lands between " +
    "its raw mean and the grand mean") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    var id = 0L
    // grp 0: two purchases around 100.00 (tiny, extreme). grps 1-9:
    // fifty purchases each around 20.00 (big, stable). Within-group
    // noise (+/-1 around each mean) keeps the pooled within-variance
    // positive so lambda > 0 and shrinkage is real.
    val rows = Seq((10L, 90.0), (20L, 110.0)).map { case (u, v) =>
        id += 1; (id, ts(1), u, "purchase", v, "{}") } ++
      (1 to 9).flatMap { g =>
        (0 until 50).map { j => id += 1
          (id, ts(j), (g + 10 * j).toLong * 10 + g, "purchase",
            if (j % 2 == 0) 19.0 else 21.0, "{}")
        }
      }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.jamesSteinShrinkage(ev).collect()
      .map(x => x.getLong(0) -> x).toMap
    val g0 = r(0L)
    val others = (1 to 9).map(g => r(g.toLong))
    assert(g0.getDouble(4) < others.map(_.getDouble(4)).min,
      "smallest group must carry the smallest weight")
    val (raw0, grand, shrunk0) = (g0.getDouble(2), g0.getDouble(3), g0.getDouble(5))
    assert(shrunk0 < raw0 && shrunk0 > grand,
      s"shrunk $shrunk0 must sit strictly between grand $grand and raw $raw0")
  }

  // ------------------------------------------------------------ trimmed mean

  test("x202 trimmed mean: a single wild outlier moves the raw mean but " +
    "not the trimmed one") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    val rows = (1 to 9).map(i => (i.toLong, ts(i), i.toLong, "view", 1.0, "{}")) :+
      (10L, ts(10), 10L, "view", 1000.0, "{}")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.trimmedMean(ev).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 8L)
    assert(r.getDouble(3) == 100.9, "raw mean dominated by the outlier")
    assert(r.getDouble(4) == 1.0, "trimmed mean immune to it")
  }

  // ------------------------------------------------------------------ CUPED

  test("x203 CUPED: a perfectly predictive pre-period covariate yields " +
    "variance reduction 1 and the exact theta") {
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")
    var id = 0L
    // User i: i view events spread over pre-days, then one purchase of
    // i.00 on day 16 -> y = 100x in cents, exactly.
    val rows = (1 to 15).flatMap { u =>
      (1 to u).map { j => id += 1
        (id, ts(math.min(j, 15), (j % 20) + 1), u.toLong, "view", 1.0, "{}")
      } :+ { id += 1; (id, ts(16, 1), u.toLong, "purchase", u.toDouble, "{}") }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.cuped(ev).head()
    assert(r.getLong(0) == 15L)
    assert(r.getDouble(1) == 100.0, s"theta must be exactly 100, got ${r.getDouble(1)}")
    assert(r.getDouble(2) == 1.0, "a deterministic covariate removes all variance")
  }

  // ------------------------------------------------------------ scaling law

  test("x199 scaling law: subsets are nested (monotone tokens and OOV) and " +
    "the fitted exponent is negative on real text") {
    val r = Curation.scalingLawProbe(docs).collect()
    assert(r.length == 5)
    val toks = r.map(_.getLong(1))
    val oov = r.map(_.getLong(3))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b },
      "larger subset => more tokens")
    assert(oov.zip(oov.tail).forall { case (a, b) => a >= b },
      "min-hash nesting: a bigger subset can only shrink OOV")
    assert(r.head.getDouble(5) < 0, "more data must buy bigram coverage")
    assert(r.map(_.getDouble(5)).distinct.length == 1,
      "alpha is one fit, repeated per row")
  }

  // ---------------------------------------------------------- market basket

  test("x200 market basket: a planted always-together pair tops the lift " +
    "ranking with confidence 1") {
    // Parts 901/902 co-occur in orders 1-3 and nowhere else; parts 1-5
    // pad every order so pair counting has background mass.
    val rows = (1 to 9).flatMap { o =>
      val pad = Seq((o.toLong, (o % 5 + 1).toLong), (o.toLong, (o % 3 + 6).toLong))
      if (o <= 3) pad ++ Seq((o.toLong, 901L), (o.toLong, 902L)) else pad
    }
    val fixture = rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_linenumber", lit(1))
    val r = Curation.marketBasket(fixture, minSupport = 3, top = 5).collect()
    assert(r.nonEmpty)
    val topRow = r.head
    assert((topRow.getLong(1), topRow.getLong(2)) == (901L, 902L))
    // lift = n_ab * N / (n_a * n_b) = 3 * 9 / (3 * 3) = 3.
    assert(topRow.getDouble(6) == 3.0)
    assert(topRow.getDouble(7) == 1.0, "they never appear apart")
  }

  // ------------------------------------------------------- next-event eval

  test("x195 next-event eval: a deterministic journey scores accuracy 1.0 " +
    "and beats the majority baseline") {
    // Every user, every day: signup -> view -> purchase. The transition
    // model is exact; majority class ('purchase' and 'view' tie -> asc
    // tie-break 'purchase') cannot reach 1.0.
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")
    var id = 0L
    val rows = (1 to 25).flatMap { d =>
      (1 to 3).flatMap { u =>
        Seq("signup", "view", "purchase").zipWithIndex.map { case (t, i) =>
          id += 1
          (id, ts(d, 3 * u + i), u.toLong, t, 1.0, "{}")
        }
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.nextEventEval(ev).head()
    assert(r.getDouble(3) == 1.0, "deterministic chain must be fully predictable")
    assert(r.getDouble(4) < 1.0, "majority baseline cannot explain a chain")
    assert(r.getLong(0) > 0)
  }

  // ------------------------------------------------------------ label noise

  test("x196 label noise: a vector planted inside the wrong cluster is " +
    "flagged; consistent cluster members are not") {
    val dim = 64
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def axisVec(axis: Int, jitterSeed: Int): Seq[Float] =
      (0 until dim).map(d =>
        if (d == axis) 1.0f
        else if (d == (axis + 7 + jitterSeed) % dim) 0.05f else 0.0f)
    // Cluster A: axis 0, label 0. Cluster B: axis 1, label 1. Vector 999
    // sits in cluster A's cell but carries label 1.
    val rows = (0 until 10).map(i => Row(i.toLong, axisVec(0, i), 0)) ++
      (10 until 20).map(i => Row(i.toLong, axisVec(1, i), 1)) :+
      Row(999L, axisVec(0, 3), 1)
    val fixture = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val flagged = Curation.labelNoiseScreen(fixture).collect()
    assert(flagged.map(_.getLong(0)).contains(999L),
      "the mislabeled vector must be flagged")
    assert(flagged.length == 1,
      s"consistent members must pass: ${flagged.map(_.getLong(0)).mkString(",")}")
  }

  // --------------------------------------------------------------- log-odds

  test("x197 log-odds: a word exclusive to one source ranks first for it " +
    "with positive z") {
    val fixture = ((1 to 10).map(i =>
      (i.toLong, "common words shared across every source " + i, "plain")) ++
      (11 to 20).map(i =>
        (i.toLong, "common words shared zyzzyva zyzzyva zyzzyva " + i, "marked")))
      .toDF("doc_id", "text", "source")
    val r = Curation.logOddsKeywords(fixture).collect()
    val markedTop = r.filter(x => x.getString(0) == "marked" && x.getLong(1) == 1L).head
    assert(markedTop.getString(2) == "zyzzyva")
    assert(markedTop.getDouble(4) > 0)
    // The exclusive word cannot rank for the OTHER source.
    assert(!r.filter(_.getString(0) == "plain").map(_.getString(2)).contains("zyzzyva"))
  }

  // -------------------------------------------------------------- chi-square

  test("x198 chi-square: exact independence gives 0; perfect association " +
    "gives N") {
    def ts(hour: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $hour%02d:30:00")
    var id = 0L
    def mk(hour: Int, t: String, n: Int) = (0 until n).map { _ =>
      id += 1; (id, ts(hour), id % 5, t, 1.0, "{}")
    }
    // Independent: both hours carry the same 10:20 type mix.
    val indep = (mk(1, "view", 10) ++ mk(1, "click", 20) ++
      mk(2, "view", 10) ++ mk(2, "click", 20))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ri = Curation.hourTypeChiSquare(indep).head()
    assert(ri.getDouble(0) == 0.0 && ri.getLong(1) == 1L)
    // Perfect association: hour determines type -> chi2 = N for 2x2.
    val dep = (mk(1, "view", 30) ++ mk(2, "click", 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rd = Curation.hourTypeChiSquare(dep).head()
    assert(rd.getDouble(0) == 60.0, s"2x2 perfect association: chi2 = N, got ${rd.getDouble(0)}")
  }

  // ------------------------------------------------------------ HLL merge

  test("x191 HLL merge audit: zero register mismatches, and the union " +
    "estimate is invariant under corpus duplication") {
    val r = graft.ops.Hll.mergeAudit(docs, "text", col("doc_id") % 4).head()
    assert(r.getLong(0) == 0L, "max-merge must reproduce direct registers")
    // Duplicate every doc under fresh ids: distinct cardinality unchanged,
    // so registers — functions of the distinct hash set — are identical.
    val dup = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val r2 = graft.ops.Hll.mergeAudit(dup, "text", col("doc_id") % 4).head()
    assert(r2.getLong(0) == 0L)
    assert(r2.getDouble(4) == r.getDouble(4),
      "duplication must not move a distinct-count sketch")
    assert(r2.getLong(3) == r.getLong(3))
  }

  // ---------------------------------------------------------------- Neyman

  test("x192 Neyman: a zero-variance stratum gets zero optimal allocation " +
    "while proportional still funds it") {
    val fixture = ((1 to 50).map(i => (i.toLong, "flat", 100L)) ++
      (51 until 101).map(i => (i.toLong, "wild", (i % 17).toLong * 40)))
      .toDF("doc_id", "source", "n_chars")
    val r = Curation.neymanAllocation(fixture).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("flat").getDouble(2) == 0.0)
    assert(r("flat").getLong(4) == 0L, "sd=0 stratum needs no optimal samples")
    assert(r("wild").getLong(4) == 100L, "all budget flows to the variance")
    assert(r("flat").getLong(3) == 50L && r("wild").getLong(3) == 50L,
      "proportional ignores variance")
  }

  // ------------------------------------------------------ capture-recapture

  test("x193 capture-recapture: estimates are duplication-invariant and " +
    "track the true distinct count") {
    val r1 = Curation.captureRecapture(docs).head()
    val dup = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val r2 = Curation.captureRecapture(dup).head()
    assert(r1 == r2, "content-keyed captures cannot see row duplication")
    val (nExact, chapman) = (r1.getLong(3), r1.getDouble(5))
    // Chapman at 30% captures: sd ~ N/sqrt(overlap); accept 3 sd.
    val sd = nExact / math.sqrt(math.max(1.0, r1.getLong(2).toDouble))
    assert(math.abs(chapman - nExact) < 3 * sd,
      s"estimate $chapman vs true $nExact (sd ~ $sd)")
  }

  // ------------------------------------------------------------ Good-Turing

  test("x194 Good-Turing: all-singleton source has missing mass 1, " +
    "no-singleton source has null r*") {
    val fixture = Seq(
      (1L, "a b c d", "onceeach"),
      (2L, "x x y y z z", "twiceeach")
    ).toDF("doc_id", "text", "source")
    val r = Curation.goodTuring(fixture).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("onceeach").getDouble(5) == 1.0, "every type a singleton -> P0 = 1")
    assert(r("onceeach").getLong(3) == 4L && r("onceeach").getLong(4) == 0L)
    assert(r("twiceeach").getDouble(5) == 0.0 && r("twiceeach").isNullAt(6),
      "no singletons -> zero missing mass, r* undefined")
  }

  // ------------------------------------------------------------- bootstrap

  test("x188 bootstrap: constant values collapse the interval to the point " +
    "estimate") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 ${i % 24}%02d:00:00")
    val ev = (1 to 50).map(i =>
      (i.toLong, ts(i), i.toLong, "purchase", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.poissonBootstrap(ev).head()
    // Every replicate's weighted mean of a constant is that constant
    // (weights never all-zero across 50 draws), so sd = 0 exactly.
    assert(r.getDouble(0) == 20.0)
    assert(r.getDouble(2) == 20.0, "bootstrap mean of a constant")
    assert(r.getDouble(3) == 0.0, "bootstrap sd of a constant")
    assert(r.getDouble(4) == 20.0 && r.getDouble(5) == 20.0)
  }

  test("x188 bootstrap on real purchases: interval brackets the point " +
    "estimate with positive width") {
    val r = Curation.poissonBootstrap(events).head()
    val (point, sd, lo, hi) =
      (r.getDouble(0), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(sd > 0 && lo < point && point < hi)
    assert(math.abs((point - lo) - (hi - point)) < 1e-5, "symmetric interval")
  }

  // ------------------------------------------------------------- conformal

  test("x189 conformal: an exactly linear series gives a zero-width band " +
    "at the true next value") {
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 01:00:00")
    var id = 0L
    val rows = (1 to 15).flatMap { i =>
      (0 until 2 * i + 5).map { _ => id += 1
        (id, ts(i), id % 5, "view", 1.0, "{}")
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Curation.conformalBand(ev).head()
    assert(r.getLong(0) == 15L && r.getLong(1) == 10L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 5.0,
      "Theil-Sen recovers y = 2i + 5 exactly")
    assert(r.getDouble(5) == 0.0, "zero residuals -> zero conformal quantile")
    assert(r.getDouble(6) == 37.0, "forecast for day 16 = 2*16 + 5")
    assert(r.getDouble(7) == 37.0 && r.getDouble(8) == 37.0)
  }

  test("x189 conformal on real events: band brackets the forecast and q90 " +
    "is a calibration residual") {
    val r = Curation.conformalBand(events).head()
    val (q90, fc, lo, hi) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(q90 >= 0 && lo <= fc && fc <= hi)
    assert(math.abs((fc - lo) - q90) < 1e-6 && math.abs((hi - fc) - q90) < 1e-6)
  }

  // ---------------------------------------------------------- quantization

  test("x190 quantization recall: axis-aligned vectors quantize losslessly " +
    "to recall 1.0") {
    val dim = 64
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // 20 scaled one-hot vectors: quantization maps each to +/-127 on its
    // axis, preserving every dot product's sign/order exactly.
    val rows = (0 until 20).map { i =>
      Row(i.toLong,
        (0 until dim).map(d => if (d == i % 8) (1.0f + i * 0.1f) else 0.0f), 0)
    }
    val fixture = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val r = Curation.quantizationRecall(fixture, 0L until 5L).collect()
    r.foreach(row => assert(row.getDouble(2) == 1.0,
      s"qid ${row.getLong(0)}: axis-aligned quantization must be lossless"))
  }

  test("x190 quantization recall on real embeddings stays high (int8 is " +
    "nearly free at serving time)") {
    val r = Curation.quantizationRecall(embeddings, 0L until 10L)
    val mean = r.agg(avg(col("recall"))).head().getDouble(0)
    assert(mean >= 0.8, s"mean SQ8 recall@5 $mean — quantizer regressed")
    assert(r.filter(col("n_overlap") > 5).count() == 0)
  }

  // --------------------------------------------------------- kNN expansion

  test("x182 expansion: recall is monotonically >= the base pass for every " +
    "query (superset re-rank)") {
    val r = Curation.knnExpansion(embeddings, 0L until 10L).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getDouble(4) >= row.getDouble(3),
        s"qid ${row.getLong(0)}: expansion can never lose recall")
      assert(row.getDouble(4) <= 1.0 + 1e-9)
      assert(math.abs(row.getDouble(5)
        - (row.getDouble(4) - row.getDouble(3))) < 1e-6)
    }
  }

  test("x182 degree cap has teeth: cap 0 empties the hop-2 adjacency, so " +
    "expansion degenerates to exactly the base pass") {
    val r = Curation.knnExpansion(embeddings, 0L until 5L, degreeCap = 0).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getLong(1) == row.getLong(2) && row.getDouble(5) == 0.0,
        s"qid ${row.getLong(0)}: with no neighbors to expand through, " +
          "exp must equal base — the cap is not being applied")
    }
  }

  // ------------------------------------------------------ Neyman allocation

  test("x192 Neyman: a singleton stratum contributes zero variance instead " +
    "of NaN-poisoning every source's allocation") {
    val fixture = ((1 to 40).map(i => (i.toLong, s"doc $i word" * (i % 5 + 1),
      "big", 100L + i)) :+ (99L, "solo", "solo", 500L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Curation.neymanAllocation(fixture).collect()
    assert(r.length == 2)
    assert(r.forall(row => !row.isNullAt(4)),
      "one singleton stratum must never null the whole allocation column")
    val solo = r.find(_.getString(0) == "solo").get
    assert(solo.getDouble(2) == 0.0, "singleton stratum reports stddev 0")
    assert(solo.getLong(4) == 0L, "zero variance evidence -> zero Neyman weight")
    val big = r.find(_.getString(0) == "big").get
    assert(big.getLong(4) == 100L, "the whole budget flows to the stratum with variance")
  }

  test("x178 outliers: a planted far vector ranks first with a large z") {
    val dim = 64
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val planted = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(900000L,
        (0 until dim).map(i => if (i == 0) 9.0f else 0.0f), 0))),
      schema)
    val aug = embeddings.unionByName(planted)
    val top = Curation.embeddingOutliers(aug, topK = 5).collect()
    assert(top.head.getLong(1) == 900000L, "planted vector must rank 1")
    assert(top.head.getDouble(4) > 10.0, "z must be extreme")
    // Ranks are 1..5 and strictly ordered by z desc.
    assert(top.map(_.getLong(0)).toSeq == (1L to 5L))
    val zs = top.map(_.getDouble(4)).toSeq
    assert(zs == zs.sorted.reverse)
  }
}
