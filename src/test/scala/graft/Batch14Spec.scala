package graft

import org.apache.spark.sql.functions._

/** Algebra pins for the round-14 batch: the AMS shard-merge audit's
  * family contract, the unimax DECIMAL(38,0) overflow envelope
  * (round-13 advice), the MMD² moment identity vs an explicit pairwise
  * kernel fold, and the merge-audit invariants of the count-min,
  * Bloom, and histogram sketches. Real-data paths stay oracle-gated
  * (x226–x231).
  */
class Batch14Spec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  test("ams merge audit: shard counters merged by addition equal the " +
    "direct corpus counters — n_mismatch 0, estimate identical to x224's") {
    val rnd = new scala.util.Random(14)
    val d = docs((0L until 50L).map { i =>
      val n = 1 + rnd.nextInt(15)
      (i, s"s${i % 3}",
        Seq.fill(n)(s"w${rnd.nextInt(1 + rnd.nextInt(12))}").mkString(" "))
    }.toSeq: _*)
    val audit = graft.ext.Frequent.amsF2MergeAudit(d, nShards = 8).collect()(0)
    assert(audit.getAs[Long]("n_mismatch") == 0L,
      "addition-merged shard counters must equal the direct counters")
    val direct = graft.ext.Frequent.amsF2(d).collect()(0)
    assert(audit.getAs[Double]("f2_est") == direct.getAs[Double]("f2_est"),
      "identical counters must give the identical median-of-means estimate")
    assert(audit.getAs[Long]("f2_exact") == direct.getAs[Long]("f2_exact"))
    // Degenerate sharding (more shards than documents) still merges clean.
    val sparse = graft.ext.Frequent.amsF2MergeAudit(d.limit(3), nShards = 16)
      .collect()(0)
    assert(sparse.getAs[Long]("n_mismatch") == 0L)
  }

  test("unimax: the capped/uncapped partition survives token masses where " +
    "the old LongType budget product wrapped past 2^63") {
    // Sum(n_tokens) = 1e18, budget ratio 16/10: the budget PRODUCT
    // 1.6e19 exceeds Long.MaxValue (9.22e18) and wrapped negative in the
    // pre-round-14 LongType chain (everything then read uncapped); the
    // DECIMAL(38,0) chain must produce budget 1.6e18, cap the small
    // group, and water-fill the rest.
    val counts = Seq(
      ("small", 10L, 400000000000000000L), // 4e17 tokens, capacity 8e17
      ("large", 20L, 600000000000000000L)  // 6e17 tokens, capacity 1.2e18
    ).toDF("grp", "n_docs", "n_tokens")
    val r = graft.ext.Pipeline.unimaxFromCounts(counts, "grp",
      epochCap = 2, budgetNum = 16, budgetDen = 10)
      .collect().map(row => row.getAs[String]("grp") -> row).toMap
    assert(r("small").getAs[Long]("budget_tokens") == 1600000000000000000L)
    assert(r("small").getAs[Boolean]("capped"),
      "f(1) = 2*8e17 = budget exactly -> capped")
    assert(!r("large").getAs[Boolean]("capped"),
      "f(2) = 8e17 + 1.2e18 = 2e18 > budget -> uncapped")
    assert(r("small").getAs[Double]("alloc_tokens") == 8.0e17)
    assert(r("large").getAs[Double]("alloc_tokens") == 8.0e17,
      "surplus (budget - capped capacity) water-fills the uncapped group")
  }

  test("mmdMatrix: the moment-statistics spelling equals the explicit " +
    "pairwise kernel fold, for both kernels") {
    val rnd = new scala.util.Random(27)
    val dim = 3
    def vec() = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // Label 0 and 1 drawn alike; label 2 mean-shifted along coord 0.
    val rows =
      (0 until 7).map(i => (i.toLong, vec(), 0)) ++
      (0 until 6).map(i => (100L + i, vec(), 1)) ++
      (0 until 5).map(i => (200L + i, vec().updated(0, (rnd.nextDouble() + 2.0).toFloat), 2))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = graft.ext.Similarity.mmdMatrix(emb, dim = dim).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2)))

    def fp(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
    val groups = rows.groupBy(_._3).view
      .mapValues(_.map(t => fp(t._2)).toIndexedSeq).toMap
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      (0 until dim).map(p => BigInt(a(p)) * b(p)).sum
    def mmd(a: Int, b: Int, k: BigInt => BigInt, descale: Double): Double = {
      val (xs, ys) = (groups(a), groups(b))
      val (na, nb) = (xs.size.toLong, ys.size.toLong)
      val wa = (for (i <- xs.indices; j <- xs.indices if i != j)
        yield k(dot(xs(i), xs(j)))).sum
      val wb = (for (i <- ys.indices; j <- ys.indices if i != j)
        yield k(dot(ys(i), ys(j)))).sum
      val cab = (for (x <- xs; y <- ys) yield k(dot(x, y))).sum
      (wa.toDouble / (na * (na - 1)).toDouble
        + wb.toDouble / (nb * (nb - 1)).toDouble
        - 2.0 * cab.toDouble / (na * nb).toDouble) / descale
    }
    for ((a, b) <- Seq((0, 1), (0, 2), (1, 2))) {
      val r = got((a, b))
      assert(math.abs(r.getAs[Double]("mmd2_lin") - mmd(a, b, identity, 1.0e12)) < 1e-9,
        s"linear kernel ($a,$b)")
      assert(math.abs(r.getAs[Double]("mmd2_quad") - mmd(a, b, d => d * d, 1.0e24)) < 1e-9,
        s"quadratic kernel ($a,$b)")
    }
    // The shifted group is farther from both same-distribution groups
    // than they are from each other, under both kernels.
    assert(got((0, 2)).getAs[Double]("mmd2_lin") > got((0, 1)).getAs[Double]("mmd2_lin"))
    assert(got((1, 2)).getAs[Double]("mmd2_lin") > got((0, 1)).getAs[Double]("mmd2_lin"))
    assert(got((0, 2)).getAs[Double]("mmd2_quad") > got((0, 1)).getAs[Double]("mmd2_quad"))
  }

  test("mmdIncremental: folding an append batch into the base moments " +
    "equals the full recompute, bit for bit") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 24).map(i =>
      (i.toLong, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat), i % 3))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val full = graft.ext.Similarity.mmdMatrix(emb, dim = 4).collect()
    val inc = graft.ext.Similarity.mmdIncremental(
      emb.filter(col("vec_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 === 0), dim = 4).collect()
    assert(full.toSeq == inc.toSeq,
      "integer-sum moments must make incremental == full EXACTLY")
  }

  test("mmdMatrix: a singleton group has no unbiased within term -> NULL (3VL)") {
    val emb = Seq(
      (1L, Array(0.1f, 0.2f), 0), (2L, Array(0.3f, 0.1f), 0),
      (3L, Array(0.2f, 0.2f), 1)).toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.mmdMatrix(emb, dim = 2).collect()
    assert(r.length == 1)
    assert(r(0).isNullAt(r(0).fieldIndex("mmd2_lin")))
    assert(r(0).isNullAt(r(0).fieldIndex("mmd2_quad")))
  }

  test("cms merge audit: shard grids merged by addition equal the direct " +
    "grid, every hash row conserves token mass, estimates stay one-sided") {
    val rnd = new scala.util.Random(28)
    val d = docs((0L until 60L).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i, s"s${i % 4}",
        Seq.fill(n)(s"w${rnd.nextInt(1 + rnd.nextInt(9))}").mkString(" "))
    }.toSeq: _*)
    val audit = graft.ext.TextAnalysis
      .countMinMergeAudit(d, nShards = 8, minCount = 20).collect()(0)
    assert(audit.getAs[Long]("n_mismatch") == 0L,
      "addition-merged shard grids must equal the direct grid")
    assert(audit.getAs[Long]("mass_mismatch") == 0L,
      "every hash row must sum to the corpus token count")
    val nTok = d.select(explode(split(trim(col("text")), "\\s+"))).count()
    assert(audit.getAs[Long]("n_tokens") == nTok)
    assert(audit.getAs[Long]("n_heavy") > 0, "fixture must exercise the probe")
    assert(audit.getAs[Long]("max_overestimate") >= 0L,
      "count-min error is one-sided: estimates never undercount")
    // Degenerate sharding (more shards than documents) still merges clean.
    val sparse = graft.ext.TextAnalysis
      .countMinMergeAudit(d.limit(3), nShards = 16, minCount = 1).collect()(0)
    assert(sparse.getAs[Long]("n_mismatch") == 0L)
    assert(sparse.getAs[Long]("mass_mismatch") == 0L)
  }

  test("bloom merge audit: OR-merged shard words equal the direct filter, " +
    "member probes always hit, fp rate reads against true non-members") {
    val rnd = new scala.util.Random(30)
    val base = (0L until 40L).map(i =>
      (i, s"s${i % 3}", s"doc ${rnd.nextInt(1000)} body ${rnd.alphanumeric.take(8).mkString}"))
    // One document whose text IS a probe string: the exact-membership
    // audit must count it as a member (honest fp accounting), and the
    // filter must hit it (no false negatives, by construction).
    val d = docs((base :+ ((40L, "s0", "bloomprobe|7"))): _*)
    val audit = graft.ops.Bloom.mergeAudit(d, nShards = 8).collect()(0)
    assert(audit.getAs[Long]("n_mismatch") == 0L,
      "OR-merged shard words must equal the direct corpus words")
    val bitsSet = audit.getAs[Long]("bits_set")
    assert(bitsSet > 0L && bitsSet <= 4096L)
    assert(bitsSet <= 4L * 41L, "k*n positions bound the popcount")
    assert(audit.getAs[Long]("n_probes") == 2048L)
    assert(audit.getAs[Long]("n_probe_members") == 1L,
      "the planted probe-text document must be counted as a member")
    assert(audit.getAs[Long]("n_bloom_hits") >= 1L,
      "a member probe can never miss — Bloom has no false negatives")
    val fp = audit.getAs[Double]("fp_rate")
    assert(fp >= 0.0 && fp <= 1.0)
    // Degenerate sharding (more shards than documents) still merges clean.
    val sparse = graft.ops.Bloom.mergeAudit(d.limit(3), nShards = 16).collect()(0)
    assert(sparse.getAs[Long]("n_mismatch") == 0L)
  }

  test("histogram merge audit: addition-merged shard bins equal the direct " +
    "histogram, conserve mass, and the merged estimates stay within one bin") {
    val rnd = new scala.util.Random(31)
    val d = docs((0L until 80L).map { i =>
      val n = 1 + rnd.nextInt(60)
      (i, s"s${i % 3}", Seq.fill(n)("w").mkString(" "))
    }: _*)
    val proj = d.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val rows = graft.ops.HistogramSketch
      .mergeAudit(proj, "doc_id", "n_tokens").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") == 0L,
        "addition-merged shard bins must equal the direct histogram")
      assert(r.getAs[Long]("mass_mismatch") == 0L,
        "merged bins must sum to the corpus row count")
    }
    // Merged == direct means the merged estimates equal the single-build
    // sketch's estimates exactly.
    val single = graft.ops.HistogramSketch.quantiles(proj, "n_tokens")
      .orderBy("q").collect().map(_.getAs[Double]("estimate")).toSeq
    assert(rows.sortBy(_.getAs[Double]("q"))
      .map(_.getAs[Double]("estimate")).toSeq == single)
    // The one-bin-width verdict holds when the bin width sits above the
    // data's value spacing: dense continuous values, 16 bins over 300
    // rows (an interpolated exact quantile moves by at most one
    // order-stat gap << bin width). The integer-valued fixture above
    // deliberately does NOT assert it — a 0.23-token bin cannot bracket
    // interpolation between integers, and the column is a measured
    // verdict, not a claimed bound (both engines compute it alike).
    val dense = (0L until 300L).map(i => (i, rnd.nextDouble() * 100.0))
      .toDF("doc_id", "v")
    val dr = graft.ops.HistogramSketch
      .mergeAudit(dense, "doc_id", "v", bins = 16).collect()
    dr.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") == 0L)
      assert(r.getAs[Long]("mass_mismatch") == 0L)
      assert(r.getAs[Boolean]("within_one_bin"),
        s"q=${r.getAs[Double]("q")}: dense-data estimate must stay within one bin width")
    }
    // Degenerate constant column: every value in bin 0, audit still clean.
    val const = graft.ops.HistogramSketch.mergeAudit(
      d.select(col("doc_id"), lit(7L).as("n_tokens")), "doc_id", "n_tokens")
      .collect()
    const.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") == 0L)
      assert(r.getAs[Long]("mass_mismatch") == 0L)
      assert(r.getAs[Double]("estimate") == 7.0 || r.getAs[Boolean]("within_one_bin"))
    }
  }

  private def langDocs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("langIdCalibration: a perfectly confident, perfectly right classifier " +
    "has one top bin and ECE 0; unscorable docs are excluded but accounted") {
    // Pure-marker docs: every token is an 'en' marker -> conf 1.0,
    // predicted en, labeled en -> accuracy 1, avg_conf 1, ece 0.
    val perfect = langDocs((0L until 6L).map(i =>
      (i, "en", "the of and is to")): _*)
    val p = graft.ext.TextAnalysis.langIdCalibration(perfect).collect()
    assert(p.length == 1 && p(0).getAs[Int]("bin") == 9)
    assert(p(0).getAs[Double]("accuracy") == 1.0)
    assert(p(0).getAs[Double]("avg_conf") == 1.0)
    assert(p(0).getAs[Double]("ece") == 0.0)
    assert(p(0).getAs[Long]("n_scored") == 6L &&
      p(0).getAs[Long]("n_total") == 6L)

    // Mixed: 4 scorable docs (2 right at mixed confidence, 2 wrong) plus
    // 2 marker-free docs that must drop out of calibration but stay in
    // n_total.
    val mixed = langDocs(
      (1L, "en", "the of and xx yy"),        // en right, conf 3/3 = 1.0
      (2L, "en", "the la de xx"),            // en vs es/fr markers, mixed
      (3L, "fr", "the of and"),              // predicted en, labeled fr
      (4L, "es", "the of"),                  // predicted en, labeled es
      (5L, "en", "zz qq ww"),                // no markers -> excluded
      (6L, "de", "zz qq"))                   // no markers -> excluded
    val m = graft.ext.TextAnalysis.langIdCalibration(mixed).collect()
    val nScored = m.head.getAs[Long]("n_scored")
    assert(nScored == 4L && m.head.getAs[Long]("n_total") == 6L)
    assert(m.map(_.getAs[Long]("n")).sum == nScored,
      "bins must partition the scored docs")
    val ece = m.head.getAs[Double]("ece")
    assert(ece > 0.0 && ece <= 1.0, s"mixed fixture must have positive ECE, got $ece")
    assert(m.forall(r => r.getAs[Double]("ece") == ece),
      "ECE rides identically on every row")
    m.foreach { r =>
      assert(r.getAs[Double]("accuracy") >= 0.0 && r.getAs[Double]("accuracy") <= 1.0)
      assert(r.getAs[Double]("avg_conf") >= 0.0 && r.getAs[Double]("avg_conf") <= 1.0)
    }
  }

  test("tokenBurstiness: cf/df/df2 and both ratios are exact on a " +
    "hand-checkable fixture") {
    // 'a': doc0 x2, doc1 x1, doc2 x3 -> cf 6, df 3, df2 2.
    // 'b': once in each of 4 docs -> cf 4, df 4, df2 0 (spread thin).
    val d = docs(
      (0L, "s0", "a a b"),
      (1L, "s0", "a b"),
      (2L, "s1", "a a a b"),
      (3L, "s1", "b"))
    val r = graft.ext.TextAnalysis.tokenBurstiness(d, minCount = 1)
      .collect().map(x => x.getAs[String]("tok") -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("cf") == 6L && a.getAs[Long]("df") == 3L &&
      a.getAs[Long]("df2") == 2L)
    assert(a.getAs[Double]("burstiness") == 2.0)
    assert(a.getAs[Double]("adaptation") == 0.666667)
    val b = r("b")
    assert(b.getAs[Long]("cf") == 4L && b.getAs[Long]("df") == 4L &&
      b.getAs[Long]("df2") == 0L)
    assert(b.getAs[Double]("burstiness") == 1.0)
    assert(b.getAs[Double]("adaptation") == 0.0,
      "a token never repeated within a doc has zero adaptation")
    // The heavy filter drops below-threshold tokens.
    assert(graft.ext.TextAnalysis.tokenBurstiness(d, minCount = 5)
      .collect().map(_.getAs[String]("tok")).toSeq == Seq("a"))
  }

  test("tableChecksum: equal tables match on every bucket; one mutated row " +
    "localizes to its bucket(s); NULL is distinguished from empty and 'NULL'") {
    val rnd = new scala.util.Random(32)
    val rows = (0L until 200L).map(i =>
      (i, s"s${i % 4}", s"body ${rnd.nextInt(100000)}"))
    val a = rows.toDF("id", "src", "body")
    val cs = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.Reconcile.tableChecksum(df, Seq("id", "src", "body"), 16)
    val same = graft.ops.Reconcile.checksumDiff(cs(a),
      cs(rows.toDF("id", "src", "body"))).collect()
    assert(same.nonEmpty && same.forall(_.getAs[Boolean]("bucket_match")),
      "identical tables must match bucket for bucket")
    // Mutate ONE row: at most its old and new bucket can mismatch.
    val b = rows.map { case r @ (i, s, t) =>
      if (i == 77L) (i, s, t + "!") else r }.toDF("id", "src", "body")
    val diff = graft.ops.Reconcile.checksumDiff(cs(a), cs(b)).collect()
    val bad = diff.filterNot(_.getAs[Boolean]("bucket_match"))
    assert(bad.length >= 1 && bad.length <= 2,
      s"one mutated row must flip 1-2 buckets, flipped ${bad.length}")
    // NULL vs empty vs the literal string "NULL": three distinct tables.
    def one(v: Option[String]) =
      Seq((1L, v.orNull)).toDF("id", "src")
    val fps = Seq(None, Some(""), Some("NULL")).map(v =>
      graft.ops.Reconcile.tableChecksum(one(v), Seq("id", "src"), 4)
        .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("xor1"))).toSet)
    assert(fps.distinct.length == 3,
      "the null sentinel must keep NULL, '', and 'NULL' apart")
  }

  test("countMinCalibration: one row per width, one-sided everywhere, " +
    "heavy set constant, and the 256 column equals the x134 sketch exactly") {
    val rnd = new scala.util.Random(33)
    val d = docs((0L until 80L).map { i =>
      val n = 10 + rnd.nextInt(30)
      (i, s"s${i % 4}",
        Seq.fill(n)(s"w${rnd.nextInt(1 + rnd.nextInt(25))}").mkString(" "))
    }: _*)
    val rows = graft.ext.TextAnalysis.countMinCalibration(d, minCount = 20)
      .collect()
    assert(rows.map(_.getAs[Int]("width")).toSeq == Seq(64, 128, 256, 512))
    val heavies = rows.map(_.getAs[Long]("n_heavy")).distinct
    assert(heavies.length == 1 && heavies.head > 0,
      "the heavy set is width-independent")
    rows.foreach { r =>
      assert(r.getAs[Long]("max_overestimate") >= 0L,
        "count-min never undercounts")
      assert(r.getAs[Double]("mean_overestimate") >= 0.0)
      assert(r.getAs[Double]("mean_overestimate")
        <= r.getAs[Long]("max_overestimate").toDouble)
    }
    // Shared-kernel pin: the width-256 sweep entry must agree with the
    // standalone x134 sketch bit for bit.
    val direct = graft.ext.TextAnalysis.countMinSketch(d, 4, 256, 20).collect()
    val w256 = rows.find(_.getAs[Int]("width") == 256).get
    assert(w256.getAs[Long]("max_overestimate")
      == direct.map(_.getAs[Long]("overestimate")).max)
    assert(w256.getAs[Long]("n_heavy") == direct.length.toLong)
  }

  test("amsJoinEstimate: exact join size is the count inner product; the " +
    "self-join case is F2 and its estimator is a sum of squares >= 0") {
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L, 2L, 4L).toDF("k")
    val row = graft.ext.Frequent.amsJoinEstimate(l, "k", r, "k").collect()(0)
    assert(row.getAs[Long]("n_left") == 4L && row.getAs[Long]("n_right") == 4L)
    assert(row.getAs[Long]("join_exact") == 4L,
      "counts {1:2,2:1,3:1} x {1:1,2:2,4:1} -> 2*1 + 1*2 = 4")
    // Self-join: exact = sum of squared counts = F2; every per-estimator
    // product is a square, so the signed estimator cannot go negative.
    val self = graft.ext.Frequent.amsJoinEstimate(l, "k", l, "k").collect()(0)
    assert(self.getAs[Long]("join_exact") == 6L, "2^2 + 1 + 1 = 6")
    assert(self.getAs[Double]("join_est") >= 0.0)
    // Disjoint keys: exact 0, rel_error NULL (3VL — nothing to divide by).
    val disj = graft.ext.Frequent.amsJoinEstimate(
      l, "k", Seq(9L, 10L).toDF("k"), "k").collect()(0)
    assert(disj.getAs[Long]("join_exact") == 0L)
    assert(disj.isNullAt(disj.fieldIndex("rel_error")))
  }

  test("tableChecksumByGroup: each group's fingerprint equals the whole-" +
    "table checksum of that group's slice — the kernel is one definition") {
    val rnd = new scala.util.Random(34)
    val d = docs((0L until 80L).map(i =>
      (i, s"s${i % 3}", s"text ${rnd.nextInt(10000)}")): _*)
    val cols = Seq("doc_id", "text")
    val grouped = graft.ops.Reconcile
      .tableChecksumByGroup(d, "source", cols, 8).collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(r => (r.getAs[Long]("bucket"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("xor1"),
        r.getAs[Long]("xor2"), r.getAs[Long]("sum1"))).toSet).toMap
    for (g <- Seq("s0", "s1", "s2")) {
      val slice = graft.ops.Reconcile
        .tableChecksum(d.filter(col("source") === g), cols, 8).collect()
        .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("xor1"), r.getAs[Long]("xor2"),
          r.getAs[Long]("sum1"))).toSet
      assert(grouped(g) == slice, s"group $g fingerprint diverged from its slice")
    }
    assert(grouped.values.flatten.map(_._2).sum == 80L,
      "group fingerprints must conserve total row mass")
  }

  test("dupRateWilson: hand-checkable interval, exact-zero lower bound on " +
    "an all-unique source, and the quarantine flag keys on the lower bound") {
    val d = docs(
      // s0: 4 docs, 2 distinct texts -> 2 dups, p = 0.5
      (0L, "s0", "aaa"), (1L, "s0", "aaa"), (2L, "s0", "bbb"), (3L, "s0", "bbb"),
      // s1: all unique -> p = 0, Wilson lower bound is EXACTLY 0
      (4L, "s1", "c"), (5L, "s1", "d"), (6L, "s1", "e"),
      // s2: 10 copies of one text -> 9 dups of 10, lower bound far above 0.1
      (7L, "s2", "z"), (8L, "s2", "z"), (9L, "s2", "z"), (10L, "s2", "z"),
      (11L, "s2", "z"), (12L, "s2", "z"), (13L, "s2", "z"), (14L, "s2", "z"),
      (15L, "s2", "z"), (16L, "s2", "z"))
    val r = graft.ext.Curation.dupRateWilson(d)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val s0 = r("s0")
    assert(s0.getAs[Long]("n_dups") == 2L && s0.getAs[Double]("dup_rate") == 0.5)
    assert(s0.getAs[Double]("ci_lo") > 0.1 && s0.getAs[Double]("ci_lo") < 0.5)
    assert(s0.getAs[Double]("ci_hi") > 0.5 && s0.getAs[Double]("ci_hi") < 0.9)
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_dups") == 0L)
    assert(s1.getAs[Double]("ci_lo") == 0.0,
      "Wilson lower bound at p-hat = 0 is exactly 0 (center == half)")
    assert(!s1.getAs[Boolean]("credibly_above"))
    val s2 = r("s2")
    assert(s2.getAs[Double]("dup_rate") == 0.9)
    assert(s2.getAs[Boolean]("credibly_above"),
      "9/10 dups must be credibly above a 10% threshold")
    // CI sanity on every row: lo <= rate <= hi, both inside [0, 1].
    r.values.foreach { row =>
      val (lo, p, hi) = (row.getAs[Double]("ci_lo"),
        row.getAs[Double]("dup_rate"), row.getAs[Double]("ci_hi"))
      assert(lo <= p && p <= hi && lo >= 0.0 && hi <= 1.0)
    }
  }
}
