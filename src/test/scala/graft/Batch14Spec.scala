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
}
