package graft

import graft.ops.Kmv
import org.apache.spark.sql.functions._

/** Algebra pins for the round-13 batch. The real-data paths are
  * oracle-gated (x214+); these fix the properties the value gates can't
  * see failing on their own data.
  */
class Batch13Spec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  test("kmv: degenerate law — k >= vocabulary makes every estimate exact") {
    // 3 sources, tiny vocabularies, k far above any sketch: the
    // unsaturated branch must return EXACT unions and intersections.
    val d = docs(
      (0L, "a", "red green blue red green"),
      (1L, "a", "blue yellow red blue"),
      (2L, "b", "red green blue yellow pink"),
      (3L, "c", "one two three four"))
    val r = Kmv.intersectionBySource(d, k = 1024)
      .orderBy("source_a", "source_b")
      .select("source_a", "source_b", "union_est", "inter_est", "inter_exact",
        "n_exact_a", "n_exact_b", "n_union_sketch")
      .collect()
    r.foreach { row =>
      val (uEst, iEst, iEx) = (row.getDouble(2), row.getDouble(3), row.getLong(4))
      val (na, nb, nu) = (row.getLong(5), row.getLong(6), row.getLong(7))
      assert(uEst == nu.toDouble, s"unsaturated union must be exact: $row")
      assert(uEst == (na + nb - iEx).toDouble,
        s"inclusion-exclusion must hold exactly when unsaturated: $row")
      assert(iEst == iEx.toDouble,
        s"unsaturated intersection must equal the exact count: $row")
    }
    // Disjoint pair (a,c)/(b,c): zero intersection, NULL rel_error (3VL).
    val ac = Kmv.intersectionBySource(d, k = 1024)
      .filter(col("source_b") === "c").select("inter_exact", "rel_error").collect()
    assert(ac.nonEmpty)
    ac.foreach { row =>
      assert(row.getLong(0) == 0L)
      assert(row.isNullAt(1), "rel_error on a zero intersection must be NULL")
    }
  }

  test("kmv: BottomK is a distinct bottom-k — duplicates never double, " +
    "merge composes like a union of sets") {
    val agg = Kmv.BottomK(4)
    // reduce: insert out of order, with duplicates, past capacity.
    val b = Seq(9L, 3L, 9L, 7L, 1L, 5L, 3L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(b == Seq(1L, 2L, 3L, 5L), s"buffer was $b")
    // merge = bottom-k of the union of the two sketch SETS.
    val b2 = Seq(4L, 1L, 8L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, b2) == Seq(1L, 2L, 3L, 4L))
    assert(agg.merge(b2, b) == agg.merge(b, b2), "merge must be symmetric")
    // full-buffer fast path: an element above the cutoff changes nothing.
    assert(agg.reduce(b, 99L) eq b)
  }

  test("kmv: sketch composition — bottom-k of a union is computable from " +
    "the two sides' bottom-k sketches") {
    // The property intersectionBySource's pair algebra relies on: every
    // one of the k smallest of A ∪ B is in bottom-k(A) or bottom-k(B).
    val k = 8
    val a = (1 to 100).map(_ * 3L)   // multiples of 3
    val b = (1 to 100).map(_ * 5L)   // multiples of 5
    val agg = Kmv.BottomK(k)
    val skA = a.foldLeft(agg.zero)(agg.reduce)
    val skB = b.foldLeft(agg.zero)(agg.reduce)
    val direct = (a ++ b).distinct.sorted.take(k)
    assert(agg.merge(skA, skB) == direct,
      "composed sketch must equal the direct bottom-k of the union")
  }

  test("unimax: degenerate law — a budget above total capacity caps every " +
    "group and never invents tokens") {
    val d = docs(
      (0L, "a", "one two three"),
      (1L, "b", "four five"),
      (2L, "c", "six"))
      .withColumn("lang", col("source")).drop("source")
    // budget = 10x tokens, cap 2: capacity 2n < budget for everyone.
    val r = graft.ext.Pipeline.unimaxAllocate(d, "lang", epochCap = 2,
      budgetNum = 10, budgetDen = 1).orderBy("lang").collect()
    r.foreach { row =>
      assert(row.getAs[Boolean]("capped"), s"all groups must cap: $row")
      assert(row.getAs[Double]("alloc_tokens")
        == row.getAs[Long]("capacity_tokens").toDouble)
      assert(row.getAs[Double]("epochs") == 2.0)
    }
  }

  test("unimax: conservation and fairness — allocations spend exactly the " +
    "budget when any group is uncapped, and no uncapped group gets less " +
    "than a capped one's capacity") {
    val d = docs(
      (0L, "lo", "one two"),                                    // 2 tokens
      (1L, "mid", "one two three four five six"),               // 6 tokens
      (2L, "hi", ("w " * 40).trim))                             // 40 tokens
      .withColumn("lang", col("source")).drop("source")
    // tokens: 48 total; budget = 48*16 div 10 = 76; capacities 4/12/80.
    // f: 4*3+0=12<=76 capped; 12*2+4=28<=76 capped; 80+16=96>76 uncapped.
    val r = graft.ext.Pipeline.unimaxAllocate(d, "lang").orderBy("rank").collect()
    val allocs = r.map(_.getAs[Double]("alloc_tokens"))
    assert(r.map(_.getAs[Boolean]("capped")).toSeq == Seq(true, true, false))
    assert(allocs.sum == 76.0, "uncapped share must spend the budget exactly")
    assert(allocs.toSeq == Seq(4.0, 12.0, 60.0))
    // epochs ordering: capped groups at the cap, uncapped strictly below.
    assert(r.last.getAs[Double]("epochs") == 1.5)
  }

  test("mann-whitney: a planted length shift is detected; identical " +
    "distributions are not; zero variance yields NULL z") {
    // 'long' docs have 9-11 tokens, everything else 2-4: a hard shift.
    val shifted = docs(
      ((0L until 12L).map(i => (i, "long", ("w " * (9 + (i % 3).toInt)).trim)) ++
        (100L until 124L).map(i => (i, s"base${i % 2}", ("w " * (2 + (i % 3).toInt)).trim)))
        .toSeq: _*)
    val r = graft.ext.Curation.mannWhitneyBySource(shifted)
      .orderBy("source").collect()
    val long = r.find(_.getString(0) == "long").get
    assert(long.getAs[Double]("auc") == 1.0, "disjoint ranges mean AUC 1")
    assert(long.getAs[Double]("z") > 1.96 && long.getAs[Boolean]("significant"))
    // One-vs-rest means the planted group sits in everyone else's "rest":
    // the base sources are legitimately shifted BELOW their rest.
    r.filter(_.getString(0).startsWith("base")).foreach { row =>
      assert(row.getAs[Double]("auc") < 0.5, s"base must rank low: $row")
    }
    // A corpus where every source draws the same values: no false alarms.
    val same = docs((0L until 48L).map(i =>
      (i, s"s${i % 4}", ("w " * (2 + (i % 3).toInt)).trim)).toSeq: _*)
    graft.ext.Curation.mannWhitneyBySource(same).collect().foreach { row =>
      assert(!row.getAs[Boolean]("significant"), s"false positive: $row")
      assert(row.getAs[Double]("auc") == 0.5,
        s"identical per-source value multisets must tie exactly: $row")
    }
    // All docs the same length: sigma = 0, z NULL (3VL), not a crash.
    val flat = docs((0L, "a", "x y"), (1L, "a", "p q"), (2L, "b", "r s"))
    val fr = graft.ext.Curation.mannWhitneyBySource(flat).collect()
    fr.foreach { row =>
      assert(row.isNullAt(row.fieldIndex("z")), s"sigma=0 must yield NULL z: $row")
    }
  }

  test("t-closeness: a class whose sensitive distribution mirrors the " +
    "global one passes with EMD 0; a concentrated class violates t") {
    import graft.ext.Pipeline
    // Levels are cents div 100000 after a +100000000 shift. Build three
    // classes over two levels: 'bal' mirrors the global 50/50 exactly
    // once the skewed classes are included; 'lo'/'hi' sit entirely in
    // one level each.
    val rows = (
      (0 until 10).map(i => ("bal", if (i < 5) 0L else 100000L)) ++
        (0 until 10).map(_ => ("lo", 0L)) ++
        (0 until 10).map(_ => ("hi", 100000L))
      ).toDF("cls", "cents")
    val r = Pipeline.tClosenessAudit(rows, "cls", col("cents"))
      .orderBy("cls").collect()
    val byCls = r.map(row => row.getString(0) -> row).toMap
    // Global: 15/15 across two levels. 'bal' is 5/5 -> EMD 0.
    assert(byCls("bal").getAs[Double]("emd") == 0.0)
    assert(byCls("bal").getAs[Boolean]("t_ok"))
    // 'lo' is 10/0 vs global 0.5/0.5: cumdiff at level 1 is 0.5,
    // EMD = 0.5/(v-1) = 0.5 > 0.2 -> violation. Symmetric for 'hi'.
    assert(byCls("lo").getAs[Double]("emd") == 0.5)
    assert(!byCls("lo").getAs[Boolean]("t_ok"))
    assert(byCls("hi").getAs[Double]("emd") == 0.5)
    assert(!byCls("hi").getAs[Boolean]("t_ok"))
    // Single-level degenerate law: identical by construction, EMD 0.
    val one = Seq(("a", 0L), ("b", 50L)).toDF("cls", "cents")
    Pipeline.tClosenessAudit(one, "cls", col("cents")).collect().foreach { row =>
      assert(row.getAs[Double]("emd") == 0.0 && row.getAs[Boolean]("t_ok"),
        s"single level must be EMD 0: $row")
    }
  }

  test("kruskal-wallis: two groups reduce to the Mann-Whitney z (H = z^2); " +
    "zero variance yields NULL") {
    // Disjoint length ranges across two sources: both tests see the
    // same pooled ranks, so the chi-square(1) omnibus must equal the
    // squared normal deviate up to the 1e-6 snapping grid.
    val two = docs(
      ((0L until 12L).map(i => (i, "a", ("w " * (9 + (i % 3).toInt)).trim)) ++
        (100L until 112L).map(i => (i, "b", ("w " * (2 + (i % 3).toInt)).trim)))
        .toSeq: _*)
    val h = graft.ext.Curation.kruskalWallis(two).collect()(0)
    val z = graft.ext.Curation.mannWhitneyBySource(two)
      .filter(col("source") === "a").collect()(0).getAs[Double]("z")
    assert(h.getAs[Long]("df") == 1L)
    assert(math.abs(h.getAs[Double]("h_corrected") - z * z) < 1e-4,
      s"H(2 groups) must equal z^2: H=${h.getAs[Double]("h_corrected")} z=$z")
    // All docs the same length: the tie correction hits 0, H has no
    // honest value -> NULL, not a division blowup.
    val flat = docs((0L, "a", "x y"), (1L, "b", "p q"), (2L, "b", "r s"))
    val fr = graft.ext.Curation.kruskalWallis(flat).collect()(0)
    assert(fr.isNullAt(fr.fieldIndex("h_corrected")))
    assert(fr.isNullAt(fr.fieldIndex("epsilon_sq")))
  }

  test("property: BottomK equals distinct.sorted.take(k) on seeded random " +
    "streams for any insertion order and any merge split") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(12)
      val agg = graft.ops.Kmv.BottomK(k)
      // duplicates, adversarial orders, values clustered near each other
      val xs = Vector.fill(80 + rnd.nextInt(120))(rnd.nextInt(60).toLong)
      val expect = xs.distinct.sorted.take(k)
      assert(xs.foldLeft(agg.zero)(agg.reduce) == expect,
        s"seed $seed k=$k sequential fold diverged")
      // any split point: merge(fold(left), fold(right)) == direct
      val cut = rnd.nextInt(xs.size)
      val (l, r) = xs.splitAt(cut)
      assert(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)) == expect,
        s"seed $seed k=$k split-at-$cut merge diverged")
    }
  }

  test("property: unimax conservation laws hold on seeded random count " +
    "tables — alloc <= capacity everywhere, budget spent exactly when " +
    "any group is uncapped, never overspent otherwise") {
    import graft.ext.Pipeline
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val m = 2 + rnd.nextInt(8)
      val counts = (0 until m).map(i =>
        (s"g$i", 1L + rnd.nextInt(5).toLong, 10L + rnd.nextInt(5000).toLong))
        .toDF("grp", "n_docs", "n_tokens")
      val cap = 1 + rnd.nextInt(3)
      val r = Pipeline.unimaxFromCounts(counts, "grp", cap,
        budgetNum = 1 + rnd.nextInt(30), budgetDen = 10).collect()
      val budget = r.head.getAs[Long]("budget_tokens")
      val allocs = r.map(_.getAs[Double]("alloc_tokens"))
      r.foreach { row =>
        assert(row.getAs[Double]("alloc_tokens")
          <= row.getAs[Long]("capacity_tokens") + 1e-6,
          s"seed $seed: alloc above capacity: $row")
        assert(row.getAs[Double]("epochs") <= cap + 1e-9,
          s"seed $seed: epochs above cap: $row")
      }
      val anyUncapped = r.exists(!_.getAs[Boolean]("capped"))
      if (anyUncapped)
        assert(math.abs(allocs.sum - budget) < 1e-3,
          s"seed $seed: uncapped run must spend the budget: ${allocs.sum} vs $budget")
      else
        assert(allocs.sum <= budget + 1e-6,
          s"seed $seed: all-capped run overspent: ${allocs.sum} vs $budget")
    }
  }

  test("js divergence: disjoint vocabularies hit ln 2 exactly; identical " +
    "usage is ~0; everything stays inside [0, ln 2]") {
    val d = docs(
      (0L, "a", "x y x y z"), (1L, "a", "x y z z"),
      (2L, "b", "x y x y z x y z z"),            // b == 'a' pooled: same dist
      (3L, "c", "p q r p q r"))                  // disjoint from everyone
    val r = graft.ext.TextAnalysis.jsDivergenceMatrix(d)
      .orderBy("source_a", "source_b").collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getAs[Double]("js_divergence"))).toMap
    val ln2 = 0.6931471805599453
    // a and b have IDENTICAL unigram distributions -> correction cancels
    // to ~0 (within the 1e-12 grid per shared word).
    assert(math.abs(r(("a", "b"))._2) < 1e-9, s"identical dists: ${r(("a", "b"))}")
    // c shares nothing: zero shared vocab, JS = ln 2 by the grid fill.
    assert(r(("a", "c"))._1 == 0L && r(("a", "c"))._2 == ln2)
    assert(r(("b", "c"))._2 == ln2)
    // The 1e-9 ln grid can dip a few 1e-10 below 0 on identical
    // distributions (each snapped ln deviates by <= 5e-10 and the true
    // value is exactly 0) — the bound is [0 - grid slack, ln 2].
    r.values.foreach { case (_, js) =>
      assert(js >= -1e-8 && js <= ln2 + 1e-9, s"JS out of [0, ln2]: $js")
    }
  }

  test("resizeNearest: identity resize is byte-identical; 1x1 picks the " +
    "top-left source pixel; upscale replicates, never invents") {
    import graft.ext.Multimodal
    val rgb = Array.tabulate(4 * 4 * 3)(i => (i * 7 % 251).toByte)
    val img = Multimodal.RasterImage(4, 4, 255, rgb)
    assert(Multimodal.resizeNearest(img, 4, 4).rgb.toSeq == rgb.toSeq,
      "identity resize must copy bytes")
    val one = Multimodal.resizeNearest(img, 1, 1)
    assert(one.rgb.toSeq == rgb.take(3).toSeq, "1x1 is the (0,0) pixel")
    // 2x upscale: every target pixel must be SOME source pixel (NN never
    // interpolates), and the floor mapping means each source pixel
    // appears exactly 4 times.
    val up = Multimodal.resizeNearest(img, 8, 8)
    val srcPixels = rgb.grouped(3).map(_.toSeq).toSet
    val upPixels = up.rgb.grouped(3).map(_.toSeq).toVector
    assert(upPixels.forall(srcPixels.contains), "NN must never invent a pixel")
    assert(upPixels.groupBy(identity).values.forall(_.size % 4 == 0))
  }

  test("rbo: a source matching the corpus head scores exactly 1; a " +
    "disjoint head scores 0; agreement at depth 1 outweighs deep ties") {
    import graft.ext.TextAnalysis
    // 'dom' dominates the corpus, so its own ranking IS the corpus
    // ranking; 'alien' shares no token with the corpus head.
    val d = docs(
      (0L, "dom", Seq.fill(40)("aa").mkString(" ") + " " +
        Seq.fill(20)("bb").mkString(" ") + " " + Seq.fill(10)("cc").mkString(" ")),
      (1L, "alien", "zz yy xx zz yy zz"))
    val r = TextAnalysis.rboHeadVocab(d, depth = 3).collect()
      .map(row => row.getString(0) -> row.getAs[Double]("rbo_norm")).toMap
    assert(r("dom") == 1.0, s"corpus-identical head must score exactly 1: $r")
    // 'alien' tokens rank 4-6 in the corpus (counts 3,2,1 < cc/bb/aa):
    // outside the depth-3 corpus head -> zero overlap at every depth.
    assert(r("alien") == 0.0, s"disjoint head must score 0: $r")
  }

  test("ams f2: all-distinct corpus has F2 = N exactly; the estimator " +
    "stays within the median-of-means envelope on seeded corpora") {
    // Every token unique: c = 1 everywhere, so F2 = n_tokens exactly.
    val uniq = docs((0L until 20L).map(i =>
      (i, s"s${i % 2}", (0 until 5).map(j => s"u${i}_$j").mkString(" "))).toSeq: _*)
    val r0 = graft.ext.Frequent.amsF2(uniq).collect()(0)
    assert(r0.getAs[Long]("f2_exact") == r0.getAs[Long]("n_tokens"))
    // Seeded skewed corpora: the deterministic hash draw must land
    // within 1.5x of exact (6 sigma of the 32-estimator group mean) —
    // fixed hashes make this a stable regression pin, not a flake.
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val d = docs((0L until 60L).map { i =>
        val n = 1 + rnd.nextInt(20)
        (i, s"s${i % 3}",
          Seq.fill(n)(s"w${rnd.nextInt(1 + rnd.nextInt(15))}").mkString(" "))
      }.toSeq: _*)
      val r = graft.ext.Frequent.amsF2(d).collect()(0)
      val (ex, est) = (r.getAs[Long]("f2_exact").toDouble,
        r.getAs[Double]("f2_est"))
      assert(est > 0 && math.abs(est - ex) / ex < 1.5,
        s"seed $seed: est $est vs exact $ex outside the envelope")
    }
  }

  test("frame container: round-trips byte-exactly; crafted counts and " +
    "lengths fail loudly before any allocation") {
    import graft.ext.Multimodal
    val frames = (0 until 3).map { f =>
      Multimodal.RasterImage(2, 2, 255,
        Array.tabulate(12)(i => ((i + f * 13) % 251).toByte))
    }
    val bytes = Multimodal.encodeFrames(frames)
    val back = Multimodal.decodeFrameSlices(bytes).map(Multimodal.decodePpm)
    assert(back.size == 3)
    back.zip(frames).foreach { case (a, b) =>
      assert(a.rgb.toSeq == b.rgb.toSeq, "container round-trip must be exact")
    }
    // Crafted frame count far beyond the payload: loud failure, no OOM.
    val evil = bytes.clone()
    evil(4) = 0x7f.toByte // count high byte -> ~2^31 frames
    intercept[IllegalArgumentException](Multimodal.decodeFrameSlices(evil))
    // Truncated mid-frame: loud failure.
    intercept[IllegalArgumentException](
      Multimodal.decodeFrameSlices(bytes.take(bytes.length - 5)))
    // Wrong magic: loud failure.
    val m = bytes.clone(); m(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeFrameSlices(m))
  }

  test("kmv merge audit: shard sketches merge losslessly even when one " +
    "shard owns every small hash, and the unsaturated estimate is exact") {
    // 40 docs with heavily shared vocabulary across 4 shards (doc_id%8
    // folds them to 8 shard keys): whatever the hash distribution, the
    // merged bottom-k must equal the direct bottom-k — the property is
    // algebraic, so 0 mismatches ALWAYS, not just on friendly splits.
    val d = docs((0L until 40L).map(i =>
      (i, s"s${i % 3}", (0 until 6).map(j => s"t${(i + j) % 25}").mkString(" "))).toSeq: _*)
    val r = graft.ops.Kmv.mergeAudit(d, nShards = 8, k = 16).collect()(0)
    assert(r.getAs[Long]("n_mismatch") == 0L, s"merge must be lossless: $r")
    assert(r.getAs[Long]("n_sketch") == 16L, "25 distinct bigrams saturate k=16")
    // Unsaturated branch: k above the vocabulary -> estimate == exact.
    val r2 = graft.ops.Kmv.mergeAudit(d, nShards = 8, k = 1024).collect()(0)
    assert(r2.getAs[Long]("n_mismatch") == 0L)
    assert(r2.getAs[Double]("union_estimate") == r2.getAs[Long]("n_exact").toDouble)
    assert(r2.getAs[Double]("rel_error") == 0.0)
  }
}
