package graft

import graft.ext.Pipeline
import graft.ops.{Bloom, Hll}
import org.apache.spark.sql.functions._

/** Algebra pins for the round-9 sketch/governance operators: the Bloom
  * ingest screen (x158), the k-anonymity audit (x159), and the
  * deterministic HLL (x160). The real-data paths are oracle-gated; these
  * fix the properties the gates can't see failing by value alone. */
class SketchGovernanceSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("bloom screen: no false negatives ever; misses are guaranteed-new") {
    val existing = docs((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
    val incoming = docs((10L, "alpha"), (11L, "beta"), (12L, "delta"),
      (13L, "epsilon"), (14L, "zeta"))
    val r = Bloom.screen(existing, incoming).orderBy("doc_id")
      .as[(Long, Int, Int)].collect().toSeq
    // Every exact duplicate MUST bloom-hit (the one-sided guarantee).
    r.filter(_._3 == 1).foreach { case (id, hit, _) =>
      assert(hit == 1, s"doc $id is an exact dup but the filter missed it")
    }
    assert(r.filter(_._3 == 1).map(_._1) === Seq(10L, 11L))
    // At 65536 bits over 3 docs, the non-dups must all miss (fp odds are
    // (12/65536)^4-ish — a hit here means the hashing broke).
    r.filter(_._3 == 0).foreach { case (id, hit, _) =>
      assert(hit == 0, s"doc $id false-positived against a near-empty filter")
    }
  }

  test("bloom screen: a saturated filter degrades to all-maybe, never to false negatives") {
    // 64 bits, k=4, 100 existing docs -> every bit set -> everything hits:
    // the honest saturation failure mode (fp rate 1), still zero false
    // negatives.
    val existing = docs((0L until 100L).map(i => i -> s"doc $i"): _*)
    val incoming = docs((200L, "doc 5"), (201L, "never seen"))
    val r = Bloom.screen(existing, incoming, mBits = 64, k = 4)
      .orderBy("doc_id").as[(Long, Int, Int)].collect().toSeq
    assert(r.map(_._2) === Seq(1, 1), "saturated filter must report maybe everywhere")
    assert(r.map(_._3) === Seq(1, 0))
    assertThrows[IllegalArgumentException] {
      Bloom.screen(existing, incoming, mBits = 100) // not a multiple of 64
    }
  }

  test("hll: multiset cardinality ignores duplication; small sets are near-exact") {
    val unique = (0 until 40).map(i => ("g", s"v$i")).toDF("source", "text")
    val duped = (0 until 40).flatMap(i => Seq.fill(5)(("g", s"v$i")))
      .toDF("source", "text")
    def est(df: org.apache.spark.sql.DataFrame): Double =
      Hll.cardinalityByGroup(df, "source", "text")
        .select("hll_estimate").as[Double].head()
    // THE sketch property: registers are max-based, so 5x duplication
    // cannot move the estimate by a single bit.
    assert(est(unique) === est(duped))
    // Linear-counting regime: 40 distinct over 64 buckets stays within
    // the sketch's expected error envelope.
    assert(math.abs(est(unique) - 40.0) / 40.0 <= 0.25,
      s"estimate ${est(unique)} too far from 40")
    assertThrows[IllegalArgumentException] {
      Hll.cardinalityByGroup(unique, "source", "text", m = 48)
    }
    // NULL values carry no hash: a NULL row must not plant a phantom
    // max-rank register (pre-fix: md5(NULL) landed rank 27 in a NULL
    // bucket, inflating n_buckets while countDistinct skipped it — the
    // estimate silently skewed against its own audit column).
    val withNulls = ((0 until 40).map(i => ("g", s"v$i")) ++
      Seq(("g", null: String), ("g", null: String)))
      .toDF("source", "text")
    assert(est(withNulls) === est(unique),
      "NULL rows must not move the HLL estimate")
    // An all-NULL group still appears (never silently dropped): the
    // empty sketch linear-counts to exactly 0, rel_error is NULL (0/0).
    val allNull = Seq(("z", null: String), ("z", null: String))
      .toDF("source", "text")
    val zr = Hll.cardinalityByGroup(allNull, "source", "text").head()
    assert(zr.getLong(3) === 0L && zr.getDouble(4) === 0.0 && zr.isNullAt(5))
    // A NULL GROUP with non-null values keeps its registers (null-safe
    // key match): pre-fix the equi-join orphaned them and reported a
    // confidently wrong hll_estimate 0 against a real n_exact.
    val nullGrp = (0 until 40).map(i => (null: String, s"v$i"))
      .toDF("source", "text")
    val ng = Hll.cardinalityByGroup(nullGrp, "source", "text").head()
    assert(ng.isNullAt(0) && ng.getLong(3) === 40L)
    assert(math.abs(ng.getDouble(4) - 40.0) / 40.0 <= 0.25,
      s"NULL group estimate ${ng.getDouble(4)} lost its registers")
    // mergeAudit shares the same kernel: NULLs change nothing there too.
    val ma = Hll.mergeAudit(withNulls, "text", col("text").isNull.cast("int"))
      .head()
    val mu = Hll.mergeAudit(unique, "text", lit(0)).head()
    assert(ma.getLong(0) === 0L)
    assert(ma.getDouble(4) === mu.getDouble(4),
      "NULL rows must not move the merge-audit estimate")
  }

  test("blocking quality: exact duplicates are always caught; ratios well-formed") {
    // Identical texts collide on every band, so with ground truth = the
    // duplicate pairs, pairs completeness is exactly 1; the two unrelated
    // docs shrink the reduction ratio below 1 without reaching 0.
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "completely different content about spark query planning"),
      (3L, "unrelated third text on parquet row group statistics"))
      .toDF("doc_id", "text")
    val r = graft.ext.Dedup.blockingQuality(d).head()
    assert(r.getLong(0) === 4L)                    // n_docs
    assert(r.getLong(1) >= 1L)                     // the dup pair is true
    assert(r.getDouble(4) === 1.0,
      s"exact duplicates must be fully caught, got ${r.getDouble(4)}")
    val rr = r.getDouble(5)
    assert(rr >= 0.0 && rr < 1.0, s"reduction ratio out of range: $rr")
    graft.ext.Dedup.clearCaches(spark)
  }

  test("x211 sampling-error contract: degenerate-sample law at the default " +
    "budget; at a small budget the exact completeness lies inside the 95% " +
    "CI and the reduction-ratio estimate tracks exact (all deterministic " +
    "— the stratified md5 sample has no RNG state)") {
    val docs = graft.io.Tables(spark, Sf).documents
    val exact = graft.ext.Dedup.blockingQuality(docs).head()
    // Degenerate-sample law: the default 64-docs/source budget covers the
    // whole sf0.001 corpus (25/source), so the estimator must EQUAL the
    // exact evaluator — completeness, counts, and ratio, CI width 0.
    val full = graft.ext.Dedup.blockingQualitySampled(docs).head()
    assert(full.getLong(1) == full.getLong(0), "budget must cover the corpus here")
    assert(full.getLong(2) == exact.getLong(1) && full.getLong(4) == exact.getLong(3),
      "degenerate sample must reproduce the exact true/caught counts")
    assert(full.getDouble(5) == exact.getDouble(4) &&
      full.getDouble(8) == exact.getDouble(5),
      "degenerate sample must reproduce the exact completeness and ratio")
    // Non-degenerate budget (8/source = 160 of 500 docs): CI containment.
    val s = graft.ext.Dedup.blockingQualitySampled(docs, perSourceCap = 8).head()
    assert(s.getLong(1) > 0 && s.getLong(1) < s.getLong(0),
      s"sample ${s.getLong(1)} of ${s.getLong(0)} docs is degenerate")
    assert(s.getLong(2) > 0, "no true pairs in the sample — CI is vacuous")
    val (lo, hi) = (s.getDouble(6), s.getDouble(7))
    val est = s.getDouble(5)
    assert(lo <= est && est <= hi && lo >= 0.0 && hi <= 1.0)
    val exactCompleteness = exact.getDouble(4)
    assert(exactCompleteness >= lo && exactCompleteness <= hi,
      s"exact completeness $exactCompleteness outside the CI [$lo, $hi] — " +
        "the sampled estimator's error contract is broken")
    // The reduction ratio is estimated on the sampled pair space; it
    // must track the exact full-corpus ratio closely (both are ~1 minus
    // a candidate density, and densities concentrate under the md5
    // doc sample). 0.02 absolute — loose enough to be stable, tight
    // enough to catch a wrong denominator or an unsampled side.
    assert(math.abs(s.getDouble(8) - exact.getDouble(5)) <= 0.02,
      s"estimated reduction ratio ${s.getDouble(8)} drifted from exact " +
        s"${exact.getDouble(5)}")
    graft.ext.Dedup.clearCaches(spark)
  }

  test("decayed activity: staircase decay only shrinks nonnegative value mass") {
    val r = graft.queries.Registry.queryMap("x161_decayed_activity")(spark, Sf)
      .select("user_id", "raw_value", "decayed_value").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (raw, dec) = (row.getDouble(1), row.getDouble(2))
      // Weights are in (0, 1]; with the corpus' nonnegative values the
      // decayed mass can never exceed the raw mass (beyond the 1e-6
      // per-event rounding grid).
      assert(dec <= raw + 1e-3, s"user ${row.getLong(0)}: decayed $dec > raw $raw")
      assert(dec >= 0.0)
    }
  }

  test("seasonality and inter-arrival: mass conservation and percentile ordering") {
    val season = graft.queries.Registry.queryMap("x163_event_seasonality")(spark, Sf)
    // Per type: dow cells sum back to the type total, contributions are
    // nonnegative, expectation is exactly total/7.
    val byType = season.groupBy("event_type")
      .agg(sum("n").as("sum_n"), max("total").as("total"),
        min("chi2_contrib").as("min_c"))
      .collect()
    assert(byType.nonEmpty)
    byType.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"${r.getString(0)}: dow cells lost mass")
      assert(r.getDouble(3) >= 0.0)
    }
    val ia = graft.queries.Registry.queryMap("x164_interarrival_percentiles")(spark, Sf)
      .collect()
    assert(ia.nonEmpty)
    ia.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 >= 0.0 && p50 <= p90 && p90 <= p99,
        s"${r.getString(0)}: percentiles out of order ($p50, $p90, $p99)")
    }
  }

  test("markov stationary: probability mass conserved within truncation envelope") {
    val pi = graft.queries.Registry.queryMap("x166_markov_stationary")(spark, Sf)
      .select("pi_fp").as[Long].collect()
    assert(pi.nonEmpty && pi.forall(_ >= 0))
    val mass = pi.sum
    // Each of 3 rounds loses < (#states × #edges-per-state) fixed-point
    // units to div truncation, never gains: mass stays in (0.99e6, 1e6].
    assert(mass <= 1000000L, s"mass grew: $mass")
    assert(mass > 990000L, s"mass lost beyond truncation envelope: $mass")
  }

  test("l-diversity: homogeneous classes flagged, mixed classes pass") {
    val rows = Seq(
      ("a", 1, -5.0), ("a", 1, 3.0),   // mixed signs -> diverse
      ("b", 1, 2.0), ("b", 1, 4.0))    // all credit -> homogeneous
      .toDF("seg", "nat", "bal")
    val r = Pipeline.lDiversityAudit(rows, "seg", "nat",
        when(col("bal") < 0, "debit").otherwise("credit"), 2)
      .orderBy("seg").as[(String, Int, Long, Long, Int)].collect().toSeq
    assert(r === Seq(("a", 1, 2L, 2L, 1), ("b", 1, 2L, 1L, 0)))
  }

  test("winnowing: the shared-substring guarantee and duplicate coverage hold") {
    // Papers' guarantee: a shared run of >= window + gramLen - 1 = 8
    // tokens elects at least one COMMON fingerprint in both documents,
    // whatever surrounds it.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"intro words here then $shared and more trailing text follows now"),
      (2L, s"completely other opening $shared closing remarks differ entirely here too"),
      (3L, "no overlap with anything else at all in this document right here"))
      .toDF("doc_id", "text")
    val fp = graft.ext.Dedup.winnowedFingerprints(d)
      .select("doc_id", "h").as[(Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "8-token shared run must elect a common fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty &&
      (byDoc(2L) intersect byDoc(3L)).isEmpty,
      "disjoint texts must share nothing")
    // Exact duplicates elect identical fingerprint sets, so the pair
    // surfaces with maximal evidence.
    val dup = Seq((1L, shared + " one two three"), (2L, shared + " one two three"))
      .toDF("doc_id", "text")
    val fps = graft.ext.Dedup.winnowedFingerprints(dup)
      .select("doc_id", "h").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L) === fps(2L), "identical docs must elect identical fingerprints")
  }

  test("winnowing giant-doc prefix law: an over-limit doc fingerprints its " +
    "prefix instead of vanishing (pinned at a tiny maxGrams)") {
    // 16 tokens -> 12 grams; cap at 6 grams. The capped fingerprints must
    // equal the fingerprints of the doc TRUNCATED to its first
    // maxGrams + gramLen - 1 = 10 tokens — and must be non-empty: before
    // round 12 an over-limit doc silently emitted NO fingerprints and so
    // escaped winnowing dedup entirely.
    val toks = (1 to 16).map(i => s"w$i")
    val full = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val trunc = Seq((1L, toks.take(10).mkString(" "))).toDF("doc_id", "text")
    def fps(df: org.apache.spark.sql.DataFrame, cap: Int) =
      graft.ext.Dedup.winnowedFingerprints(df, maxGrams = cap)
        .as[(Long, Long, Long)].collect().toSet
    val capped = fps(full, 6)
    assert(capped.nonEmpty, "over-limit doc must still emit prefix fingerprints")
    assert(capped === fps(trunc, 1048575),
      "capped fingerprints must equal the truncated doc's fingerprints")
    // Under the ceiling cap the same doc fingerprints in full — the cap
    // only ever shortens, never changes, the election.
    assert(fps(full, 1048575).size >= capped.size)
  }

  test("x211 Wilson bounds: non-degenerate at p-hat = 1 and tiny n (the Wald " +
    "interval collapsed to zero width exactly where the estimate is weakest)") {
    // One true pair (the identical docs), caught by every band -> p-hat
    // = 1 with n_true_s = 1: Wald said [1, 1] ("certainty" from a single
    // Bernoulli draw); Wilson must keep the upper bound AT 1 but pull
    // the lower bound to 1/(1 + z^2/n) - adjacent mass, well below 1.
    val d = Seq(
      (0L, "web", "the quick brown fox jumps over the lazy dog again"),
      (1L, "web", "the quick brown fox jumps over the lazy dog again"),
      (2L, "web", "completely different content about spark query planning"),
      (3L, "web", "unrelated third text on parquet row group statistics"))
      .toDF("doc_id", "source", "text")
    val r = graft.ext.Dedup.blockingQualitySampled(d).head()
    assert(r.getLong(2) === 1L, "fixture must yield exactly one true pair")
    assert(r.getDouble(5) === 1.0, "the exact-dup pair is always caught")
    assert(r.getDouble(7) === 1.0, "Wilson upper bound is exactly 1 at p-hat = 1")
    assert(r.getDouble(6) < 0.9 && r.getDouble(6) > 0.0,
      s"Wilson lower bound must price n=1 honestly, got ${r.getDouble(6)}")
    // Closed form at n=1, p-hat=1: lo = center - hw with z^2 = 3.8416.
    val z2 = 3.8416
    val lo = (1.0 + z2 / 2.0) / (1.0 + z2) - 1.96 * math.sqrt(z2 / 4.0) / (1.0 + z2)
    assert(math.abs(r.getDouble(6) - lo) < 1e-12,
      s"lower bound ${r.getDouble(6)} != closed-form Wilson $lo")
    graft.ext.Dedup.clearCaches(spark)
  }

  test("rendezvous sharding: total partition; resize moves keys only TO new shards") {
    val keys = (0L until 200L).toDF("doc_id")
    val a16 = graft.ops.Sharding.assign(keys, "doc_id", 16)
      .as[(Long, Int)].collect().toMap
    val a20 = graft.ops.Sharding.assign(keys, "doc_id", 20)
      .as[(Long, Int)].collect().toMap
    assert(a16.size === 200 && a20.size === 200, "assignment must be total")
    assert(a16.values.forall(s => s >= 0 && s < 16))
    assert(a20.values.forall(s => s >= 0 && s < 20))
    // THE consistency property: the 0..15 argmax is unchanged unless a
    // NEW shard (16..19) wins the rendezvous — no key ever moves between
    // surviving shards.
    keys.as[Long].collect().foreach { k =>
      if (a16(k) != a20(k))
        assert(a20(k) >= 16, s"key $k moved between surviving shards: ${a16(k)} -> ${a20(k)}")
    }
    val audit = graft.ops.Sharding.resizeMovement(keys, "doc_id", 16, 20).head()
    assert(audit.getDouble(3) < audit.getDouble(4),
      s"HRW must move fewer keys than modulo: ${audit.getDouble(3)} vs ${audit.getDouble(4)}")
    // A non-integral key must FAIL the modulo-baseline audit at plan
    // time: 'user-1' % 16 implicit-casts to NULL and the audit would
    // silently claim modulo sharding moves nothing.
    val strKeys = Seq("user-1", "user-2").toDF("uid")
    assertThrows[IllegalArgumentException] {
      graft.ops.Sharding.resizeMovement(strKeys, "uid", 16, 20)
    }
  }

  test("zipf slope: a true Zipfian corpus fits slope -1 with high r2; uniform text does not") {
    // Token t_i appears floor(600/i) times -> frequencies follow 1/rank.
    val zipfText = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"t$i")).mkString(" ")
    val uniformText = (1 to 30).flatMap(i => Seq.fill(20)(s"u$i")).mkString(" ")
    val d = Seq(("zipf", 1L, zipfText), ("flat", 2L, uniformText))
      .toDF("source", "doc_id", "text")
    val rows = graft.ext.TextAnalysis.zipfSlopeBySource(d, 30)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(2), if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    val (zs, zr2) = rows("zipf")
    assert(math.abs(zs + 1.0) < 0.1, s"Zipfian fixture slope $zs should be near -1")
    assert(zr2.exists(_ > 0.95), s"Zipfian fixture r2 $zr2 should be high")
    val (fs, fr2) = rows("flat")
    assert(fs === 0.0, s"zero-variance fixture slope $fs should be exactly 0")
    assert(fr2.isEmpty, "zero y-variance must yield NULL r2 (3VL), not a number")
  }

  test("event paths and daily autocorrelation: mass accounting and bounds") {
    val ev = graft.io.Tables(spark, Sf).events
    // Every user with k >= 3 events contributes exactly k-2 three-step
    // paths; the top-20 table must respect that total.
    val expected = ev.groupBy("user_id").count()
      .filter(col("count") >= 3)
      .agg(sum(col("count") - 2)).head().getLong(0)
    val paths = graft.queries.Registry.queryMap("x170_event_paths")(spark, Sf)
      .collect()
    assert(paths.nonEmpty && paths.length <= 20)
    assert(paths.map(_.getLong(2)).sum <= expected,
      "top-20 path mass cannot exceed the total path count")
    assert(paths.map(_.getLong(0)).toSeq === (1L to paths.length))
    val ac = graft.queries.Registry.queryMap("x171_daily_autocorrelation")(spark, Sf)
      .head()
    if (!ac.isNullAt(3))
      assert(math.abs(ac.getDouble(3)) <= 1.0 + 1e-12,
        s"autocorrelation ${ac.getDouble(3)} outside [-1, 1]")
  }

  test("k-anonymity audit: exact class accounting on a hand-built table") {
    // QI (seg, nat): classes (a,1)x4, (a,2)x1, (b,1)x2 -> 7 rows.
    val rows = (Seq.fill(4)(("a", 1)) ++ Seq(("a", 2)) ++ Seq.fill(2)(("b", 1)))
      .toDF("seg", "nat")
    val r = Pipeline.kAnonymityAudit(rows, "seg", "nat", k = 3)
      .orderBy("qi_level")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // Level nat: classes {1}x6, {2}x1 -> 1 class below k with 1 row.
    // Level seg: {a}x5, {b}x2 -> class b below k (2 rows).
    // Level seg+nat: sizes 4,1,2 -> below-k rows = 1+2 = 3.
    assert(r === Seq(
      ("nat", 2L, 1L, 1L, 7L, 1.0 / 7.0),
      ("seg", 2L, 2L, 2L, 7L, 2.0 / 7.0),
      ("seg+nat", 3L, 1L, 3L, 7L, 3.0 / 7.0)))
    // Generalizing (dropping a QI) can only merge classes: suppression at
    // a single-QI level never exceeds the two-QI level's.
    val byLevel = r.map(x => x._1 -> x._6).toMap
    assert(byLevel("nat") <= byLevel("seg+nat") && byLevel("seg") <= byLevel("seg+nat"))
  }
}
