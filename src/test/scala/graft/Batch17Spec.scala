package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Algebra pins for the round-17 incremental LSH dedup: the incremental
  * run is EQUAL to the full recompute (the x242/x229 fold-law
  * convention, here for the dedup family), the verdict policy is pinned
  * on constructed corpora (corpus canon wins over a stronger same-batch
  * match; first-occurrence-wins within the batch; kept docs carry NULL
  * matches), the persisted-index entry point is the same operator, and
  * the id-collision guard raises. Real-data paths stay oracle-gated
  * (x251).
  */
class Batch17Spec extends SparkSuite {
  import spark.implicits._

  private val Cap = queries.Extensions.LshBucketCap

  test("incremental law: verdicts over the sf0.001 split are exactly " +
    "what lshDedupPairs(corpus ∪ delta) implies — same pairs, same " +
    "jaccards, same policy (the full-recompute equality)") {
    val docs = io.Tables(spark, Sf).documents
    val u = ext.Pipeline.saltedUniform(col("doc_id"), "incr|")
    val corpus = docs.filter(u >= 0.25)
    val delta = docs.filter(u < 0.25)
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet

    // The full recompute over the union IS docs (the split partitions it).
    val full = Dedup.lshDedupPairs(docs, 0.3, bucketCap = Cap)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    // Each pair, oriented from every delta doc it verdicts: corpus
    // partners always count; delta partners only when LOWER-id.
    val matches = full
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .filter { case (me, other, _) =>
        deltaIds(me) && (!deltaIds(other) || other < me) }
      .groupBy(_._1)

    val expected = deltaIds.map { id =>
      matches.get(id) match {
        case None => (id, "kept", None, None, 0L)
        case Some(ms) =>
          val best = ms.minBy { case (_, other, j) =>
            (if (deltaIds(other)) 1 else 0, -j, other) }
          val verdict = if (deltaIds(best._2)) "dup_delta" else "dup_corpus"
          (id, verdict, Some(best._2), Some(best._3), ms.length.toLong)
      }
    }

    val got = Dedup.incrementalLshDedup(corpus, delta, 0.3, bucketCap = Cap)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("best_match_id")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("best_jaccard")).map(_.toDouble),
        r.getAs[Long]("n_matches")))
      .toSet
    assert(got == expected,
      s"incremental != full recompute:\n got ${got.toSeq.sortBy(_._1)}\n " +
        s"exp ${expected.toSeq.sortBy(_._1)}")
    assert(got.exists(_._2 != "kept"), "degenerate law: no dup verdicts")
  }

  private def d(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("verdict policy: corpus canon wins over a STRONGER same-batch " +
    "match; first occurrence wins within the batch; kept docs carry " +
    "NULL matches and n_matches 0") {
    val corpus = d(1L -> "alpha beta gamma delta epsilon zeta eta theta")
    val delta = d(
      101L -> "alpha beta gamma delta epsilon zeta pi rho",
      102L -> "alpha beta gamma delta epsilon zeta pi rho", // = 101
      103L -> "totally unrelated words sharing nothing whatsoever")
    val got = Dedup.incrementalLshDedup(corpus, delta, 0.3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("best_match_id")).map(_.toLong),
          r.getAs[Long]("n_matches"))))
      .toMap
    // 101 matches only corpus 1 (5 of 7+7 bigrams shared: j = 5/9).
    assert(got(101L) == (("dup_corpus", Some(1L), 1L)))
    // 102 matches corpus 1 at 5/9 AND its identical twin 101 at 1.0 —
    // the corpus match wins despite the lower jaccard.
    assert(got(102L)._1 == "dup_corpus" && got(102L)._2 == Some(1L))
    assert(got(102L)._3 == 2L, "both matches audited in n_matches")
    // 103 matches nothing.
    assert(got(103L) == (("kept", None, 0L)))
  }

  test("verdict policy: a doc matching only a REJECTED earlier batch " +
    "doc is still dropped (pair-level, not transitive — the " +
    "conservative hygiene choice the scaladoc documents)") {
    val corpus = d(1L -> "alpha beta gamma delta epsilon zeta eta theta")
    val delta = d(
      101L -> "alpha beta gamma delta epsilon zeta eta theta", // = corpus 1
      102L -> "alpha beta gamma delta epsilon zeta eta theta") // = 101
    val got = Dedup.incrementalLshDedup(corpus, delta, 0.3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
      .toMap
    assert(got(101L) == "dup_corpus")
    assert(got(102L) == "dup_corpus",
      "identical to corpus too — corpus wins over the delta twin")
  }

  test("the persisted-index entry point (corpusIndex passed explicitly) " +
    "is the same operator — byte-identical verdicts") {
    val docs = io.Tables(spark, Sf).documents
    val u = ext.Pipeline.saltedUniform(col("doc_id"), "incr|")
    val corpus = docs.filter(u >= 0.25)
    val delta = docs.filter(u < 0.25)
    val derived = Dedup.incrementalLshDedup(corpus, delta, 0.3, Cap)
      .collect().toSet
    val viaIndex = Dedup.incrementalLshDedup(corpus, delta, 0.3, Cap,
      corpusIndex = Some(Dedup.bandIndex(corpus)))
      .collect().toSet
    assert(derived == viaIndex)
  }

  test("incremental clusters law (bucketCap = 0): applying the label " +
    "changelog to the corpus labels reproduces duplicateClusters(corpus " +
    "∪ delta) exactly — every delta doc labeled, every corpus relabel " +
    "necessary (new != old), untouched docs untouched") {
    val docs = io.Tables(spark, Sf).documents
    val u = ext.Pipeline.saltedUniform(col("doc_id"), "incr|")
    val corpus = docs.filter(u >= 0.25)
    val delta = docs.filter(u < 0.25)

    val full = Dedup.duplicateClusters(docs, 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val old = Dedup.duplicateClusters(corpus, 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap

    val out = Dedup.incrementalClusters(corpus, delta, 0.3).collect()
    val deltaRows = out.filter(_.getAs[String]("side") == "delta")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val corpusRows = out.filter(_.getAs[String]("side") == "corpus")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("old_cluster")))

    // Every corpus relabel is real and cites the correct old label.
    corpusRows.foreach { case (id, nw, od) =>
      assert(od == old(id) && nw != od, s"bogus relabel ($id, $nw, $od)")
    }
    // Changelog applied over the old labels = the full recompute.
    val applied = old ++ corpusRows.map(r => r._1 -> r._2) ++ deltaRows
    assert(applied == full,
      "incremental labels != duplicateClusters(union)")
    assert(corpusRows.nonEmpty && deltaRows.exists { case (id, c) => id != c },
      "degenerate law: no merges exercised")
  }

  test("incremental clusters: a delta doc bridging two corpus clusters " +
    "merges them — every member of the losing cluster relabels to the " +
    "global min; untouched clusters never appear in the changelog") {
    // Token sets chosen so the two bridge pairs (jaccard 0.385 each)
    // provably band-collide under the fixed MinHash (verified offline
    // with the exact md5 kernel — LSH recall at 0.385 is probabilistic
    // per pair, but deterministic for a FIXED pair).
    val corpus = d(
      1L -> "a b c d e f g h", 2L -> "a b c d e f g h",     // cluster 1
      10L -> "n2 q s p v l t y", 11L -> "n2 q s p v l t y", // cluster 10
      20L -> "m n o p2 q2 r m n", 21L -> "m n o p2 q2 r m n") // untouched
    val delta = d(100L -> "a b c d e f n2 q s p v l")       // bridges 1+10
    val out = Dedup.incrementalClusters(corpus, delta, 0.3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("side"),
        r.getAs[Long]("cluster"),
        Option(r.getAs[java.lang.Long]("old_cluster")).map(_.toLong)))
      .toSet
    assert(out == Set(
      (100L, "delta", 1L, None),
      (10L, "corpus", 1L, Some(10L)),
      (11L, "corpus", 1L, Some(10L))),
      s"unexpected changelog: $out")
  }

  test("incremental clusters: a stale label table (corpus match without " +
    "a label row) raises in-plan instead of mis-rooting the component") {
    val corpus = d(1L -> "a b c d e f g h", 2L -> "a b c d e f g h")
    val delta = d(100L -> "a b c d e f g h")
    val stale = Seq((2L, 2L)).toDF("doc_id", "cluster") // missing doc 1
    val ex = intercept[Exception] {
      Dedup.incrementalClusters(corpus, delta, 0.3,
        corpusLabels = Some(stale)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("stale")), s"wrong failure: $ex")
  }

  // ---- x253: incremental semantic dedup -----------------------------

  private def embTables() = io.Tables(spark, Sf).embeddings

  test("incremental semantic dedup law (ordered ids): delta verdicts " +
    "equal the x174 full recompute's drop set when corpus ids precede " +
    "delta ids — same matches, same cell-cap exclusions") {
    val e = embTables()
    val corpus = e.filter(col("vec_id") < 250)
    val delta = e.filter(col("vec_id") >= 250)
    val tau = 0.1
    // Ground truth via a pure Scala fold over the real cells/vectors.
    val cells = ext.Similarity.lshBuckets(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val vecs = e.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val widths = cells.values.groupBy(identity).map { case (b, v) => b -> v.size }
    val got = ext.Curation.incrementalSemanticDedup(corpus, delta, tau)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("best_match_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("n_matches")).map(_.toLong))))
      .toMap
    var nDup = 0
    vecs.keys.filter(_ >= 250).foreach { d =>
      val cell = cells(d)
      if (widths(cell) > 256) assert(got(d)._1 == "overcap")
      else {
        // Under ordered ids every corpus partner has a lower id, so the
        // full recompute's min-id-wins drop rule and the operator's
        // corpus-wins policy pick the same drop set.
        val ms = vecs.keys
          .filter(m => m != d && cells(m) == cell &&
            (m < 250 || m < d) && dot(vecs(m), vecs(d)) >= tau).toSeq
        if (ms.isEmpty) assert(got(d) == (("kept", None, Some(0L))), s"vec $d")
        else {
          nDup += 1
          val best = ms.map(m => (m >= 250, -dot(vecs(m), vecs(d)), m)).min
          val cls = if (best._1) "dup_delta" else "dup_corpus"
          assert(got(d)._1 == cls && got(d)._2 == Some(best._3) &&
            got(d)._3 == Some(ms.size.toLong), s"vec $d: ${got(d)} vs $best")
        }
      }
    }
    assert(nDup > 0, "degenerate law: no dup verdicts exercised")
  }

  private def emb(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("incremental semantic dedup policy: corpus wins on interleaved " +
    "ids (the documented divergence from min-id-wins: the corpus is " +
    "immutable, so the NEWCOMER drops); over-cap cells verdict " +
    "'overcap' with NULL matches; colliding ids raise") {
    val v = embTables().filter(col("vec_id") === 93)
      .collect()(0).getSeq[Float](1).toArray
    // Interleaved ids: delta 5 < corpus 30, identical vectors.
    val out = ext.Curation.incrementalSemanticDedup(
      emb(30L -> v), emb(5L -> v), tau = 0.4).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("verdict") == "dup_corpus" &&
      out(0).getAs[Long]("best_match_id") == 30L,
      "the corpus vec is canon even at a higher id — the newcomer drops")
    // cellCap = 1: the shared cell has union width 2 -> overcap.
    val oc = ext.Curation.incrementalSemanticDedup(
      emb(10L -> v), emb(20L -> v), tau = 0.4, cellCap = 1).collect()
    assert(oc.length == 1 && oc(0).getAs[String]("verdict") == "overcap" &&
      oc(0).isNullAt(oc(0).fieldIndex("best_match_id")) &&
      oc(0).isNullAt(oc(0).fieldIndex("n_matches")))
    // Same vec_id on both sides raises in-plan.
    val ex = intercept[Exception] {
      ext.Curation.incrementalSemanticDedup(
        emb(10L -> v), emb(10L -> v), tau = 0.4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("collide")), s"wrong failure: $ex")
  }

  test("incremental semantic dedup: a STALE cell index (phantom vec_id " +
    "with no corpus embedding row) raises in-plan instead of silently " +
    "false-keeping the phantom's delta near-dups") {
    val v = embTables().filter(col("vec_id") === 93)
      .collect()(0).getSeq[Float](1).toArray
    val corpus = emb(10L -> v)
    val delta = emb(20L -> v)
    // Index claims vec 99 is in the same cell, but 99 has no embedding
    // row (deleted/compacted after the index was written).
    val stale = ext.Similarity.lshBuckets(corpus)
      .unionByName(ext.Similarity.lshBuckets(emb(99L -> v)))
    val ex = intercept[Exception] {
      ext.Curation.incrementalSemanticDedup(corpus, delta, tau = 0.4,
        corpusCells = Some(stale)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("stale")), s"wrong failure: $ex")
  }

  test("incremental semantic dedup: the persisted-cell-index entry " +
    "point is the same operator, and a delta twin of a corpus vec " +
    "classifies dup_corpus over its identical delta twin") {
    val v = embTables().filter(col("vec_id") === 93)
      .collect()(0).getSeq[Float](1).toArray
    val corpus = emb(10L -> v)
    val delta = emb(20L -> v, 21L -> v)
    val out = ext.Curation.incrementalSemanticDedup(corpus, delta, 0.4)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("verdict"), r.getAs[Long]("best_match_id"),
          r.getAs[Long]("n_matches"))))
      .toMap
    assert(out(20L) == (("dup_corpus", 10L, 1L)))
    assert(out(21L) == (("dup_corpus", 10L, 2L)),
      "corpus canon outranks the identical delta twin; both audited")
    val viaIndex = ext.Curation.incrementalSemanticDedup(corpus, delta, 0.4,
      corpusCells = Some(ext.Similarity.lshBuckets(corpus))).collect().toSet
    assert(viaIndex == ext.Curation.incrementalSemanticDedup(
      corpus, delta, 0.4).collect().toSet)
  }

  test("id-collision guard: a delta id already present in the corpus " +
    "raises in-plan on BOTH entry points instead of silently aliasing " +
    "two documents") {
    val corpus = d(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
    val delta = d(2L -> "totally different text here")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex1 = intercept[Exception] {
      Dedup.incrementalLshDedup(corpus, delta, 0.3).collect()
    }
    assert(messages(ex1).exists(_.contains("collide")),
      s"wrong verdict-path failure: $ex1")
    val ex2 = intercept[Exception] {
      Dedup.incrementalClusters(corpus, delta, 0.3).collect()
    }
    assert(messages(ex2).exists(_.contains("collide")),
      s"wrong cluster-path failure: $ex2")
  }
}
