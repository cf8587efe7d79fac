package graft

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.ops.Ckpt

/** Pinned cache-lifecycle contracts (round-13 directives 1 and 3).
  *
  * Contract: every DataFrame a module cache hands out must SURVIVE that
  * module's `clearCaches` — eviction may drop blocks, but a caller-held
  * frame transparently recomputes on its next action (so caches store
  * recomputable `.cache()` frames, never tracked localCheckpoints, whose
  * blocks are unrecomputable once released — the round-12 kmCache
  * use-after-free). One held-frame-across-clearCaches test per cached
  * family, plus the mechanical tripwire: `Ckpt.Handle.release` throws if
  * a registered cache entry still reads the handle's RDDs.
  */
class CachesSpec extends SparkSuite {
  private def docs = spark.read.parquet(s"$Sf/documents.parquet")
  private def emb = spark.read.parquet(s"$Sf/embeddings.parquet")

  test("Ckpt tripwire: release under a registered cache reader throws") {
    import spark.implicits._
    val (ck, h) = Ckpt.tracked(Seq(1, 2, 3).toDF("x"))
    // A derived frame reading the checkpoint carries its LogicalRDD too.
    val derived = ck.filter(org.apache.spark.sql.functions.col("x") > 1)
    Ckpt.registerCached(derived, "CachesSpec.memo")
    try {
      val e = intercept[IllegalStateException](h.release())
      assert(e.getMessage.contains("CachesSpec.memo"))
      assert(ck.count() === 3, "blocks must still be live after refused release")
    } finally Ckpt.unregisterCached(derived, "CachesSpec.memo")
    h.release() // legal now; ck is unrecomputable past this point
  }

  test("lint: no cache map may store a Ckpt.Handle (loop-internal only)") {
    import scala.jdk.CollectionConverters._
    // Comments/scaladoc stripped first: a doc sentence merely MENTIONING
    // Ckpt.Handle in a cache-bearing module must not fail the build —
    // only code that actually names the type next to a memo map does.
    def stripComments(src: String): String = src
      .replaceAll("(?s)/\\*.*?\\*/", "")
      .replaceAll("//.*", "")
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
    val offenders =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filter { p =>
          val src = stripComments(
            new String(java.nio.file.Files.readAllBytes(p)))
          src.contains("TrieMap") && src.contains("Ckpt.Handle")
        }.toList
      finally walk.close()
    assert(offenders.isEmpty,
      s"Ckpt.Handle stored in a memo cache (the r12 use-after-free shape): $offenders")
  }

  test("Similarity.kMeans labels held across clearCaches recompute identically") {
    val (_, a1) = Similarity.kMeans(emb, 4, 2)
    val before = a1.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    Similarity.clearCaches(spark)
    val after = a1.select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(before === after)
    Similarity.clearCaches(spark)
  }

  test("Similarity.annPairs held across clearCaches recomputes identically") {
    val p1 = Similarity.annPairs(emb, 0.8)
    val n = p1.count()
    Similarity.clearCaches(spark)
    assert(p1.count() === n)
    Similarity.clearCaches(spark)
  }

  test("Dedup pair/shingle frames held across clearCaches recompute identically") {
    val sh = Dedup.shingles(docs)
    val pairs = Dedup.lshDedupPairs(docs)
    val (nSh, nP) = (sh.count(), pairs.count())
    Dedup.clearCaches(spark)
    assert(sh.count() === nSh)
    assert(pairs.count() === nP)
    Dedup.clearCaches(spark)
  }

  test("TextAnalysis BPE frames held across clearCaches recompute identically") {
    val (merges, _) = TextAnalysis.bpe(docs, 3)
    val before = merges.collect().toSeq
    TextAnalysis.clearCaches(spark)
    assert(merges.collect().toSeq === before)
    TextAnalysis.clearCaches(spark)
  }

  test("Kmv sketches held across clearCaches recompute identically") {
    val sk = graft.ops.Kmv.sketchesOf(docs, 16)
    val before = sk.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    graft.ops.Kmv.clearCaches(spark)
    assert(sk.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap === before)
    graft.ops.Kmv.clearCaches(spark)
  }

  test("Report monthly rollup held across clearCaches recomputes identically") {
    val m = SparkEntry.queries("r02_monthly_revenue_trend")(spark, Sf)
    val before = m.collect().toSeq
    graft.queries.Report.clearCaches(spark)
    assert(m.collect().toSeq === before)
    graft.queries.Report.clearCaches(spark)
  }
}
