package graft

import org.apache.spark.sql.functions._

/** Algebra pins for the round-14 batch: the AMS shard-merge audit's
  * family contract and the unimax DECIMAL(38,0) overflow envelope
  * (round-13 advice). Real-data paths stay oracle-gated (x226).
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
}
