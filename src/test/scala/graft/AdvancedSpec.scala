package graft

import graft.ext.{Pipeline, TextAnalysis}
import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Specs for the round-3 operator batch (range join, corpus assembly,
  * statistical aggregates). The oracle gate covers the real-data path;
  * these pin the semantics on hand-built frames plus a few sf0.001
  * invariants the oracle can't express (e.g. "binned range join equals
  * the naive theta join").
  */
class AdvancedSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("srcA"))

  test("binned range join equals the naive theta join, at every bin width") {
    val points = Seq(
      (1L, "2024-01-01 00:10:00"), (2L, "2024-01-01 01:00:00"),
      (3L, "2024-01-01 01:59:59"), (4L, "2024-01-01 03:30:00"),
      (5L, "2024-01-02 12:00:00"))
      .toDF("pid", "p_ts_s").select(col("pid"), col("p_ts_s").cast("timestamp").as("p_ts"))
    val intervals = Seq(
      (10L, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      (11L, "2024-01-01 01:30:00", "2024-01-01 04:00:00"),
      (12L, "2024-01-05 00:00:00", "2024-01-06 00:00:00"))
      .toDF("iid", "s_s", "e_s")
      .select(col("iid"), col("s_s").cast("timestamp").as("i_start"),
        col("e_s").cast("timestamp").as("i_end"))
    val naive = points.join(intervals,
        col("p_ts") >= col("i_start") && col("p_ts") < col("i_end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // Half-open semantics sanity: point 2 at 01:00 is inside [00:00,02:00)
    // and NOT a member of anything ending at 01:00; interval 12 matches
    // nothing.
    assert(naive === Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L)))
    for (bin <- Seq(60L, 1800L, 3600L, 86400L)) {
      val binned = RangeJoin.pointInInterval(points, intervals,
          "p_ts", "i_start", "i_end", bin)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(binned.length === binned.toSet.size, s"bin=$bin produced duplicates")
      assert(binned.toSet === naive, s"bin=$bin diverged from theta join")
    }
  }

  test("range join rejects overlapping and reserved column names") {
    val a = Seq((1L, "2024-01-01 00:00:00")).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(a, a, "ts", "ts", "ts")
    }
    val withBin = Seq((1L, "2024-01-01 00:00:00", 7L)).toDF("id", "ts", "_bin")
    val b = Seq((2L, "2024-01-01 00:00:00", "2024-01-01 01:00:00")).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(withBin, b, "ts", "s", "e")
    }
  }

  test("range join is exact for sub-second interval ends and drops reversed intervals") {
    val points = Seq((1L, "2024-01-01 01:00:00.2"), (2L, "2024-01-01 01:00:00.6"))
      .toDF("pid", "s").select(col("pid"), col("s").cast("timestamp").as("p_ts"))
    val intervals = Seq(
      (10L, "2024-01-01 00:30:00", "2024-01-01 01:00:00.5"),   // sub-second end
      (11L, "2024-01-01 02:00:00", "2024-01-01 01:00:00"))     // reversed: empty
      .toDF("iid", "a", "b")
      .select(col("iid"), col("a").cast("timestamp").as("i_s"),
        col("b").cast("timestamp").as("i_e"))
    val got = RangeJoin.pointInInterval(points, intervals, "p_ts", "i_s", "i_e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // Point 1 at 01:00:00.2 < end 01:00:00.5 must match (a whole-second
    // bin computation would miss it); point 2 at .6 must not.
    assert(got === Set((1L, 10L)))
  }

  test("BoundedTopK orders NaN largest and treats -0.0 == 0.0, like the window plan") {
    val df = Seq((1L, Double.NaN, "nan"), (1L, 1.0, "one"),
      (2L, 0.0, "z"), (2L, -0.0, "a"))
      .toDF("g", "score", "payload")
    val got = df.groupBy("g")
      .agg(graft.functions.BoundedTopK(1)(col("score"), col("payload")).as("top"))
      .select(col("g"), col("top").getItem(0).getField("_2").as("p"))
      .as[(Long, String)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("payload").asc)
    val ref = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("g", "payload").as[(Long, String)].collect().toMap
    assert(got === ref)
    assert(got === Map(1L -> "nan", 2L -> "a"))
  }

  test("boilerplate ngrams: only cross-document spans above minDf surface") {
    val grams = TextAnalysis.boilerplateNgrams(docs(
      1L -> "copy right header one two three unique alpha",
      2L -> "copy right header one two three unique beta",
      3L -> "copy right header one two three unique gamma",
      4L -> "totally different words in this document here"), n = 5, minDf = 3, k = 10)
      .as[(String, Long)].collect()
    assert(grams.contains(("copy right header one two", 3L)))
    assert(grams.forall(_._2 >= 3L))
    assert(!grams.exists(_._1.contains("different")))
  }

  test("stopword scrub preserves order, keeps scrubbed-empty docs, drops high-df tokens") {
    val d = docs(
      1L -> "filler alpha filler beta filler",
      2L -> "filler gamma filler",
      3L -> "filler filler filler")
    val out = TextAnalysis.stopwordScrub(d, 0.9).orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    // "filler" appears in 3/3 docs > 0.9 — scrubbed; rare words survive in order.
    assert(out(0) === ((1L, 5L, 2L, "alpha beta")))
    assert(out(1) === ((2L, 3L, 1L, "gamma")))
    assert(out(2) === ((3L, 3L, 0L, "")))
  }

  test("chunking covers every token; stride==size reconstructs the document") {
    val text = (1 to 95).map(i => s"w$i").mkString(" ")
    val chunks = Pipeline.chunk(docs(1L -> text), chunkSize = 40, stride = 40)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect()
    assert(chunks.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(chunks.map(_._3).toSeq === Seq(40L, 40L, 15L))
    assert(chunks.map(_._2).mkString(" ") === text)
    // Overlapping: consecutive 40/30 windows share 10 tokens.
    val over = Pipeline.chunk(docs(1L -> text), chunkSize = 40, stride = 30)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    val first = over(0).split(" ")
    val second = over(1).split(" ")
    assert(first.takeRight(10).toSeq === second.take(10).toSeq)
  }

  test("context packing: bins are per-source, consecutive, and budget-aligned") {
    val rows = (1L to 10L).map(i => (i, (1 to 500).map(j => s"t$j").mkString(" "),
      if (i <= 5) "sA" else "sB"))
    val d = rows.toDF("doc_id", "text", "source")
    val packed = Pipeline.packBudget(d, budget = 1000).orderBy("doc_id")
      .select("doc_id", "source", "cum_before", "bin")
      .as[(Long, String, Long, Long)].collect()
    // 500-token docs, budget 1000 → two docs per bin within each source.
    assert(packed.filter(_._2 == "sA").map(_._4).toSeq === Seq(0L, 0L, 1L, 1L, 2L))
    assert(packed.filter(_._2 == "sB").map(_._4).toSeq === Seq(0L, 0L, 1L, 1L, 2L))
    // Every doc starts strictly inside its bin's budget window.
    assert(packed.forall { case (_, _, cum, bin) => cum / 1000 == bin })
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val d = (1L to 400L).map(i => (i, s"w$i", if (i % 2 == 0) "keepy" else "droppy"))
      .toDF("doc_id", "text", "source")
    val rate = when(col("source") === "keepy", 1.0).otherwise(0.0)
    val kept = Pipeline.stratifiedSample(d, "doc_id", rate)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (2L to 400L by 2).toSet)
    // Determinism: a second run yields the identical set.
    val again = Pipeline.stratifiedSample(d, "doc_id", rate)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("x41 correlation matches a direct driver-side computation") {
    val q = queries.Registry.queryMap("x41_nation_order_revenue_corr")(spark, Sf)
    val got = q.select("nation", "corr_orders_revenue").as[(String, Double)]
      .collect().toMap
    // Independent recomputation in plain Scala from the raw tables.
    val per = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("x"), sum("o_totalprice").as("y"))
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$Sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("x"), col("y"))
      .as[(String, Double, Double)].collect()
    per.groupBy(_._1).foreach { case (nation, rows) =>
      val n = rows.length.toDouble
      val (xs, ys) = (rows.map(_._2), rows.map(_._3))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val ref = cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
      assert(math.abs(got(nation) - ref) < 1e-9, s"nation=$nation")
    }
  }

  test("x42 histogram partitions all orders; x40 spine is a full grid") {
    val hist = queries.Registry.queryMap("x42_price_histogram")(spark, Sf)
    val total = hist.agg(sum("n_orders")).as[Long].head()
    val nOrders = spark.read.parquet(s"$Sf/orders.parquet").count()
    assert(total === nOrders)

    val spine = queries.Registry.queryMap("x40_revenue_spine")(spark, Sf)
    val nNations = spark.read.parquet(s"$Sf/nation.parquet").count()
    assert(spine.count() === nNations * 80) // 80 months, 1995-01..2001-08
    assert(spine.filter(col("n_orders") === 0 && col("revenue") =!= 0.0).count() === 0)
  }

  test("x46 grouping sets: subtotals are consistent across levels") {
    val gs = queries.Registry.queryMap("x46_grouping_sets")(spark, Sf)
      .select("region", "nation", "gid", "n_customers")
      .as[(String, String, Long, Long)].collect()
    val grand = gs.filter(g => g._1 == "ALL" && g._2 == "ALL")
    val regions = gs.filter(g => g._1 != "ALL" && g._2 == "ALL")
    val cells = gs.filter(g => g._2 != "ALL")
    assert(grand.map(_._3).toSeq === Seq(3L)) // grouping_id: both cols aggregated
    assert(regions.forall(_._3 == 1L) && cells.forall(_._3 == 0L))
    assert(grand.head._4 === regions.map(_._4).sum)
    assert(grand.head._4 === cells.map(_._4).sum)
  }

  test("BoundedTopK: buffer laws and bit-equality with the window formulation") {
    val t = graft.functions.BoundedTopK(2)
    // reduce keeps order (score desc, payload asc), bounds at k, fast-rejects.
    val b = Seq((5.0, "b"), (1.0, "z")).foldLeft(t.zero)(t.reduce)
    assert(t.reduce(b, (5.0, "a")) === Seq((5.0, "a"), (5.0, "b")))
    assert(t.reduce(b, (0.5, "q")) === b)       // below cutoff, full buffer
    assert(t.reduce(b, (1.0, "z")) === b)       // tie with last, not better
    // merge == global sort-take, regardless of split.
    val all = Seq((3.0, "x"), (5.0, "b"), (5.0, "a"), (1.0, "z"))
    val expect = Seq((5.0, "a"), (5.0, "b"))
    for (i <- 0 to all.length) {
      val (l, r) = all.splitAt(i)
      assert(t.merge(l.foldLeft(t.zero)(t.reduce), r.foldLeft(t.zero)(t.reduce)) === expect)
    }

    // Distributed equality vs the window row_number plan, duplicates and
    // ties included.
    val data = (1 to 400).map(i => ((i % 11).toLong, (i * 13 % 50).toDouble, s"p${i % 23}"))
    val df = data.toDF("g", "score", "payload")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("payload").asc)
    val ref = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("g", "payload", "score").as[(Long, String, Double)]
      .collect().sorted.toSeq
    val got = df.groupBy("g")
      .agg(graft.functions.BoundedTopK(5)(col("score"), col("payload")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("r0", "e")))
      .select(col("g"), col("e._2"), col("e._1")).as[(Long, String, Double)]
      .collect().sorted.toSeq
    assert(got === ref)
  }

  test("x49 vocab coverage bounds; x50 retention anchors at 1.0 for week 0") {
    val cov = queries.Registry.queryMap("x49_vocab_coverage")(spark, Sf)
      .select("n_tokens", "n_in_vocab", "oov_rate")
      .as[(Long, Long, Double)].collect()
    assert(cov.nonEmpty)
    assert(cov.forall { case (n, inV, oov) =>
      inV <= n && oov >= 0.0 && oov <= 1.0 })
    // 31-token corpus vocabulary, top-10 cut: coverage must be partial,
    // not degenerate (all-in or all-out).
    assert(cov.exists(_._3 > 0.0) && cov.exists(_._3 < 1.0))

    val ret = queries.Registry.queryMap("x50_retention_cohorts")(spark, Sf)
      .select("week_offset", "retention").as[(Long, Double)].collect()
    assert(ret.nonEmpty)
    // Every user is active in their own first week by definition.
    assert(ret.filter(_._1 == 0L).forall(_._2 === 1.0))
    assert(ret.forall(r => r._2 > 0.0 && r._2 <= 1.0))
  }

  test("x37 incident attribution: incidents survive with zero purchases") {
    val inc = queries.Registry.queryMap("x37_incident_attribution")(spark, Sf)
      .select("n_errors", "n_purchases").as[(Long, Long)].collect()
    assert(inc.nonEmpty)
    assert(inc.forall(_._1 >= 3L))
  }
}
