package graft

import graft.functions.{DeterministicMode, VectorFunctions}
import graft.ops.{LinearProbe, Skew}
import org.apache.spark.sql.functions._

/** Custom Catalyst expression / typed aggregator / skew helper specs. */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("dot_product (codegen) equals the interpreted zip_with/aggregate fold bit-for-bit") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
    val a = e.filter(col("vec_id") < 20).select(col("vec_id").as("ida"), col("emb").as("ea"))
    val b = e.filter(col("vec_id") >= 20 && col("vec_id") < 40)
      .select(col("vec_id").as("idb"), col("emb").as("eb"))
    val both = a.crossJoin(b).select(
      VectorFunctions.dotProduct(col("ea"), col("eb")).as("native"),
      aggregate(zip_with(col("ea"), col("eb"), _ * _), lit(0.0), (acc, x) => acc + x)
        .as("interpreted"))
    assert(both.filter(col("native") =!= col("interpreted")).count() === 0)
    assert(both.count() === 400)
  }

  test("dot_product works on raw float arrays and via SQL") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    e.createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      "SELECT dot_product(embedding, embedding) AS n FROM emb_t ORDER BY vec_id LIMIT 5")
      .as[Double].collect()
    viaSql.foreach(n => assert(math.abs(n - 1.0) < 1e-6)) // unit-norm vectors
  }

  test("dot_product rejects mismatched input types") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      Seq((Array(1.0f), Array(1.0))).toDF("a", "b")
        .select(VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("dot_product") || err.getMessage.contains("DATATYPE"))
  }

  test("dot_product fails fast on malformed vectors instead of silent answers") {
    VectorFunctions.register(spark)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    // Length mismatch: the old loop silently TRUNCATED to the shorter
    // array (dot([1,2,3],[4,5]) = 14.0) — corrupt data scoring plausibly.
    val mism = intercept[Exception] {
      Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
        .select(VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    }
    assert(msgs(mism).exists(_.contains("length mismatch")), mism.toString)
    // Null element: getDouble on a null slot read garbage 0.0 or NPE'd
    // depending on the array backing; must be a descriptive error.
    val nul = intercept[Exception] {
      Seq((Array(Option(1.0), None), Array(Option(1.0), Option(2.0))))
        .toDF("a", "b")
        .select(VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    }
    assert(msgs(nul).exists(_.contains("null element")), nul.toString)
  }

  test("Ckpt.tracked releases ONLY the checkpoint blocks — never a live " +
    "cache whose buffer first registers inside the tracked call") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // Cached but NOT yet materialized: the buffer RDD persist-registers
    // during tracked()'s own DAG build — the window the old
    // registration-diff capture swept it up in, after which release()
    // permanently downgraded the cache to recompute-per-read (measured
    // as the graph family's ~2x rerun medians).
    val cached = spark.range(1000).toDF("id").cache()
    val (ck, h) = graft.ops.Ckpt.tracked(
      cached.groupBy((col("id") % 10).as("k")).count())
    assert(ck.count() === 10)
    val during = sc.getPersistentRDDs.keySet -- before
    assert(during.size >= 2, s"expected cache buffer + checkpoint ids, got $during")
    h.release()
    val after = sc.getPersistentRDDs.keySet -- before
    assert(after.size === during.size - 1,
      s"release must drop exactly the checkpoint RDD: before=$during after=$after")
    assert(after.nonEmpty, "live cache evicted by release — the window-diff bug")
    cached.unpersist()
  }

  test("deterministic mode: max count wins, ties break to smallest value") {
    val df = Seq((1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"), (2, "z"))
      .toDF("k", "v")
    val m = df.groupBy("k").agg(DeterministicMode(col("v")).as("mode"))
      .as[(Int, String)].collect().toMap
    assert(m(1) === "a") // a and b tie at 2 -> a
    assert(m(2) === "z")
  }

  test("deterministic mode ignores nulls and returns null on empty") {
    val df = Seq((1, Option("x")), (1, None), (2, None)).toDF("k", "v")
    val m = df.groupBy("k").agg(DeterministicMode(col("v")).as("mode"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m(1) === "x")
    assert(m(2) === null)
  }

  test("saltedJoin rejects join types that would duplicate replicated rows") {
    val big = Seq((1, "x")).toDF("k", "v")
    val small = Seq((1, "y")).toDF("k", "w")
    val err = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), numSalts = 4, joinType = "right")
    }
    assert(err.getMessage.contains("duplicate"))
  }

  test("saltedJoin equals the plain join (inner and left)") {
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // key 0/1/2, skewed-ish
    val small = Seq((0, "zero"), (1, "one"), (9, "nine")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoin(big, small, Seq("k"), numSalts = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.exceptAll(plain).count() === 0, jt)
      assert(plain.exceptAll(salted).count() === 0, jt)
    }
    // Byte-identical duplicates of one hot key — the constant-payload
    // fact-table shape where a row-CONTENT salt would collapse every
    // copy onto one reducer (doing nothing for the skew). The positional
    // salt must still preserve multiset semantics exactly.
    val dupBig = Seq.fill(500)((1, "same")).toDF("k", "v")
    val plainD = dupBig.join(small, Seq("k"), "inner")
    val saltedD = Skew.saltedJoin(dupBig, small, Seq("k"), numSalts = 8)
    assert(saltedD.count() === plainD.count())
    assert(saltedD.exceptAll(plainD).count() === 0)
  }

  test("twoPathJoin equals the plain join with both paths populated") {
    // Key 1 is the celebrity (900 rows); keys 2..101 are the long tail.
    val big = ((1 to 900).map(_ => (1, "hot")) ++
      (2 to 101).map(k => (k, "tail"))).toDF("k", "side")
    val small = (1 to 120).map(k => (k, s"dim$k")).toDF("k", "name")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt)
      val two = Skew.twoPathJoin(big, small, Seq("k"), hotThreshold = 100, joinType = jt)
      assert(two.count() === plain.count(), jt)
      assert(two.exceptAll(plain).count() === 0, jt)
      assert(plain.exceptAll(two).count() === 0, jt)
    }
    // Both paths genuinely fire: the hot path carries key 1's 900 rows.
    val two = Skew.twoPathJoin(big, small, Seq("k"), hotThreshold = 100)
    assert(two.filter(col("k") === 1).count() === 900)
    assert(two.filter(col("k") =!= 1).count() === 100)
    // The hot path is a broadcast join: at least two broadcast exchanges
    // (the hot-key list itself plus the small side's hot slice).
    val plan = two.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"hot path must broadcast, got:\n$plan")
  }

  test("twoPathJoin rejects join types that would duplicate small-side rows") {
    val big = Seq((1, "x")).toDF("k", "v")
    val small = Seq((1, "y")).toDF("k", "w")
    val err = intercept[IllegalArgumentException] {
      Skew.twoPathJoin(big, small, Seq("k"), hotThreshold = 10, joinType = "full")
    }
    assert(err.getMessage.contains("duplicate"))
  }

  test("joinStats predicts the exact join cardinality and flags skew") {
    // Key 1: 90 left rows × 2 right rows; keys 2..11: 1×1. Join rows =
    // 90*2 + 10 = 190. Mean left fanout = 100/11; skew = 90/(100/11) = 9.9.
    val left = ((1 to 90).map(_ => 1) ++ (2 to 11)).toDF("k")
    val right = (Seq(1, 1) ++ (2 to 11) ++ Seq(99)).toDF("k")
    val r = Skew.joinStats(left, right, "k",
      broadcastRowLimit = 5, skewFactor = 8.0).collect()(0)
    assert(r.getAs[Long]("n_left") === 100L)
    assert(r.getAs[Long]("n_right") === 13L)
    assert(r.getAs[Long]("distinct_left") === 11L)
    assert(r.getAs[Long]("distinct_right") === 12L) // incl. unmatched 99
    assert(r.getAs[Long]("max_fanout_left") === 90L)
    assert(r.getAs[Long]("join_rows") === 190L)
    assert(r.getAs[String]("strategy") === "salt") // 13 > limit 5, skew 9.9 > 8
    // Prediction equals reality.
    assert(left.join(right, Seq("k")).count() === 190L)
    // With a generous broadcast limit the small side wins broadcast.
    val b = Skew.joinStats(left, right, "k").collect()(0)
    assert(b.getAs[String]("strategy") === "broadcast")
  }

  test("ols2 recovers exact coefficients on noiseless integer data") {
    // y = 7 + 3x + 5z over a non-degenerate integer grid.
    val rows = for { x <- 1 to 12; z <- 1 to 9 } yield (x, z, 7 + 3 * x + 5 * z)
    val df = rows.toDF("x", "z", "y")
    val r = LinearProbe.ols2(df, "x", "z", "y").collect()(0)
    assert(r.getLong(0) === rows.length)
    assert(math.abs(r.getDouble(1) - 7.0) < 1e-9, s"beta0 ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-9, s"beta1 ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-9, s"beta2 ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12, s"r2 ${r.getDouble(4)}")
  }

  test("ols2 yields NULLs on a singular design instead of garbage") {
    // z = 2x exactly -> X'X singular -> det = 0 -> NULL betas and r2.
    val df = (1 to 20).map(x => (x, 2 * x, x + 1)).toDF("x", "z", "y")
    val r = LinearProbe.ols2(df, "x", "z", "y").collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
