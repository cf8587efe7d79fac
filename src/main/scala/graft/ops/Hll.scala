package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-replayable HyperLogLog (Flajolet et al. 2007) — the
  * distinct-count sketch whose REGISTERS an oracle can replay bit-for-bit.
  * Spark's own `approx_count_distinct` is HLL++ with an opaque hash, so
  * x19 gates it only through a tolerance contract; this implementation
  * derives everything from one md5, making every intermediate exact:
  *
  *  - 32-bit hash h from the md5's first 8 hex digits (the MinHash-family
  *    convention); bucket = h mod m, remainder w = h div m (26 bits at
  *    m=64);
  *  - register rank = (#remainder bits) − bitlength(w) + 1, computed with
  *    INTEGER string arithmetic (`length(bin(w))`) — no float log2 whose
  *    last-ulp could disagree across engines;
  *  - per-(group, bucket) max-rank registers via one exact aggregate;
  *  - the harmonic sum as a FIXED-POINT BIGINT (Σ 2^(maxRank bits − rank)),
  *    so the distributed summation order cannot perturb a double;
  *  - one shared IEEE expression tree from those exact integers to the
  *    estimate (alpha·m²/Σ2^-rank, linear-counting fallback below 2.5m
  *    when empty buckets remain — Flajolet's small-range correction),
  *    rounded to 6 decimals to absorb libm ln() last-ulp skew.
  *
  * NULL values carry no hash: md5(NULL) is NULL, which would land a
  * phantom max-rank register in a NULL bucket and silently skew the
  * estimate while `countDistinct` (the audit column) skips them — so the
  * register stream filters NULLs, once, for every consumer. A group
  * whose values are ALL NULL keeps its output row: zero registers means
  * v_empty = m, the linear-counting branch yields exactly 0, and
  * rel_error is NULL (0/0 has no honest value — 3VL).
  *
  * Scale shape: one shuffle to (group, bucket) registers — m rows per
  * group, mergeable by max (the property that makes HLL the standard
  * distributed-cardinality sketch: shard registers union by element-wise
  * max). The exact count rides along as the audit column, which is the
  * cost the sketch exists to avoid at 100 TB — gate-only, like x19's.
  */
object Hll {

  /** Bits of the hash remainder w = h div m at 32-bit h. */
  private def remBitsOf(m: Int): Int = 32 - (31 - Integer.numberOfLeadingZeros(m))

  /** (keyName, bucket, rank): the register-rank stream — ONE definition
    * of the hash→bucket→rank kernel for both [[cardinalityByGroup]] and
    * [[mergeAudit]] (a rank-rule or threshold tweak applied to one and
    * not the other would silently desynchronize their estimates).
    * NULL values are filtered here (scaladoc above). */
  private def ranks(df: DataFrame, valueCol: String, m: Int,
      key: Column, keyName: String): DataFrame = {
    val remBits = remBitsOf(m)
    val h = conv(substring(md5(col(valueCol).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(key.as(keyName), (h % m).as("bucket"), h.as("hv"))
      .select(col(keyName), col("bucket"), expr(s"hv div $m").as("w"))
      .select(col(keyName), col("bucket"),
        when(col("w") > 0, lit(remBits + 1) - length(expr("bin(w)")))
          .otherwise(lit(remBits + 1)).cast("int").as("rank"))
  }

  /** The estimator as ONE SQL string over (v_empty, sum_fp) — shared by
    * both entry points for the same lockstep reason as [[ranks]]. Every
    * constant is CAST to DOUBLE: Spark parses bare decimal literals as
    * DECIMAL and would carry decimal-scale rounding through the first
    * few ops (a ~1e-8 relative skew vs DuckDB, which degrades decimal
    * division to DOUBLE immediately) — enough to flip the 6th rounded
    * decimal. All-double on both sides = identical IEEE tree. */
  private def correctedEstSql(m: Int): String = {
    val scale = math.pow(2.0, (remBitsOf(m) + 1).toDouble) // exact power of two
    def d(x: Double): String = s"cast($x as double)"
    val alpha = s"(${d(0.7213)} / (${d(1.0)} + ${d(1.079)} / ${d(m.toDouble)}))"
    val est = s"($alpha * ${d(m.toDouble)} * ${d(m.toDouble)} * ${d(scale)}) / cast(sum_fp as double)"
    s"""CASE WHEN $est <= ${d(2.5)} * ${d(m.toDouble)} AND v_empty > 0
       |     THEN ${d(m.toDouble)} * ln(${d(m.toDouble)} / cast(v_empty as double))
       |     ELSE $est END""".stripMargin
  }

  /** Per-`groupCol` HLL cardinality estimate of `valueCol`, with the
    * exact distinct count and relative error as audit columns.
    * m = 64 buckets (p=6): registers stay tiny and the ±1.04/√m ≈ 13%
    * expected error is the honest small-m trade the gate measures.
    */
  def cardinalityByGroup(df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val scale = math.pow(2.0, (remBitsOf(m) + 1).toDouble)
    val regs = ranks(df, valueCol, m, col(groupCol), "grp")
      .groupBy("grp", "bucket").agg(max(col("rank")).as("reg"))
    // Fixed-point harmonic sum: 2^(remBits+1 - reg) is an exact BIGINT
    // (reg in [1, remBits+1] => exponent in [0, remBits]), order-free.
    val perGroup = regs.groupBy("grp").agg(
      count(lit(1)).as("n_buckets"),
      sum(expr(s"shiftleft(1L, ${remBitsOf(m) + 1} - reg)")).as("sum_fp_present"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    // LEFT from the exact side: an all-NULL group has no registers but
    // must still appear (never silently dropped) — its empty sketch
    // linear-counts to exactly 0. Null-SAFE key match (<=>): a NULL
    // group whose values are non-null HAS registers, and a plain
    // equi-join would orphan them — reporting a confidently wrong
    // hll_estimate 0 against a real n_exact. EqualNullSafe is still a
    // hash-join key, so the plan shape is unchanged.
    exact.join(perGroup, exact("grp") <=> perGroup("grp"), "left")
      .drop(perGroup("grp"))
      .select(col("grp"),
        (lit(m) - coalesce(col("n_buckets"), lit(0L))).cast("long").as("v_empty"),
        (coalesce(col("sum_fp_present"), lit(0L)) +
          (lit(m) - coalesce(col("n_buckets"), lit(0L))) * lit(scale.toLong))
          .as("sum_fp"),
        col("n_exact"))
      .selectExpr("grp as " + groupCol, "v_empty", "sum_fp", "n_exact",
        s"round(${correctedEstSql(m)}, 6) as hll_estimate",
        s"case when n_exact > 0 then round(abs(round(${correctedEstSql(m)}, 6) " +
          "- cast(n_exact as double)) / cast(n_exact as double), 6) end as rel_error")
  }

  /** Shard-merge audit for the HLL registers — the cardinality twin of
    * the MinHash merge audit (x175): registers computed per shard and
    * UNIONED by element-wise max must equal the registers computed
    * directly over the whole table, because max is associative — the
    * exact property that lets every partition of a 100 TB scan sketch
    * independently and merge in one tiny reduce. The audited merged
    * registers then produce the union-cardinality estimate against the
    * exact distinct count.
    */
  def mergeAudit(df: DataFrame, valueCol: String, shardKey: Column,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val scale = math.pow(2.0, (remBitsOf(m) + 1).toDouble)
    val base = ranks(df, valueCol, m, shardKey, "shard")
    val merged = base.groupBy("shard", "bucket").agg(max(col("rank")).as("reg"))
      .groupBy("bucket").agg(max(col("reg")).as("reg"))
    val direct = base.groupBy("bucket").agg(max(col("rank")).as("dreg"))
    val mm = merged.join(direct, Seq("bucket"))
      .agg(coalesce(sum(when(col("reg") =!= col("dreg"), lit(1L))
        .otherwise(lit(0L))), lit(0L)).as("n_mismatch"))
    val fp = merged.agg(count(lit(1)).as("n_buckets"),
      sum(expr(s"shiftleft(1L, ${remBitsOf(m) + 1} - reg)")).as("sum_fp_present"))
    val exact = df.agg(countDistinct(col(valueCol)).as("n_exact"))
    fp.select(
        (lit(m) - col("n_buckets")).cast("long").as("v_empty"),
        (coalesce(col("sum_fp_present"), lit(0L)) +
          (lit(m) - col("n_buckets")) * lit(scale.toLong)).as("sum_fp"))
      .crossJoin(broadcast(mm)).crossJoin(broadcast(exact))
      .selectExpr("n_mismatch", "v_empty", "sum_fp", "n_exact",
        s"round(${correctedEstSql(m)}, 6) as union_estimate",
        s"case when n_exact > 0 then round(abs(round(${correctedEstSql(m)}, 6) " +
          "- cast(n_exact as double)) / cast(n_exact as double), 6) end as rel_error")
  }
}
