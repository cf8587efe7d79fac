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
  * Scale shape: one shuffle to (group, bucket) registers — m rows per
  * group, mergeable by max (the property that makes HLL the standard
  * distributed-cardinality sketch: shard registers union by element-wise
  * max). The exact count rides along as the audit column, which is the
  * cost the sketch exists to avoid at 100 TB — gate-only, like x19's.
  */
object Hll {

  /** Per-`groupCol` HLL cardinality estimate of `valueCol`, with the
    * exact distinct count and relative error as audit columns.
    * m = 64 buckets (p=6): registers stay tiny and the ±1.04/√m ≈ 13%
    * expected error is the honest small-m trade the gate measures.
    */
  def cardinalityByGroup(df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val remBits = 32 - (31 - Integer.numberOfLeadingZeros(m)) // bits in w
    val h = conv(substring(md5(col(valueCol).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val regs = df
      .select(col(groupCol).as("grp"), (h % m).as("bucket"),
        h.as("hv")).select(col("grp"), col("bucket"), expr(s"hv div $m").as("w"))
      .select(col("grp"), col("bucket"),
        when(col("w") > 0, lit(remBits + 1) - length(expr("bin(w)")))
          .otherwise(lit(remBits + 1)).cast("int").as("rank"))
      .groupBy("grp", "bucket").agg(max(col("rank")).as("reg"))
    // Fixed-point harmonic sum: 2^(remBits+1 - reg) is an exact BIGINT
    // (reg in [1, remBits+1] => exponent in [0, remBits]), order-free.
    val scale = math.pow(2.0, (remBits + 1).toDouble) // exact power of two
    val perGroup = regs.groupBy("grp").agg(
      count(lit(1)).as("n_buckets"),
      sum(expr(s"shiftleft(1L, ${remBits + 1} - reg)")).as("sum_fp_present"))
    val exact = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    // Every constant is CAST to DOUBLE: Spark parses bare decimal literals
    // as DECIMAL and would carry decimal-scale rounding through the first
    // few ops (a ~1e-8 relative skew vs DuckDB, which degrades decimal
    // division to DOUBLE immediately) — enough to flip the 6th rounded
    // decimal. All-double on both sides = identical IEEE tree.
    def d(x: Double): String = s"cast($x as double)"
    val alpha = s"(${d(0.7213)} / (${d(1.0)} + ${d(1.079)} / ${d(m.toDouble)}))"
    val est = s"($alpha * ${d(m.toDouble)} * ${d(m.toDouble)} * ${d(scale)}) / cast(sum_fp as double)"
    val corrected =
      s"""CASE WHEN $est <= ${d(2.5)} * ${d(m.toDouble)} AND v_empty > 0
         |     THEN ${d(m.toDouble)} * ln(${d(m.toDouble)} / cast(v_empty as double))
         |     ELSE $est END""".stripMargin
    perGroup
      .select(col("grp"),
        (lit(m) - col("n_buckets")).cast("long").as("v_empty"),
        (col("sum_fp_present") +
          (lit(m) - col("n_buckets")) * lit(scale.toLong)).as("sum_fp"))
      .join(exact, Seq("grp"))
      .selectExpr("grp as " + groupCol, "v_empty", "sum_fp", "n_exact",
        s"round($corrected, 6) as hll_estimate",
        s"round(abs(round($corrected, 6) - cast(n_exact as double)) / cast(n_exact as double), 6) as rel_error")
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
    val remBits = 32 - (31 - Integer.numberOfLeadingZeros(m))
    val h = conv(substring(md5(col(valueCol).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val base = df
      .select(shardKey.as("shard"), (h % m).as("bucket"), h.as("hv"))
      .select(col("shard"), col("bucket"), expr(s"hv div $m").as("w"))
      .select(col("shard"), col("bucket"),
        when(col("w") > 0, lit(remBits + 1) - length(expr("bin(w)")))
          .otherwise(lit(remBits + 1)).cast("int").as("rank"))
    val merged = base.groupBy("shard", "bucket").agg(max(col("rank")).as("reg"))
      .groupBy("bucket").agg(max(col("reg")).as("reg"))
    val direct = base.groupBy("bucket").agg(max(col("rank")).as("dreg"))
    val mm = merged.join(direct, Seq("bucket"))
      .agg(sum(when(col("reg") =!= col("dreg"), lit(1L)).otherwise(lit(0L)))
        .as("n_mismatch"))
    val scale = math.pow(2.0, (remBits + 1).toDouble)
    val fp = merged.agg(count(lit(1)).as("n_buckets"),
      sum(expr(s"shiftleft(1L, ${remBits + 1} - reg)")).as("sum_fp_present"))
    val exact = df.agg(countDistinct(col(valueCol)).as("n_exact"))
    def d(x: Double): String = s"cast($x as double)"
    val alpha = s"(${d(0.7213)} / (${d(1.0)} + ${d(1.079)} / ${d(m.toDouble)}))"
    val est = s"($alpha * ${d(m.toDouble)} * ${d(m.toDouble)} * ${d(scale)}) / cast(sum_fp as double)"
    val corrected =
      s"""CASE WHEN $est <= ${d(2.5)} * ${d(m.toDouble)} AND v_empty > 0
         |     THEN ${d(m.toDouble)} * ln(${d(m.toDouble)} / cast(v_empty as double))
         |     ELSE $est END""".stripMargin
    fp.select(
        (lit(m) - col("n_buckets")).cast("long").as("v_empty"),
        (col("sum_fp_present") +
          (lit(m) - col("n_buckets")) * lit(scale.toLong)).as("sum_fp"))
      .crossJoin(broadcast(mm)).crossJoin(broadcast(exact))
      .selectExpr("n_mismatch", "v_empty", "sum_fp", "n_exact",
        s"round($corrected, 6) as union_estimate",
        s"round(abs(round($corrected, 6) - cast(n_exact as double)) / cast(n_exact as double), 6) as rel_error")
  }
}
