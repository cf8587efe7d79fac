package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** Money contract shared with every DuckDB oracle: cast each row's double
    * to DECIMAL(18,4) *before* aggregating. Decimal addition is exact and
    * associative, so the sum is identical regardless of partitioning /
    * reduction order — the only way a distributed Spark sum and a
    * single-threaded DuckDB sum can hash-match bit-for-bit. (A double sum
    * would drift in the last ulps with 32-way partial aggregation.)
    *
    * Scale 4, not 2: every money expression here (price, price×(1−disc),
    * fee×days) has at most 4 true decimal digits, so the scale-4 cast never
    * actually rounds — which sidesteps the one cross-engine divergence we
    * measured: on exact .xx5 ties Spark rounds HALF_UP (via the double's
    * shortest decimal repr) while DuckDB rounds HALF_EVEN (12/6000 rows at
    * scale 2; 0/60000 at scale 4).
    *
    * Aggregated money is then emitted as DOUBLE: the decimal sum's value×10⁴
    * stays far below 2⁵² at test scale, so the final cast is exact and both
    * engines produce identical float64 bits (verified on 300 groups at
    * sf0.01). A production deployment at 100 TB would keep DecimalType end
    * to end; the double materialization is the cross-engine-stable wire
    * format for the correctness gate.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum of a per-row money expression, emitted as double. */
  def moneySum(c: Column): Column = sum(money(c)).cast("double")

  /** DuckDB-side equivalent of [[moneySum]]. */
  def sqlMoneySum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** Ratio of an exact decimal to a count, computed in double on both
    * sides: CAST(dec AS DOUBLE)/BIGINT is a single IEEE-754 division with
    * identical inputs in Spark and DuckDB, hence identical output bits.
    */
  def ratio(num: Column, den: Column): Column = num.cast("double") / den

  /** Per-lineitem revenue (TPC-H style discounted price). The multiply
    * happens in double — identical bits both engines — then money() makes
    * the aggregate exact.
    */
  def revenueExpr: Column = money(col("l_extendedprice") * (lit(1) - col("l_discount")))

  /** Late-shipment fee analog of the reference's late-rental fee
    * (queries_shan.sql:24-27): $0.50 per day a lineitem shipped more than
    * `graceDays` days after its order date. NULL ship/order dates fall to
    * the ELSE 0 branch — same 3-valued logic as MySQL's CASE.
    */
  def lateFeeExpr(graceDays: Int = 30): Column = {
    val d = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    money(when(d > graceDays, (d - graceDays) * lit(0.5)).otherwise(lit(0.0)))
  }

  // Note: re-aggregating an already-emitted money double (e.g. summing the
  // view's per-customer total_revenue by nation) goes through moneySum too —
  // the double is an exact scale-4 decimal (see money()), so the round-trip
  // back to decimal makes the re-aggregate exact and order-independent.
}
