package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass distributed ordinary-least-squares for a two-predictor linear
  * probe: y ~ beta0 + beta1*x + beta2*z, solved in closed form from the
  * normal equations (X'X) beta = X'y via Cramer's rule on the 3x3 system.
  *
  * The distributed part is ONE map-side-combinable aggregation of the ten
  * exact sufficient statistics (n, Σx, Σz, Σx², Σxz, Σz², Σy, Σxy, Σzy,
  * Σy²) — integer inputs make every sum exact (BIGINT), so the only
  * floating point is the final closed-form projection, which both engines
  * evaluate over the SAME IEEE expression tree from the SAME exact sums
  * and therefore bit-identically (the x41/CorrFormula determinism
  * argument). No iteration, no driver-side math, no collect: the betas
  * are a one-row DataFrame.
  *
  * This is the classic "sufficient statistics, then solve" shape that
  * scales OLS/ridge to arbitrary corpus size (e.g. Chu et al. 2006,
  * "Map-Reduce for machine learning on multicore"): 100 TB of rows fold
  * into ten numbers.
  */
object LinearProbe {

  /** Cramer formulas over the sufficient-statistic aliases. Shared
    * verbatim between the Spark plan and the DuckDB oracle so the double
    * arithmetic agrees bit-for-bit. All references are to DOUBLE-cast
    * sums (fn, fsx, ...), never the raw BIGINTs, so overflow cannot occur
    * inside the determinant products.
    */
  val DetFormula: String =
    "fn*(fsxx*fszz - fsxz*fsxz) - fsx*(fsx*fszz - fsxz*fsz) + fsz*(fsx*fsxz - fsxx*fsz)"
  val Det0Formula: String =
    "fsy*(fsxx*fszz - fsxz*fsxz) - fsx*(fsxy*fszz - fsxz*fszy) + fsz*(fsxy*fsxz - fsxx*fszy)"
  val Det1Formula: String =
    "fn*(fsxy*fszz - fsxz*fszy) - fsy*(fsx*fszz - fsxz*fsz) + fsz*(fsx*fszy - fsxy*fsz)"
  val Det2Formula: String =
    "fn*(fsxx*fszy - fsxy*fsxz) - fsx*(fsx*fszy - fsxy*fsz) + fsy*(fsx*fsxz - fsxx*fsz)"

  /** R² from the same sums: 1 - SSE/SST with
    * SSE = Σy² - (b0·Σy + b1·Σxy + b2·Σzy), SST = Σy² - (Σy)²/n. */
  val R2Formula: String =
    "1.0 - (fsyy - (beta0*fsy + beta1*fsxy + beta2*fszy)) / (fsyy - fsy*fsy/fn)"

  /** The double-cast projections, applied identically by both engines. */
  val CastSelect: Seq[String] = Seq(
    "CAST(n AS DOUBLE) AS fn", "CAST(sx AS DOUBLE) AS fsx",
    "CAST(sz AS DOUBLE) AS fsz", "CAST(sxx AS DOUBLE) AS fsxx",
    "CAST(sxz AS DOUBLE) AS fsxz", "CAST(szz AS DOUBLE) AS fszz",
    "CAST(sy AS DOUBLE) AS fsy", "CAST(sxy AS DOUBLE) AS fsxy",
    "CAST(szy AS DOUBLE) AS fszy", "CAST(syy AS DOUBLE) AS fsyy", "n")

  /** Fits y ~ 1 + x + z over integer-valued columns; returns one row
    * (n, beta0, beta1, beta2, r2). Degenerate designs (singular X'X or
    * zero y-variance) yield NULL betas/r2 rather than garbage.
    */
  def ols2(df: DataFrame, xCol: String, zCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val z = col(zCol).cast("long")
    val y = col(yCol).cast("long")
    df.agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(z).as("sz"),
        sum(x * x).as("sxx"), sum(x * z).as("sxz"), sum(z * z).as("szz"),
        sum(y).as("sy"), sum(x * y).as("sxy"), sum(z * y).as("szy"),
        sum(y * y).as("syy"))
      .selectExpr(CastSelect: _*)
      .selectExpr("n", "fn", "fsy", "fsxy", "fszy", "fsyy",
        s"($DetFormula) AS det", s"($Det0Formula) AS det0",
        s"($Det1Formula) AS det1", s"($Det2Formula) AS det2")
      .selectExpr("n", "fn", "fsy", "fsxy", "fszy", "fsyy",
        "CASE WHEN det = 0 THEN NULL ELSE det0 / det END AS beta0",
        "CASE WHEN det = 0 THEN NULL ELSE det1 / det END AS beta1",
        "CASE WHEN det = 0 THEN NULL ELSE det2 / det END AS beta2")
      .selectExpr("n", "beta0", "beta1", "beta2",
        s"CASE WHEN beta0 IS NULL OR fsyy - fsy*fsy/fn = 0 THEN NULL " +
          s"ELSE $R2Formula END AS r2")
  }

  /** The DuckDB twin of [[ols2]], rendered from the same formula strings
    * — `from` is the relation providing integer columns x, z, y. */
  def ols2OracleSql(from: String): String =
    s"""WITH sums AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(z) AS BIGINT) AS sz,
       |         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*z) AS BIGINT) AS sxz,
       |         CAST(SUM(z*z) AS BIGINT) AS szz,
       |         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
       |         CAST(SUM(z*y) AS BIGINT) AS szy, CAST(SUM(y*y) AS BIGINT) AS syy
       |  FROM ($from)
       |), casted AS (
       |  SELECT ${CastSelect.mkString(", ")} FROM sums
       |), dets AS (
       |  SELECT n, fn, fsy, fsxy, fszy, fsyy,
       |         ($DetFormula) AS det, ($Det0Formula) AS det0,
       |         ($Det1Formula) AS det1, ($Det2Formula) AS det2
       |  FROM casted
       |), betas AS (
       |  SELECT n, fn, fsy, fsxy, fszy, fsyy,
       |         CASE WHEN det = 0 THEN NULL ELSE det0 / det END AS beta0,
       |         CASE WHEN det = 0 THEN NULL ELSE det1 / det END AS beta1,
       |         CASE WHEN det = 0 THEN NULL ELSE det2 / det END AS beta2
       |  FROM dets
       |)
       |SELECT n, beta0, beta1, beta2,
       |       CASE WHEN beta0 IS NULL OR fsyy - fsy*fsy/fn = 0 THEN NULL
       |            ELSE $R2Formula END AS r2
       |FROM betas""".stripMargin
}
