package graft.service

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The interactive app surface as a parameterized API — each Streamlit
  * interaction (/root/reference/data-mgmt-streamlit.py) is one lazy
  * DataFrame transform, so "re-run on widget change" is a cheap re-plan
  * over a cached base frame. The pinned-parameter query registry entries
  * (s01-s05) are these functions applied to fixed arguments.
  */
object QueryService {

  /** Case-insensitive substring search across every column
    * (data-mgmt-streamlit.py:56-62): the reference runs a PER-COLUMN
    * contains and keeps the row if ANY column matches
    * (`row.astype(str).str.contains(s).any()`), on the strip()ped
    * lowered term. A concatenated haystack would add cross-column false
    * positives (a term spanning a separator boundary matches rows no
    * single cell contains) and would miss the strip. NULL cells never
    * match (pandas' na=False). */
  def search(df: DataFrame, term: String): DataFrame = {
    val s = term.trim.toLowerCase
    if (s.isEmpty) df
    else df.filter(df.columns
      .map(c => lower(coalesce(col(c).cast("string"), lit(""))).contains(s))
      .reduce(_ || _))
  }

  /** Numeric range slider (:129-148): cast-to-double with error→NULL
    * semantics (pd.to_numeric(errors="coerce") analog). Spark 4 runs
    * ANSI mode by default, where a plain cast THROWS on malformed input —
    * try_cast restores the coerce-to-NULL contract, and NULL fails the
    * between, dropping the row exactly as pandas does (SURVEY.md §2.8 F19).
    */
  def rangeFilter(df: DataFrame, column: String, lo: Double, hi: Double): DataFrame =
    df.filter(expr(s"try_cast(`$column` AS DOUBLE)").between(lo, hi))

  /** Bounded preview (:152). */
  def preview(df: DataFrame, n: Int = 100): DataFrame = df.limit(n)

  /** Rows/columns metrics row (:116-122). */
  def metrics(df: DataFrame): (Long, Int) = (df.count(), df.columns.length)

  /** Chart cardinality cap (:193-198): keep rows whose `column` value is
    * among the top-n most frequent (value_counts().nlargest(n) + filter),
    * as a semi-join so the big side never collects. NULLs are excluded
    * BEFORE ranking (pandas value_counts drops NaN before nlargest):
    * otherwise a NULL-heavy column lets the NULL group burn one of the n
    * slots and then match nothing in the semi-join — one real category
    * silently missing from the chart. */
  def topNCategories(df: DataFrame, column: String, n: Int = 50): DataFrame = {
    val top = df.filter(col(column).isNotNull)
      .groupBy(column).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(column).asc)
      .limit(n)
      .select(column)
    df.join(broadcast(top), Seq(column), "left_semi")
  }

  /** Chart aggregation (:201-220): group X, aggregate Y (sum/avg/count),
    * the Altair mark's data contract. */
  def chartData(df: DataFrame, x: String, y: String, agg: String): DataFrame = {
    val yc: Column = agg match {
      case "sum" => sum(col(y).cast("double"))
      case "avg" => avg(col(y).cast("double"))
      case "count" => count(lit(1))
      case other => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    df.groupBy(x).agg(yc.as(s"${agg}_$y")).orderBy(x)
  }
}
