package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle over the same
  * parquet tables. The driver's correctness gate (see the repo contract in
  * SparkEntry) hash-compares the two with columns sorted by name — so both
  * sides alias every computed column identically and ORDER BY the full key.
  *
  * `bench = true` marks the query as part of the headline benchmark set
  * (graft.Bench); heavy O(n^2)-shaped diagnostics stay out of the bench.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

object QueryDef {
  /** DuckDB-side rendering of a money value: per-row cast to DECIMAL(18,2)
    * before SUM so the aggregate is exact and order-independent — the same
    * contract as graft.queries.money on the Spark side. Doubles summed
    * directly would differ between engines in the last bits (different
    * reduction order); decimals cannot.
    */
  val MoneyNote = "cast-to-decimal-before-sum"
}
