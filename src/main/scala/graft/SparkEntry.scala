package graft

import graft.queries.Registry
import graft.warehouse.View
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-compare correctness gate. Both are assembled from
  * graft.queries.Registry so a query and its oracle live side by side.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full customer revenue summary view — the engine's core derived
    * table (reference: queries_shan.sql:7-42).
    */
  def entry(spark: SparkSession): DataFrame =
    View.dw(spark, "/root/testdata/sf0.001").orderBy("customer_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queryMap

  def oracleSql: Map[String, String] = Registry.oracleMap
}
