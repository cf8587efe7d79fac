package graft.warehouse

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-view reuse: the reference re-executes its view for each of
  * the 11 queries (MySQL recomputes view text per query; SURVEY.md §4
  * "derived-view reuse"). We compute it once per (session, sf-dir), cache
  * it, and register it as a temp view — every downstream query reads the
  * cached columnar batches instead of re-running the 3-grain aggregation.
  * At cluster scale the same role is played by persisting the view as
  * bucketed parquet.
  */
object View {
  private val cache = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def dw(spark: SparkSession, dir: String): DataFrame = {
    val df = cache.getOrElseUpdate((spark, dir),
      graft.ops.Ckpt.registerCached(
        RevenueSummary(Tables(spark, dir)).cache(), "View.dw"))
    // Re-register on EVERY call, not just cache miss: with two data dirs
    // in one session, a cache hit after the other dir registered would
    // leave the temp view pointing at the wrong dataset for SQL-path
    // consumers (r08_geo_rollup) while DataFrame consumers stayed right.
    df.createOrReplaceTempView("customer_revenue_summary")
    df
  }
}
