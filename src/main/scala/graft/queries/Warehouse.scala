package graft.queries

import graft.warehouse.{RevenueSummary, View}
import org.apache.spark.sql.functions._

/** The 11 published warehouse queries (/root/reference/queries_shan.sql:44-144)
  * re-targeted at the star schema: every query derives from the
  * customer_revenue_summary view exactly as in the reference, with
  * deterministic ORDER BY tie-breakers (the reference relies on MySQL's
  * arbitrary tie order; SURVEY.md §2.6/§2.9).
  *
  * Queries that the reference publishes with `LIMIT k` keep the limit here —
  * Catalyst plans them as TakeOrderedAndProject (top-k without a full sort
  * of the whole result on the driver).
  */
object Warehouse {

  /** Pinned "as of" date for the inactivity query — the reference uses
    * CURDATE() (queries_shan.sql:86) which is nondeterministic; we pin it
    * (SURVEY.md §2.9.4). Chosen inside the synthetic data's order-date range
    * so the predicate selects a real subset at every scale factor.
    */
  val InactiveCutoff = "2001-01-01"

  private val V = RevenueSummary.oracleCtes

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_revenue_summary",
      (s, dir) => View.dw(s, dir).orderBy("customer_id"),
      Some(s"$V SELECT * FROM dw ORDER BY customer_id")),

    QueryDef(
      "q02_top_customers_by_revenue",
      (s, dir) => View.dw(s, dir)
        .select("customer_name", "total_revenue")
        .orderBy(col("total_revenue").desc, col("customer_name").asc)
        .limit(10),
      Some(s"$V SELECT customer_name, total_revenue FROM dw ORDER BY total_revenue DESC, customer_name ASC LIMIT 10")),

    QueryDef(
      "q03_most_frequent_customers",
      (s, dir) => View.dw(s, dir)
        .select("customer_name", "total_orders")
        .orderBy(col("total_orders").desc, col("customer_name").asc)
        .limit(10),
      Some(s"$V SELECT customer_name, total_orders FROM dw ORDER BY total_orders DESC, customer_name ASC LIMIT 10")),

    QueryDef(
      "q04_customer_segments",
      (s, dir) => View.dw(s, dir)
        .withColumn("order_frequency_group",
          when(col("total_orders") >= 13, "Frequent")
            .when(col("total_orders") >= 8, "Regular")
            .otherwise("Occasional"))
        .groupBy("order_frequency_group")
        .agg(
          count(lit(1)).as("customer_count"),
          moneySum(col("total_revenue")).as("total_revenue"))
        .orderBy("order_frequency_group"),
      Some(s"""$V SELECT CASE WHEN total_orders >= 13 THEN 'Frequent'
              |         WHEN total_orders >= 8 THEN 'Regular'
              |         ELSE 'Occasional' END AS order_frequency_group,
              |       COUNT(*) AS customer_count, CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
              |FROM dw GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q05_top_late_fee_customers",
      (s, dir) => View.dw(s, dir)
        .select("customer_name", "total_late_fees")
        .orderBy(col("total_late_fees").desc, col("customer_name").asc)
        .limit(10),
      Some(s"$V SELECT customer_name, total_late_fees FROM dw ORDER BY total_late_fees DESC, customer_name ASC LIMIT 10")),

    QueryDef(
      "q06_inactive_customers",
      (s, dir) => View.dw(s, dir)
        .select("customer_name", "last_order_date")
        .filter(col("last_order_date") < lit(InactiveCutoff).cast("timestamp"))
        .orderBy("customer_name"),
      Some(s"$V SELECT customer_name, last_order_date FROM dw WHERE last_order_date < TIMESTAMP '$InactiveCutoff 00:00:00' ORDER BY customer_name")),

    QueryDef(
      "q07_customer_lifetime",
      (s, dir) => View.dw(s, dir)
        .select(col("customer_name"), col("first_order_date"), col("last_order_date"),
          col("total_revenue").as("lifetime_spending"))
        .orderBy(col("lifetime_spending").desc, col("customer_name").asc),
      Some(s"$V SELECT customer_name, first_order_date, last_order_date, total_revenue AS lifetime_spending FROM dw ORDER BY lifetime_spending DESC, customer_name ASC")),

    QueryDef(
      "q08_acquisition_cohorts",
      (s, dir) => View.dw(s, dir)
        .withColumn("customer_cohort", date_format(col("first_order_date"), "yyyy-MM"))
        .groupBy("customer_cohort")
        .agg(
          count(lit(1)).as("new_customers"),
          moneySum(col("total_revenue")).as("total_revenue"))
        .orderBy("customer_cohort"),
      Some(s"""$V SELECT strftime(first_order_date, '%Y-%m') AS customer_cohort,
              |       COUNT(*) AS new_customers, CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
              |FROM dw GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q09_revenue_by_nation",
      (s, dir) => View.dw(s, dir)
        .groupBy("nation")
        .agg(
          count(lit(1)).as("total_customers"),
          moneySum(col("total_revenue")).as("total_revenue"))
        .orderBy(col("total_revenue").desc, col("nation").asc),
      Some(s"""$V SELECT nation, COUNT(*) AS total_customers, CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
              |FROM dw GROUP BY 1 ORDER BY total_revenue DESC, nation ASC""".stripMargin)),

    QueryDef(
      "q10_revenue_by_region_nation",
      (s, dir) => View.dw(s, dir)
        .groupBy("region", "nation")
        .agg(
          count(lit(1)).as("total_customers"),
          moneySum(col("total_revenue")).as("total_revenue"))
        .orderBy("region", "nation"),
      Some(s"""$V SELECT region, nation, COUNT(*) AS total_customers, CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
              |FROM dw GROUP BY 1, 2 ORDER BY region, nation""".stripMargin)),

    QueryDef(
      "q11_nation_avg_revenue",
      (s, dir) => View.dw(s, dir)
        .groupBy("nation")
        .agg(
          count(lit(1)).as("total_customers"),
          moneySum(col("total_revenue")).as("total_revenue"))
        .withColumn("avg_revenue_per_customer",
          ratio(col("total_revenue"), col("total_customers")))
        .orderBy(col("avg_revenue_per_customer").desc, col("nation").asc),
      Some(s"""$V SELECT nation, COUNT(*) AS total_customers, CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
              |       CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_revenue_per_customer
              |FROM dw GROUP BY 1 ORDER BY avg_revenue_per_customer DESC, nation ASC""".stripMargin))
  )
}
