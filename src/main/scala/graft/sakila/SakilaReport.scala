package graft.sakila

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The course report's 8 earlier query variants
  * (/root/reference/report/DataManagement_Shan.pdf pp.8-15; shapes as
  * distilled in SURVEY.md §2 — the PDF embeds them as screenshots, so the
  * survey's structural reading is the spec). These add what the published
  * 11 don't: multi-key top-k, AVG of a ratio column, payment-grain
  * monthly trend, per-country genre revenue, CLV-per-day, DAYNAME peaks.
  *
  * No golden CSVs exist for these (the report shows screenshots);
  * SakilaReportSpec asserts the conservation/shape invariants instead.
  */
object SakilaReport {

  /** Report p.8 — top customers, multi-key ORDER BY, LIMIT 25. */
  def topCustomers(dw: DataFrame): DataFrame =
    dw.select("Customer_Name", "Total_Revenue", "Total_Rentals")
      .orderBy(col("Total_Revenue").desc, col("Total_Rentals").desc, col("Customer_Name").asc)
      .limit(25)

  /** Report p.9 — AVG of the per-customer spend ratio by country. */
  def avgSpendingByCountry(dw: DataFrame): DataFrame =
    dw.groupBy(col("Customer_Country").as("Country"))
      .agg(round(avg(col("Avg_Spending_Per_Rental")), 2).as("Avg_Spending_Per_Rental"))
      .orderBy(col("Avg_Spending_Per_Rental").desc, col("Country").asc)

  /** Report p.10 — monthly revenue trend at payment grain. */
  def monthlyRevenueTrend(t: SakilaTables): DataFrame =
    t.payment
      .groupBy(date_format(col("payment_date"), "yyyy-MM").as("Month"))
      .agg(round(sum(col("amount")), 2).as("Monthly_Revenue"))
      .orderBy("Month")

  /** Report p.12 — genre revenue by country ("Top Movie Genre by
    * Country"): the report eyeballs the top row per country from a
    * (country, genre) revenue listing; the within-country ordering makes
    * that deterministic here.
    */
  def genreRevenueByCountry(dw: DataFrame): DataFrame =
    dw.groupBy(col("Customer_Country").as("Country"),
        col("Most_Frequent_Category").as("Genre"))
      .agg(round(sum(col("Total_Revenue")), 2).as("Total_Revenue"))
      .orderBy(col("Country").asc, col("Total_Revenue").desc, col("Genre").asc)

  /** Report p.14 — customer lifetime value per active day. */
  def clvPerDay(dw: DataFrame): DataFrame =
    dw.select(
        col("Customer_Name"),
        col("Total_Revenue"),
        round(col("Total_Revenue") /
          greatest(datediff(to_date(col("Last_Rental_Date")), to_date(col("First_Rental_Date"))), lit(1)), 2)
          .as("Revenue_Per_Day"))
      .orderBy(col("Revenue_Per_Day").desc, col("Customer_Name").asc)
      .limit(25)

  /** Report p.15 — peak rental days (DAYNAME). */
  def peakRentalDays(t: SakilaTables): DataFrame =
    t.rental
      .join(t.payment.select("rental_id", "amount"), Seq("rental_id"), "left")
      .groupBy(date_format(col("rental_date"), "EEEE").as("Rental_Day"))
      .agg(
        count(col("rental_id")).as("Rental_Count"),
        round(sum(col("amount")), 2).as("Total_Revenue"))
      .orderBy(col("Rental_Count").desc, col("Rental_Day").asc)

  /** All report variants keyed rq1..rq6 (plus the p.8/p.11 LIMIT-25
    * re-sorts of published q1-q3, which topCustomers subsumes). */
  def queries(t: SakilaTables, dw: DataFrame): Map[String, DataFrame] = Map(
    "rq1_top_customers" -> topCustomers(dw),
    "rq2_avg_spending_by_country" -> avgSpendingByCountry(dw),
    "rq3_monthly_revenue_trend" -> monthlyRevenueTrend(t),
    "rq4_genre_revenue_by_country" -> genreRevenueByCountry(dw),
    "rq5_clv_per_day" -> clvPerDay(dw),
    "rq6_peak_rental_days" -> peakRentalDays(t))
}
