package graft

import graft.sakila.{Sakila, SakilaReport, SakilaTables}
import org.apache.spark.sql.functions._

/** Shape/conservation invariants for the report-PDF query variants (no
  * golden CSVs exist — the report embeds screenshots; SURVEY.md §5.2's
  * verified constants are the oracle).
  */
class SakilaReportSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = SakilaTables(spark, getClass.getResource("/sakila").getPath)
  private lazy val dw = Sakila.revenueView(t).cache()
  private lazy val q = SakilaReport.queries(t, dw)

  test("rq1: 25 rows, ordered by revenue then rentals; top is KARL SEAL") {
    val rows = q("rq1_top_customers").collect()
    assert(rows.length === 25)
    assert(rows.head.getString(0) === "KARL SEAL")
    val revs = rows.map(_.getDecimal(1).doubleValue())
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("rq2: one row per country (108), averages positive") {
    val rows = q("rq2_avg_spending_by_country")
    assert(rows.count() === 108)
    assert(rows.filter(col("Avg_Spending_Per_Rental") <= 0).count() === 0)
  }

  test("rq3: monthly trend conserves total revenue 67406.56") {
    val total = q("rq3_monthly_revenue_trend")
      .agg(sum("Monthly_Revenue")).first().getDecimal(0)
    assert(total.toString === "67406.56")
    assert(q("rq3_monthly_revenue_trend").count() === 5) // 2005-05..08 + 2006-02
  }

  test("rq4: genre x country revenue conserves the total") {
    val total = q("rq4_genre_revenue_by_country").agg(sum("Total_Revenue")).first().getDecimal(0)
    assert(total.toString === "67406.56")
  }

  test("rq5: 25 rows, per-day values consistent with the view") {
    val rows = q("rq5_clv_per_day").as[(String, java.math.BigDecimal, java.math.BigDecimal)].collect()
    assert(rows.length === 25)
    rows.foreach { case (_, rev, perDay) =>
      assert(perDay.doubleValue() > 0 && perDay.doubleValue() <= rev.doubleValue())
    }
  }

  test("rq6: 7 weekdays, rentals sum to 16044, revenue conserves") {
    val df = q("rq6_peak_rental_days")
    assert(df.count() === 7)
    assert(df.agg(sum("Rental_Count")).first().getLong(0) === 16044L)
    assert(df.agg(sum("Total_Revenue")).first().getDecimal(0).toString === "67406.56")
  }
}
