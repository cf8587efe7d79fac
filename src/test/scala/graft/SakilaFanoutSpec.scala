package graft

import graft.sakila.{Sakila, SakilaTables}
import org.apache.spark.sql.functions._

/** FIXTURES.md §2 adversarial micro-fixtures: what the real Sakila data
  * never exercises (it is 1:1:1). The reference's view counts JOIN ROWS
  * (queries_shan.sql:11 — COUNT(r.rental_id) over the fan-out join), so
  * on a rental with 2 payments and a film with 2 categories the
  * "Total_Rentals" of that customer inflates multiplicatively. Our view
  * must reproduce exactly that (documented hazard SURVEY.md §2.9.1) —
  * this spec pins the fan-out arithmetic so nobody "fixes" it into
  * entity counts and silently diverges from the reference.
  */
class SakilaFanoutSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("sakila-fanout").toString
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$d/$name.parquet")

    w("customer", Seq((1, "ADA", "FAN", 1)).toDF("customer_id", "first_name", "last_name", "address_id"))
    w("address", Seq((1, 1)).toDF("address_id", "city_id"))
    w("city", Seq((1, "Microtown", 1)).toDF("city_id", "city", "country_id"))
    w("country", Seq((1, "Testland")).toDF("country_id", "country"))
    // r1: returned 9 days after rental vs duration 5; has TWO payments.
    // r2: never returned (NULL); has NO payment.
    w("rental", Seq(
      (1, ts("2005-01-01 10:00:00"), 1, 1, Option(ts("2005-01-10 10:00:00"))),
      (2, ts("2005-02-01 10:00:00"), 1, 1, Option.empty[java.sql.Timestamp]))
      .toDF("rental_id", "rental_date", "inventory_id", "customer_id", "return_date"))
    w("inventory", Seq((1, 1)).toDF("inventory_id", "film_id"))
    w("film", Seq((1, 5)).toDF("film_id", "rental_duration"))
    w("payment", Seq(
      (1, 1, new java.math.BigDecimal("10.00")),
      (2, 1, new java.math.BigDecimal("5.00")))
      .toDF("payment_id", "rental_id", "amount"))
    // ONE film in TWO categories.
    w("film_category", Seq((1, 1), (1, 2)).toDF("film_id", "category_id"))
    w("category", Seq((1, "Action"), (2, "Comedy")).toDF("category_id", "name"))
    d
  }

  test("fan-out join-row semantics match the reference's view exactly") {
    val row = Sakila.revenueView(SakilaTables(spark, dir)).collect().head
    // Join rows: r1 × {p1,p2} × {Action,Comedy} = 4; r2 × {null payment} × 2 cats = 2.
    assert(row.getAs[Long]("Total_Rentals") === 6)
    assert(row.getAs[Long]("Total_Payments") === 4)        // 2 payments × 2 categories
    assert(row.getAs[java.math.BigDecimal]("Total_Revenue").toString === "30.00") // (10+5) × 2
    assert(row.getAs[java.math.BigDecimal]("Avg_Spending_Per_Rental").toString === "5.00") // 30/6
    assert(row.getAs[Long]("Total_Categories_Rented") === 2)
    // r1 is 4 days late (9 − 5) → $2.00/row across its 4 join rows; r2 NULL → 0.
    assert(row.getAs[java.math.BigDecimal]("Total_Late_Fees").toString === "8.00")
    assert(row.getAs[String]("Most_Frequent_Category") === "Action") // tie 2-2 → name asc
    assert(row.getAs[java.sql.Timestamp]("First_Rental_Date") === ts("2005-01-01 10:00:00"))
    assert(row.getAs[java.sql.Timestamp]("Last_Rental_Date") === ts("2005-02-01 10:00:00"))
  }
}
