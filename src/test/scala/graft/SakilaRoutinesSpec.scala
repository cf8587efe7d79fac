package graft

import graft.sakila.{Routines, SakilaTables}
import org.apache.spark.sql.functions._

/** The Sakila stored routines bound to the actual Sakila tables
  * (set-based re-expressions). Expected component values are computed
  * independently from the reference data dump (DuckDB), embedded as
  * constants; plus the structural invariants each routine guarantees.
  */
class SakilaRoutinesSpec extends SparkSuite {

  private val fixtures = getClass.getResource("/sakila").getPath
  private lazy val t = SakilaTables(spark, fixtures)

  test("get_customer_balance: pinned components for customer 1, both effective dates") {
    def comp(asOf: String) = {
      val b = Routines.getCustomerBalance(t, asOf)
      b.filter(b("customer_id") === 1).collect().head
    }
    val mid = comp("2005-08-01 00:00:00")
    assert(mid.getAs[java.math.BigDecimal]("rent_fees").toString === "68.79")
    assert(mid.getAs[Long]("over_fees") === 18L)
    assert(mid.getAs[java.math.BigDecimal]("payments").toString === "86.79")
    val end = comp("2006-03-01 00:00:00")
    assert(end.getAs[java.math.BigDecimal]("rent_fees").toString === "93.68")
    assert(end.getAs[Long]("over_fees") === 25L)
    assert(end.getAs[java.math.BigDecimal]("payments").toString === "118.68")
    assert(end.getAs[java.math.BigDecimal]("balance").compareTo(java.math.BigDecimal.ZERO) === 0)
  }

  test("get_customer_balance: every customer present; Sakila payments settle all balances") {
    val b = Routines.getCustomerBalance(t, "2006-03-01 00:00:00").cache()
    assert(b.count() === 599)
    // The Sakila generator charges amount = rate + late fees, so at a date
    // after the last payment balances settle to exactly 0.00 — except
    // customer 554, who paid a late fee on a rental with no return_date
    // (the function bills unreturned rentals nothing): -3.00.
    val nonzero = b.filter(col("balance") =!= 0)
      .select("customer_id", "balance").collect()
    assert(nonzero.length === 1)
    assert(nonzero.head.getAs[Int]("customer_id") === 554)
    assert(nonzero.head.getAs[java.math.BigDecimal]("balance").toString === "-3.00")
  }

  test("inventory_in_stock: in-stock + held partitions inventory; 183 items out") {
    val s = Routines.inventoryStatus(t).cache()
    assert(s.count() === 4581)
    assert(s.filter(col("in_stock") && col("held_by_customer").isNotNull).count() === 0)
    assert(s.filter(!col("in_stock") && col("held_by_customer").isNull).count() === 0)
    assert(s.filter(!col("in_stock")).count() === 183)
  }

  test("film_in_stock / film_not_in_stock partition a film's store inventory") {
    val inn = Routines.filmInStock(t, 1, 1).collect().map(_.getInt(0)).toSet
    val out = Routines.filmNotInStock(t, 1, 1).collect().map(_.getInt(0)).toSet
    assert(inn.size === 4 && out.isEmpty) // all 4 copies of film 1 at store 1 on shelf
    assert((inn & out).isEmpty)
  }

  test("rewards_report: pinned rewardee counts; thresholds enforced") {
    val today = "2005-08-15" // last calendar month = July 2005 (16k payments)
    assert(Routines.rewardsReport(t, 3, new java.math.BigDecimal("20.00"), today)
      .count() === 581)
    val elite = Routines.rewardsReport(t, 5, new java.math.BigDecimal("100.00"), today)
    assert(elite.count() === 1)
    // The procedure returns full customer rows (SELECT c.*).
    assert(elite.columns.contains("first_name") && elite.columns.contains("email"))
    intercept[IllegalArgumentException] {
      Routines.rewardsReport(t, 0, new java.math.BigDecimal("1.00"), today)
    }
  }

  test("film_text: the trigger-maintained projection of film") {
    val ft = Routines.filmText(t.film)
    assert(ft.columns.toSeq === Seq("film_id", "title", "description"))
    assert(ft.count() === 1000)
    assert(ft.filter(col("film_id") === 1).collect().head.getAs[String]("title")
      === "ACADEMY DINOSAUR")
  }
}
