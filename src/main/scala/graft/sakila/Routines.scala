package graft.sakila

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Sakila schema's stored routines (/root/reference/sql/
  * sakila-schema.sql:479-678) bound to the actual Sakila tables.
  *
  * MySQL evaluates these row-at-a-time (a scalar function per probed id);
  * the Spark-first re-expression is set-based: each routine becomes a
  * whole-table DataFrame keyed by the routine's input id, and "calling"
  * it for one id is a filter. That turns O(rows) function invocations
  * into one distributed plan — the only shape that survives scale — while
  * keeping per-id results identical.
  */
object Routines {

  /** get_customer_balance (sakila-schema.sql:546-585), for every
    * customer at once. Balance components per the reference:
    * rental fees for rentals started on/before the effective date,
    * $1/day overdue fees (date-truncated day diff, unreturned rentals
    * contribute nothing — MySQL's IF(NULL > x) falls to the 0 branch),
    * minus payments made on/before the date. Customers with no activity
    * balance to 0.00 via the IFNULL(...,0) coalesces.
    *
    * (The reference's clause 3 — charging replacement_cost past
    * rental_duration*2 — is a comment in the original source, not code;
    * byte-fidelity means reproducing what the function DOES.)
    */
  def getCustomerBalance(t: SakilaTables, effectiveDate: String): DataFrame = {
    val asOf = lit(effectiveDate).cast("timestamp")
    val rentalsAsOf = t.rental
      .filter(col("rental_date") <= asOf)
      .join(broadcast(t.inventory.select("inventory_id", "film_id")), "inventory_id")
      .join(broadcast(t.film.select("film_id", "rental_rate", "rental_duration")), "film_id")
    val lateDays = datediff(to_date(col("return_date")), to_date(col("rental_date")))
    val fees = rentalsAsOf.groupBy("customer_id").agg(
      sum(col("rental_rate")).as("rent_fees"),
      sum(when(lateDays > col("rental_duration"),
        lateDays - col("rental_duration")).otherwise(0)).as("over_fees"))
    val payments = t.payment
      .filter(col("payment_date") <= asOf)
      .groupBy("customer_id").agg(sum(col("amount")).as("payments"))
    val zero = lit(new java.math.BigDecimal("0.00"))
    t.customer.select("customer_id")
      .join(fees, Seq("customer_id"), "left")
      .join(payments, Seq("customer_id"), "left")
      .select(
        col("customer_id"),
        coalesce(col("rent_fees"), zero).as("rent_fees"),
        coalesce(col("over_fees"), lit(0L)).as("over_fees"),
        coalesce(col("payments"), zero).as("payments"),
        (coalesce(col("rent_fees"), zero) + coalesce(col("over_fees"), lit(0L))
          - coalesce(col("payments"), zero)).as("balance"))
  }

  /** inventory_held_by_customer (sakila-schema.sql:633-648) +
    * inventory_in_stock (:651-678) fused at inventory grain: one row per
    * inventory item with the holding customer (NULL if on the shelf) and
    * the in-stock flag (no open rental). One anti-ish left join on the
    * open-rental set instead of two probes per item.
    */
  def inventoryStatus(t: SakilaTables): DataFrame = {
    val open = t.rental.filter(col("return_date").isNull)
      .select(col("inventory_id"), col("customer_id").as("held_by_customer"))
    t.inventory.select("inventory_id", "film_id", "store_id")
      .join(open, Seq("inventory_id"), "left")
      .withColumn("in_stock", col("held_by_customer").isNull)
  }

  /** inventory_in_stock as the boolean frame (inventory_id, in_stock). */
  def inventoryInStock(t: SakilaTables): DataFrame =
    inventoryStatus(t).select("inventory_id", "in_stock")

  /** film_in_stock (sakila-schema.sql:591-607): in-stock inventory ids
    * for a (film, store); the OUT count is `.count()` on the result.
    */
  def filmInStock(t: SakilaTables, filmId: Int, storeId: Int): DataFrame =
    inventoryStatus(t)
      .filter(col("film_id") === filmId && col("store_id") === storeId && col("in_stock"))
      .select("inventory_id")

  /** film_not_in_stock (sakila-schema.sql:611-627). */
  def filmNotInStock(t: SakilaTables, filmId: Int, storeId: Int): DataFrame =
    inventoryStatus(t)
      .filter(col("film_id") === filmId && col("store_id") === storeId && !col("in_stock"))
      .select("inventory_id")

  /** rewards_report (sakila-schema.sql:479-540): customers whose
    * last-calendar-month payments exceed both thresholds; returns the
    * full customer rows like the procedure's final SELECT c.*. The
    * procedure's CURRENT_DATE is pinned via `today` (the same
    * pinned-clock convention as Sakila.Today); the reference's sanity
    * checks on non-positive thresholds become a require().
    */
  def rewardsReport(t: SakilaTables, minMonthlyPurchases: Int,
      minDollarAmountPurchased: java.math.BigDecimal, today: String): DataFrame = {
    require(minMonthlyPurchases > 0, "Minimum monthly purchases parameter must be > 0")
    require(minDollarAmountPurchased.signum > 0,
      "Minimum monthly dollar amount purchased parameter must be > $0.00")
    val lastMonthStart = trunc(add_months(lit(today).cast("date"), -1), "month")
    val rewardees = t.payment
      .filter(to_date(col("payment_date")).between(lastMonthStart, last_day(lastMonthStart)))
      .groupBy("customer_id")
      .agg(sum(col("amount")).as("amt"), count(col("customer_id")).as("cnt"))
      .filter(col("amt") > lit(minDollarAmountPurchased) &&
        col("cnt") > minMonthlyPurchases)
      .select("customer_id")
    t.customer.join(rewardees, "customer_id")
  }

  /** film_text (sakila-schema.sql:214-234): the trigger-maintained
    * derived table is, semantically, this projection of film — Spark has
    * no triggers and needs none; any write of `film` re-derives it.
    */
  def filmText(film: DataFrame): DataFrame =
    film.select("film_id", "title", "description")
}
