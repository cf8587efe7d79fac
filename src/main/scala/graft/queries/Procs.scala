package graft.queries

import graft.io.Tables
import graft.warehouse.{RevenueSummary, View}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's stored routines (sql/sakila-schema.sql:479-678) as
  * set-oriented DataFrame functions — not per-row UDFs, so Catalyst sees
  * the joins (SURVEY.md §2.11):
  *
  *   - get_customer_balance (:546-585)  -> p01 outstanding balance as-of
  *   - rewards_report       (:479-540)  -> p02 threshold HAVING report
  *   - inventory_in_stock   (:651-678)  -> p03 anti-join staleness probe
  *   - GROUP_CONCAT views   (:451-462)  -> p04 ordered string aggregation
  *   - plus a LEFT JOIN + COALESCE activity roll-up (J2/F3 coverage)
  */
object Procs {

  /** Pinned as-of instant for the balance proc (the reference takes it as a
    * parameter; pinned for the oracle). */
  val BalanceAsOf = "2000-06-01"

  /** Staleness horizon for the anti-join probe. */
  val StaleSince = "2001-09-01"

  private val V = RevenueSummary.oracleCtes

  val defs: Seq[QueryDef] = Seq(
    // U1 get_customer_balance: per-customer value of items ordered on or
    // before the as-of date but not yet shipped by it, plus a $1/day
    // overdue charge past 30 days — three correlated aggregates in the
    // reference, one grouped scan here.
    QueryDef(
      "p01_outstanding_balance",
      (s, dir) => {
        val t = Tables(s, dir)
        val asOf = lit(BalanceAsOf).cast("timestamp")
        val overdueDays = datediff(to_date(lit(BalanceAsOf)), to_date(col("o_orderdate")))
        val open = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") <= asOf && col("l_shipdate") > asOf)
        open.groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("n_open_items"),
            sum(
              money(col("l_extendedprice") * (lit(1) - col("l_discount"))) +
              money(when(overdueDays > 30, (overdueDays - 30) * lit(1.0)).otherwise(lit(0.0))))
              .cast("double").as("balance"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"),
            col("n_open_items"), col("balance"))
          .orderBy("customer_id")
      },
      Some(s"""SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
              |       COUNT(*) AS n_open_items,
              |       CAST(SUM(
              |         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) +
              |         CAST(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), DATE '$BalanceAsOf') > 30
              |                   THEN (date_diff('day', CAST(o.o_orderdate AS DATE), DATE '$BalanceAsOf') - 30) * 1.0
              |                   ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS balance
              |FROM lineitem l
              |JOIN orders o ON l.l_orderkey = o.o_orderkey
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |WHERE o.o_orderdate <= TIMESTAMP '$BalanceAsOf 00:00:00'
              |  AND l.l_shipdate  >  TIMESTAMP '$BalanceAsOf 00:00:00'
              |GROUP BY 1, 2 ORDER BY customer_id""".stripMargin)),

    // U3 rewards_report: customers clearing BOTH thresholds inside a pinned
    // window (HAVING on two aggregates, A12).
    QueryDef(
      "p02_rewards_report",
      (s, dir) => {
        val t = Tables(s, dir)
        val lo = lit("2000-01-01").cast("timestamp")
        val hi = lit("2001-01-01").cast("timestamp")
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .groupBy(col("o_custkey"))
          .agg(
            countDistinct(col("o_orderkey")).as("orders_in_period"),
            moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("period_revenue"))
          .filter(col("orders_in_period") >= 3 && col("period_revenue") >= 100000)
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"),
            col("orders_in_period"), col("period_revenue"))
          .orderBy("customer_id")
      },
      Some(s"""SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
              |       COUNT(DISTINCT o.o_orderkey) AS orders_in_period,
              |       ${sqlMoneySum("l.l_extendedprice * (1 - l.l_discount)")} AS period_revenue
              |FROM lineitem l
              |JOIN orders o ON l.l_orderkey = o.o_orderkey
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              |  AND o.o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
              |GROUP BY 1, 2
              |HAVING COUNT(DISTINCT o.o_orderkey) >= 3
              |   AND CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) >= 100000
              |ORDER BY customer_id""".stripMargin)),

    // U2/J10 inventory_in_stock: left-anti join — parts with no shipment
    // since the pinned horizon ("not out on rental" analog).
    QueryDef(
      "p03_stale_parts",
      (s, dir) => {
        val t = Tables(s, dir)
        val recent = t.lineitem
          .filter(col("l_shipdate") >= lit(StaleSince).cast("timestamp"))
          .select("l_partkey")
        t.part.join(recent, col("p_partkey") === col("l_partkey"), "left_anti")
          .select("p_partkey", "p_name", "p_type")
          .orderBy("p_partkey")
      },
      Some(s"""SELECT p_partkey, p_name, p_type FROM part p
              |WHERE NOT EXISTS (
              |  SELECT 1 FROM lineitem l
              |  WHERE l.l_partkey = p.p_partkey
              |    AND l.l_shipdate >= TIMESTAMP '$StaleSince 00:00:00')
              |ORDER BY p_partkey""".stripMargin)),

    // U4 film_in_stock complement of p03: left-semi join — parts WITH
    // recent shipments (EXISTS probe, J10's other half).
    QueryDef(
      "p06_active_parts",
      (s, dir) => {
        val t = Tables(s, dir)
        val recent = t.lineitem
          .filter(col("l_shipdate") >= lit(StaleSince).cast("timestamp"))
          .select("l_partkey")
        t.part.join(recent, col("p_partkey") === col("l_partkey"), "left_semi")
          .select("p_partkey", "p_name", "p_type")
          .orderBy("p_partkey")
      },
      Some(s"""SELECT p_partkey, p_name, p_type FROM part p
              |WHERE EXISTS (
              |  SELECT 1 FROM lineitem l
              |  WHERE l.l_partkey = p.p_partkey
              |    AND l.l_shipdate >= TIMESTAMP '$StaleSince 00:00:00')
              |ORDER BY p_partkey""".stripMargin)),

    // A13 GROUP_CONCAT (ordered): per nation, the alphabetized list of its
    // top-5 revenue customers. collect_list order is nondeterministic in
    // Spark, hence the explicit array_sort (SURVEY.md §2.4 A13).
    QueryDef(
      "p04_nation_top_customer_list",
      (s, dir) => {
        val w = Window.partitionBy(col("nation"))
          .orderBy(col("total_revenue").desc, col("customer_name").asc)
        View.dw(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy("nation")
          .agg(array_join(array_sort(collect_list(col("customer_name"))), ", ")
            .as("top_customers"))
          .orderBy("nation")
      },
      Some(s"""$V , ranked AS (
              |  SELECT nation, customer_name,
              |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY total_revenue DESC, customer_name ASC) AS rn
              |  FROM dw)
              |SELECT nation, string_agg(customer_name, ', ' ORDER BY customer_name) AS top_customers
              |FROM ranked WHERE rn <= 5 GROUP BY nation ORDER BY nation""".stripMargin)),

    // Set operation (EXCEPT): customers who ordered in 2000 but not in
    // 2001 — churned-cohort shape. (The reference itself uses no set ops,
    // SURVEY §2.7; this completes the engine surface.)
    QueryDef(
      "p07_churned_customers",
      (s, dir) => {
        val o = Tables(s, dir).orders
        def activeIn(year: Int) = o
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
          .select(col("o_custkey").as("customer_id"))
          .distinct()
        activeIn(2000).except(activeIn(2001)).orderBy("customer_id")
      },
      Some("""SELECT DISTINCT o_custkey AS customer_id FROM orders
             |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
             |EXCEPT
             |SELECT DISTINCT o_custkey FROM orders
             |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '2002-01-01 00:00:00'
             |ORDER BY customer_id""".stripMargin)),

    // Set operation (INTERSECT): customers active in BOTH years —
    // retained-cohort complement of p07.
    QueryDef(
      "p08_retained_customers",
      (s, dir) => {
        val o = Tables(s, dir).orders
        def activeIn(year: Int) = o
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
          .select(col("o_custkey").as("customer_id"))
          .distinct()
        activeIn(2000).intersect(activeIn(2001)).orderBy("customer_id")
      },
      Some("""SELECT DISTINCT o_custkey AS customer_id FROM orders
             |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
             |INTERSECT
             |SELECT DISTINCT o_custkey FROM orders
             |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '2002-01-01 00:00:00'
             |ORDER BY customer_id""".stripMargin)),

    // J2 LEFT OUTER + F3 COALESCE: every customer's activity in a window,
    // zeros preserved for the inactive ones.
    QueryDef(
      "p05_window_activity",
      (s, dir) => {
        val t = Tables(s, dir)
        val sub = t.orders
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("2001-07-01").cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
        t.customer.join(sub, col("c_custkey") === col("o_custkey"), "left")
          .select(
            col("c_custkey").as("customer_id"),
            col("c_name").as("customer_name"),
            coalesce(col("n"), lit(0L)).as("orders_in_period"),
            coalesce(col("spend"), lit(0.0)).as("spend_in_period"))
          .orderBy("customer_id")
      },
      Some(s"""SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
              |       COALESCE(s.n, 0) AS orders_in_period,
              |       COALESCE(s.spend, 0.0) AS spend_in_period
              |FROM customer c LEFT JOIN (
              |  SELECT o_custkey, COUNT(*) AS n, ${sqlMoneySum("o_totalprice")} AS spend
              |  FROM orders
              |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
              |    AND o_orderdate <  TIMESTAMP '2001-07-01 00:00:00'
              |  GROUP BY 1) s ON s.o_custkey = c.c_custkey
              |ORDER BY customer_id""".stripMargin))
  )
}
