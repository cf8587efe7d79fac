package graft.warehouse

import graft.io.Tables
import graft.queries._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's core derived table — the Spark-native re-expression of the
  * reference's `customer_revenue_summary` view
  * (/root/reference/queries_shan.sql:7-42) over the star schema.
  *
  * Design notes (scale-first, see SURVEY.md §2.9/§7.4):
  *
  *   - The reference computes everything in ONE 8-way fan-out join and
  *     counts join rows. That is only correct when rentals:payments:categories
  *     are 1:1:1 (true on Sakila, false in general, false here: orders fan
  *     out to lineitems). We instead aggregate EACH GRAIN separately
  *     (orders / lineitems / categories) and join the per-customer results —
  *     both more correct and far cheaper at scale: three map-side-combined
  *     hash aggregates + joins on the same `custkey` key, instead of one
  *     giant fan-out shuffle of every fact row carrying every dim column.
  *
  *   - All per-customer aggregates shuffle once on the customer key; AQE
  *     coalesces the post-shuffle partitions. Dimension tables (nation 25,
  *     region 5, part 200·sf) are broadcast — no shuffle for the geo chain
  *     or the category lookup.
  *
  *   - The top-category-per-customer ("most frequent category",
  *     queries_shan.sql:15-23) is a correlated `ORDER BY cnt LIMIT 1`
  *     subquery in the reference, re-executed per customer. Here it is a
  *     decorrelated window rank over a pre-aggregated (customer, category)
  *     count — one shuffle, deterministic tie-break on category name
  *     (MySQL's tie choice is nondeterministic; SURVEY.md §2.4 A7).
  *
  *   - Money stays DECIMAL(18,2) from the first per-row cast so every
  *     downstream sum is exact regardless of partitioning (see
  *     graft.queries.money).
  */
object RevenueSummary {

  /** Grace period (days) after which a shipment accrues late fees —
    * the analog of Sakila's `rental_duration`. */
  val GraceDays = 30

  def apply(t: Tables): DataFrame = {
    val orders = t.orders
    val li = t.lineitem

    // Grain 1: per-customer order stats (count + first/last date).
    val ord = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count(lit(1)).as("total_orders"),
        min("o_orderdate").as("first_order_date"),
        max("o_orderdate").as("last_order_date"))

    // Grain 2: per-customer lineitem stats. lineitem->orders is a
    // fact-fact join on the order key; AQE picks the strategy (at 100 TB:
    // co-partition/bucket both facts on orderkey so this is shuffle-free).
    val liOrders = li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
      li("l_orderkey") === col("o_orderkey"))
    val rev = liOrders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count(lit(1)).as("total_items"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"),
        sum(lateFeeExpr(GraceDays)).cast("double").as("total_late_fees"))

    // Grain 3: categories. part is a small dim -> broadcast. The
    // most-frequent-category uses the typed DeterministicMode aggregator
    // (graft.functions): ONE shuffle on custkey computes both the distinct
    // count and the tie-pinned mode — the window-rank formulation (kept in
    // sakila.Sakila for the W1 pattern) would add a second shuffle plus a
    // per-partition sort.
    val withCat = liOrders.join(broadcast(t.part.select("p_partkey", "p_type")),
      col("l_partkey") === col("p_partkey"))
    val catAgg = withCat
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        countDistinct(col("p_type")).as("n_categories"),
        graft.functions.DeterministicMode(col("p_type")).as("top_category"))

    // Geo chain: tiny dims, broadcast the whole chain.
    val geo = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation"), col("r_name").as("region"))

    geo
      .join(ord, col("c_custkey") === ord("custkey")).drop("custkey")
      .join(rev, col("c_custkey") === rev("custkey")).drop("custkey")
      .join(catAgg, col("c_custkey") === catAgg("custkey")).drop("custkey")
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        col("nation"), col("region"),
        col("total_orders"), col("total_items"),
        col("total_revenue"),
        ratio(col("total_revenue"), col("total_orders")).as("avg_order_value"),
        col("total_late_fees"),
        col("first_order_date"), col("last_order_date"),
        col("n_categories"), col("top_category"))
  }

  /** The same view as a DuckDB CTE block, reused as the prefix of every
    * oracle that reads the view. Kept in lock-step with apply() — every
    * alias matches the Spark column names exactly (driver compares columns
    * by sorted name).
    */
  val oracleCtes: String =
    s"""WITH ord AS (
       |  SELECT o_custkey AS custkey, COUNT(*) AS total_orders,
       |         MIN(o_orderdate) AS first_order_date, MAX(o_orderdate) AS last_order_date
       |  FROM orders GROUP BY 1
       |), rev AS (
       |  SELECT o.o_custkey AS custkey, COUNT(*) AS total_items,
       |         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       |         CAST(SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > $GraceDays
       |                  THEN CAST((date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) - $GraceDays) * 0.5 AS DECIMAL(18,4))
       |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS total_late_fees
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1
       |), catcnt AS (
       |  SELECT o.o_custkey AS custkey, p.p_type, COUNT(*) AS cnt
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1, 2
       |), ncat AS (
       |  SELECT custkey, COUNT(*) AS n_categories FROM catcnt GROUP BY 1
       |), topc AS (
       |  SELECT custkey, p_type AS top_category FROM (
       |    SELECT custkey, p_type,
       |           ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY cnt DESC, p_type ASC) AS rn
       |    FROM catcnt) ranked
       |  WHERE rn = 1
       |), dw AS (
       |  SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
       |         c.c_mktsegment AS segment, n.n_name AS nation, r.r_name AS region,
       |         ord.total_orders, rev.total_items, rev.total_revenue,
       |         rev.total_revenue / ord.total_orders AS avg_order_value,
       |         rev.total_late_fees,
       |         ord.first_order_date, ord.last_order_date,
       |         ncat.n_categories, topc.top_category
       |  FROM customer c
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  JOIN ord  ON ord.custkey = c.c_custkey
       |  JOIN rev  ON rev.custkey = c.c_custkey
       |  JOIN ncat ON ncat.custkey = c.c_custkey
       |  JOIN topc ON topc.custkey = c.c_custkey
       |)""".stripMargin
}
