package graft.queries

import graft.io.Tables
import graft.service.QueryService
import org.apache.spark.sql.functions._

/** The interactive app surface (/root/reference/data-mgmt-streamlit.py):
  * each Streamlit interaction maps to a lazy DataFrame transform —
  * any-column substring search (:56-62), per-column numeric range filters
  * (:129-148), bounded preview (:152), chart-cardinality capping
  * (:193-198). Registered as queries with pinned parameters so the driver
  * can oracle-check them; the parameterized forms live in
  * graft.service.QueryService.
  */
object Service {

  val defs: Seq[QueryDef] = Seq(
    // P6: case-insensitive substring search across every column
    // (data-mgmt-streamlit.py:56-62). Term pinned to "spark".
    QueryDef(
      "s01_any_column_search",
      (s, dir) => QueryService.search(Tables(s, dir).documents, "spark").orderBy("doc_id"),
      // Per-COLUMN contains OR'd, like the reference's row.astype(str)
      // .str.contains(s).any() — never a concatenated haystack (which
      // would admit cross-column matches spanning a separator boundary).
      Some("""SELECT * FROM documents
             |WHERE contains(lower(COALESCE(CAST(doc_id AS VARCHAR), '')), 'spark')
             |   OR contains(lower(COALESCE(text, '')), 'spark')
             |   OR contains(lower(COALESCE(lang, '')), 'spark')
             |   OR contains(lower(COALESCE(source, '')), 'spark')
             |   OR contains(lower(COALESCE(CAST(n_chars AS VARCHAR), '')), 'spark')
             |ORDER BY doc_id""".stripMargin)),

    // P7: numeric range filter (slider analog), plus an equality filter.
    QueryDef(
      "s02_numeric_range_filter",
      (s, dir) => QueryService.rangeFilter(Tables(s, dir).events, "value", 100, 200)
        .filter(col("event_type") === "click")
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
             |FROM events
             |WHERE value BETWEEN 100 AND 200 AND event_type = 'click'
             |ORDER BY event_id""".stripMargin)),

    // O6: bounded unordered preview — pinned to a deterministic order here
    // so the oracle can compare (the app's head(100) has no order contract).
    QueryDef(
      "s03_preview",
      (s, dir) => QueryService.preview(Tables(s, dir).documents.orderBy("doc_id"), 100),
      Some("SELECT * FROM documents ORDER BY doc_id LIMIT 100")),

    // O7: chart cardinality cap — keep the 10 most-used part types
    // (value_counts().nlargest analog).
    QueryDef(
      "s04_top_part_types",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.join(broadcast(t.part.select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_type")
          .agg(count(lit(1)).as("n_uses"))
          .orderBy(col("n_uses").desc, col("p_type").asc)
          .limit(10)
      },
      Some("""SELECT p_type, COUNT(*) AS n_uses
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1 ORDER BY n_uses DESC, p_type ASC LIMIT 10""".stripMargin)),

    // Distinct-values enumeration (the app's selectbox option lists).
    QueryDef(
      "s05_distinct_segments",
      (s, dir) => Tables(s, dir).customer
        .select("c_mktsegment").distinct().orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // Scalar-function coverage (SURVEY.md §2.8 F11-F17): IF / UCASE /
    // LCASE / SUBSTR / LENGTH / YEAR / MONTH / LAST_DAY / month-trunc /
    // TO_DAYS-as-datediff / STR_TO_DATE round-trip, in one projection.
    QueryDef(
      "s06_scalar_functions",
      (s, dir) => Tables(s, dir).orders.select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        lower(col("o_orderstatus")).as("status_lower"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        // Date results travel as yyyy-MM-dd strings: Spark's DATE arrives
        // in pandas as datetime.date while DuckDB's arrives as Timestamp,
        // so a raw DATE column can never hash-match across the bridge.
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .as("days_since_window_start"),
        date_format(to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd"),
          "yyyy-MM-dd").as("parsed_date"),
        when(col("o_totalprice") > 200000, "BIG").otherwise("SMALL").as("size_class"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  upper(o_orderpriority) AS prio_upper,
             |  lower(o_orderstatus) AS status_lower,
             |  substring(o_orderpriority, 1, 1) AS prio_code,
             |  length(o_orderpriority) AS prio_len,
             |  year(o_orderdate) AS order_year,
             |  month(o_orderdate) AS order_month,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_window_start,
             |  strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'), '%Y-%m-%d') AS parsed_date,
             |  CASE WHEN o_totalprice > 200000 THEN 'BIG' ELSE 'SMALL' END AS size_class
             |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
