package graft.queries

import graft.io.Tables
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
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val hay = lower(concat_ws("|",
          docs.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
        docs.filter(hay.contains("spark")).orderBy("doc_id")
      },
      Some("""SELECT * FROM documents
             |WHERE contains(lower(concat_ws('|',
             |  COALESCE(CAST(doc_id AS VARCHAR), ''), COALESCE(text, ''),
             |  COALESCE(lang, ''), COALESCE(source, ''),
             |  COALESCE(CAST(n_chars AS VARCHAR), ''))), 'spark')
             |ORDER BY doc_id""".stripMargin)),

    // P7: numeric range filter (slider analog), plus an equality filter.
    QueryDef(
      "s02_numeric_range_filter",
      (s, dir) => Tables(s, dir).events
        .filter(col("value").between(100, 200) && col("event_type") === "click")
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
      (s, dir) => Tables(s, dir).documents.orderBy("doc_id").limit(100),
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
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))
  )
}
