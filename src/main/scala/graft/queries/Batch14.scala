package graft.queries

import graft.io.Tables

/** Round-14 batch: the AMS shard-merge audit (x226) — the tug-of-war
  * sketch's membership proof in the mergeable-sketch audit family
  * (x175 MinHash, x191/x201 HLL, x219 KMV), closing the round-13
  * verdict's sketch-family-symmetry stretch. Implementation lives in
  * ext/Frequent; the binding here pins parameters and carries the
  * DuckDB oracle twin.
  */
object Batch14 {

  val defs: Seq[QueryDef] = Seq(

    // AMS F2 shard-merge audit (Frequent.amsF2MergeAudit): per-shard
    // tug-of-war counters merged by plain ADDITION must equal the
    // direct corpus counters bit-for-bit (every S_j is an exact BIGINT
    // sum — n_mismatch contract 0), with the merged estimate's
    // median-of-means F2 and rel_error against exact F2 riding along
    // gate-only, the x224 convention.
    QueryDef(
      "x226_ams_merge_audit",
      (s, dir) => graft.ext.Frequent.amsF2MergeAudit(Tables(s, dir).documents),
      Some(
        raw"""WITH cnt AS (
             |  SELECT doc_id % 8 AS shard, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id,
             |               unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2
             |), sjs AS (
             |  SELECT shard, js.j,
             |         CAST(SUM((CAST(('0x' || substr(md5(tok || '|ams|' || js.j), 1, 1))
             |             AS BIGINT) % 2 * 2 - 1) * c) AS BIGINT) AS s
             |  FROM cnt, (SELECT unnest(generate_series(0, 95)) AS j) js
             |  GROUP BY 1, 2
             |), mgd AS (
             |  SELECT j, CAST(SUM(s) AS BIGINT) AS s_merged FROM sjs GROUP BY 1
             |), ccnt AS (
             |  SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM cnt GROUP BY 1
             |), dj AS (
             |  SELECT js.j,
             |         CAST(SUM((CAST(('0x' || substr(md5(tok || '|ams|' || js.j), 1, 1))
             |             AS BIGINT) % 2 * 2 - 1) * c) AS BIGINT) AS s
             |  FROM ccnt, (SELECT unnest(generate_series(0, 95)) AS j) js
             |  GROUP BY 1
             |), mm AS (
             |  SELECT CAST(COALESCE(SUM(CASE WHEN m.s_merged IS NULL OR d.s IS NULL
             |                                 OR m.s_merged <> d.s
             |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
             |           AS n_mismatch
             |  FROM mgd m FULL OUTER JOIN dj d ON d.j = m.j
             |), gg AS (
             |  SELECT j // 32 AS g, CAST(SUM(s_merged * s_merged) AS BIGINT) AS grp_fp
             |  FROM mgd GROUP BY 1
             |), med AS (
             |  SELECT CAST(greatest(least(g0, g1),
             |           least(greatest(g0, g1), g2)) AS DOUBLE) / 32.0 AS f2_est
             |  FROM (SELECT MAX(CASE WHEN g = 0 THEN grp_fp END) AS g0,
             |               MAX(CASE WHEN g = 1 THEN grp_fp END) AS g1,
             |               MAX(CASE WHEN g = 2 THEN grp_fp END) AS g2
             |        FROM gg)
             |), ex AS (
             |  SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM ccnt
             |)
             |SELECT CAST(8 AS BIGINT) AS n_shards, 96 AS d, n_mismatch, f2_exact,
             |       round(f2_est, 6) AS f2_est,
             |       CASE WHEN f2_exact > 0
             |            THEN round(abs(round(f2_est, 6) - CAST(f2_exact AS DOUBLE))
             |                 / CAST(f2_exact AS DOUBLE), 6) END AS rel_error
             |FROM ex CROSS JOIN mm CROSS JOIN med""".stripMargin))
  )
}
