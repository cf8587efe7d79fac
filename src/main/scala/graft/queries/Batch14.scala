package graft.queries

import graft.io.Tables
import org.apache.spark.sql.functions.col

/** Round-14 batch: the AMS shard-merge audit (x226) — the tug-of-war
  * sketch's membership proof in the mergeable-sketch audit family
  * (x175 MinHash, x191/x201 HLL, x219 KMV), closing the round-13
  * verdict's sketch-family-symmetry stretch — plus the kernel
  * two-sample MMD² matrix between embedding label groups (x227: the
  * embedding-space drift test, pair-join-free via per-group moment
  * statistics), the count-min shard-merge audit (x228: the counting
  * sketch's membership proof in the same audit family), and incremental
  * MMD maintenance (x229: base+delta moment fold == full recompute,
  * proven against x227's oracle verbatim), the Bloom shard-merge audit
  * (x230: OR-merge, word for word — the membership sketch's entry in
  * the audit family), and the histogram shard-merge audit (x231:
  * addition-merged bin counters under shared bounds, with the merged
  * quantile estimates' within-one-bin-width verdict riding along).
  * Implementations live in ext/Frequent, ext/Similarity,
  * ext/TextAnalysis, ops/Bloom, ops/HistogramSketch; the bindings here
  * pin parameters and carry the DuckDB oracle twins.
  */
object Batch14 {

  /** The full MMD² recompute oracle — used VERBATIM by x227 and x229:
    * x229's whole claim is that the Spark side's base+delta moment fold
    * equals THIS full recompute bit for bit (the x132/x139 convention).
    */
  private val MmdOracleSql: String =
    raw"""WITH fp AS (
         |  SELECT label,
         |         list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v
         |  FROM embeddings
         |), idx AS (SELECT unnest(generate_series(1, 64)) AS i),
         |tri AS (
         |  SELECT label, gi.i AS i, gj.i AS j,
         |         CAST(COUNT(*) AS BIGINT) AS cnt,
         |         CAST(SUM(v[gi.i]) AS BIGINT) AS sxi,
         |         SUM(CAST(v[gi.i] AS HUGEINT) * v[gj.i]) AS m
         |  FROM fp, idx gi, idx gj
         |  WHERE gj.i >= gi.i
         |  GROUP BY 1, 2, 3
         |), q4 AS (
         |  SELECT label, SUM(CAST(r2 AS HUGEINT) * r2) AS q4
         |  FROM (SELECT label,
         |               CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS r2
         |        FROM fp)
         |  GROUP BY 1
         |), per AS (
         |  SELECT t.label,
         |         MAX(CASE WHEN i = 1 AND j = 1 THEN cnt END) AS n,
         |         SUM(CASE WHEN i = j THEN m END) AS q,
         |         SUM(CASE WHEN i = j THEN CAST(sxi AS HUGEINT) * sxi END) AS s2,
         |         SUM((CASE WHEN i = j THEN 1 ELSE 2 END) * m * m) AS w2
         |  FROM tri t GROUP BY 1
         |), perq AS (
         |  SELECT per.*, q4.q4 FROM per JOIN q4 USING (label)
         |), crs AS (
         |  SELECT a.label AS label_a, b.label AS label_b,
         |         SUM(CASE WHEN a.i = a.j
         |                  THEN CAST(a.sxi AS HUGEINT) * b.sxi END) AS sab,
         |         SUM((CASE WHEN a.i = a.j THEN 1 ELSE 2 END) * a.m * b.m) AS wab
         |  FROM tri a JOIN tri b ON a.i = b.i AND a.j = b.j AND a.label < b.label
         |  GROUP BY 1, 2
         |)
         |SELECT c.label_a, c.label_b, pa.n AS n_a, pb.n AS n_b,
         |  CASE WHEN pa.n > 1 AND pb.n > 1 THEN
         |    round((CAST(CAST(pa.s2 - pa.q AS VARCHAR) AS DOUBLE)
         |             / CAST(pa.n * (pa.n - 1) AS DOUBLE)
         |         + CAST(CAST(pb.s2 - pb.q AS VARCHAR) AS DOUBLE)
         |             / CAST(pb.n * (pb.n - 1) AS DOUBLE)
         |         - 2.0 * CAST(CAST(c.sab AS VARCHAR) AS DOUBLE)
         |             / CAST(pa.n * pb.n AS DOUBLE)) / 1e12, 9)
         |  END AS mmd2_lin,
         |  CASE WHEN pa.n > 1 AND pb.n > 1 THEN
         |    round((CAST(CAST(pa.w2 - pa.q4 AS VARCHAR) AS DOUBLE)
         |             / CAST(pa.n * (pa.n - 1) AS DOUBLE)
         |         + CAST(CAST(pb.w2 - pb.q4 AS VARCHAR) AS DOUBLE)
         |             / CAST(pb.n * (pb.n - 1) AS DOUBLE)
         |         - 2.0 * CAST(CAST(c.wab AS VARCHAR) AS DOUBLE)
         |             / CAST(pa.n * pb.n AS DOUBLE)) / 1e24, 9)
         |  END AS mmd2_quad
         |FROM crs c
         |JOIN perq pa ON pa.label = c.label_a
         |JOIN perq pb ON pb.label = c.label_b
         |ORDER BY 1, 2""".stripMargin

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
             |FROM ex CROSS JOIN mm CROSS JOIN med""".stripMargin)),

    // Kernel two-sample MMD² matrix (Similarity.mmdMatrix): unbiased
    // linear- and quadratic-kernel MMD between every pair of embedding
    // label groups, computed ENTIRELY from per-group moment statistics
    // (first moments, the d(d+1)/2 second-moment triangle, Σ‖x‖⁴) — the
    // kernel sums are inner products of moments, so no row-pair join
    // ever forms. Exact fixed-point/HUGEINT integers to the last step;
    // one shared IEEE tree per statistic (the x41 VARCHAR-cast
    // convention for DuckDB's wide-integer→double).
    QueryDef(
      "x227_mmd_matrix",
      (s, dir) => graft.ext.Similarity.mmdMatrix(Tables(s, dir).embeddings),
      Some(MmdOracleSql)),

    // Incremental MMD maintenance (Similarity.mmdIncremental): the
    // moment statistics are integer sums, so folding an append batch
    // into the base moments EQUALS the full recompute — proven by
    // hash-matching against x227's full-recompute oracle verbatim (the
    // x139 convention; split on vec_id % 5). The drift monitor's
    // production shape: persist the groups×2,080 moment rows, touch
    // only the day's partition.
    QueryDef(
      "x229_mmd_incremental",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
        graft.ext.Similarity.mmdIncremental(
          emb.filter(col("vec_id") % 5 =!= 0),
          emb.filter(col("vec_id") % 5 === 0))
      },
      Some(MmdOracleSql)),

    // Count-min shard-merge audit (TextAnalysis.countMinMergeAudit):
    // per-shard 4×256 counter grids merged by plain ADDITION equal the
    // direct corpus grid cell for cell (n_mismatch 0), every hash row
    // of the merged grid conserves total token mass (mass_mismatch 0),
    // and the merged sketch answers the heavy-set point queries with
    // the usual one-sided error (max_overestimate rides along).
    QueryDef(
      "x228_cms_merge_audit",
      (s, dir) => graft.ext.TextAnalysis.countMinMergeAudit(
        Tables(s, dir).documents),
      Some {
        val cellSql = (h: Int, tok: String) =>
          s"CAST(('0x' || substring(md5('cms$h|' || $tok), 1, 8)) AS BIGINT) % 256"
        val shardGrid = (0 until 4)
          .map(h => s"SELECT shard, $h AS h, ${cellSql(h, "tok")} AS cell, c FROM cnt")
          .mkString("\n  UNION ALL ")
        val directGrid = (0 until 4)
          .map(h => s"SELECT $h AS h, ${cellSql(h, "tok")} AS cell, c FROM ccnt")
          .mkString("\n  UNION ALL ")
        val probeGrid = (0 until 4)
          .map(h => s"SELECT tok, true_count, $h AS h, ${cellSql(h, "tok")} AS cell FROM hv")
          .mkString("\n  UNION ALL ")
        raw"""WITH cnt AS (
             |  SELECT doc_id % 8 AS shard, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id,
             |               unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2
             |), mgd AS (
             |  SELECT h, cell, CAST(SUM(cc) AS BIGINT) AS c_merged
             |  FROM (SELECT shard, h, cell, CAST(SUM(c) AS BIGINT) AS cc
             |        FROM ($shardGrid)
             |        GROUP BY 1, 2, 3)
             |  GROUP BY 1, 2
             |), ccnt AS (
             |  SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM cnt GROUP BY 1
             |), dg AS (
             |  SELECT h, cell, CAST(SUM(c) AS BIGINT) AS c_direct
             |  FROM ($directGrid)
             |  GROUP BY 1, 2
             |), mm AS (
             |  SELECT CAST(COALESCE(SUM(CASE WHEN m.c_merged IS NULL
             |                                 OR d.c_direct IS NULL
             |                                 OR m.c_merged <> d.c_direct
             |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
             |           AS n_mismatch
             |  FROM mgd m FULL OUTER JOIN dg d ON d.h = m.h AND d.cell = m.cell
             |), nt AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM ccnt
             |), ms AS (
             |  SELECT CAST(COALESCE(SUM(CASE WHEN row_mass <> n_tokens
             |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
             |           AS mass_mismatch
             |  FROM (SELECT h, CAST(SUM(c_merged) AS BIGINT) AS row_mass
             |        FROM mgd GROUP BY 1) CROSS JOIN nt
             |), hv AS (
             |  SELECT tok, c AS true_count FROM ccnt WHERE c >= 50
             |), est AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_heavy,
             |         CAST(MAX(cms_estimate - true_count) AS BIGINT)
             |           AS max_overestimate
             |  FROM (SELECT tok, true_count,
             |               CAST(MIN(c_merged) AS BIGINT) AS cms_estimate
             |        FROM ($probeGrid) p JOIN mgd USING (h, cell)
             |        GROUP BY 1, 2)
             |)
             |SELECT CAST(8 AS BIGINT) AS n_shards, 4 AS depth, 256 AS width,
             |       n_mismatch, mass_mismatch, n_tokens, n_heavy,
             |       max_overestimate
             |FROM nt CROSS JOIN mm CROSS JOIN ms CROSS JOIN est""".stripMargin
      }),

    // Bloom shard-merge audit (Bloom.mergeAudit): per-shard packed
    // bit-word grids merged by plain bitwise OR equal the direct corpus
    // grid word for word (n_mismatch 0), and the merged filter is
    // probed with a deterministic fresh-string set — popcount, fill
    // ratio, and honest fp rate (exact-membership-audited) ride along.
    // 32-bit packing so DuckDB replays every mask (its BIGINT << raises
    // on bit 63); the OR-merge property is representation-independent.
    QueryDef(
      "x230_bloom_merge_audit",
      (s, dir) => graft.ops.Bloom.mergeAudit(Tables(s, dir).documents),
      Some(
        raw"""WITH d AS (
             |  SELECT doc_id % 8 AS shard, md5(text) AS h FROM documents
             |), pos AS (
             |  SELECT shard,
             |         ((CAST(('0x'||substring(h,1,8)) AS BIGINT)
             |           + j.j * CAST(('0x'||substring(h,9,8)) AS BIGINT)) % 4096) AS pos
             |  FROM d CROSS JOIN generate_series(0, 3) j(j)
             |), sw AS (
             |  SELECT shard, pos // 32 AS widx,
             |         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
             |  FROM pos GROUP BY 1, 2
             |), mgd AS (
             |  SELECT widx, bit_or(word) AS w_merged FROM sw GROUP BY 1
             |), dw AS (
             |  SELECT pos // 32 AS widx,
             |         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
             |  FROM pos GROUP BY 1
             |), mm AS (
             |  SELECT CAST(COALESCE(SUM(CASE WHEN m.w_merged IS NULL
             |                                 OR d.word IS NULL
             |                                 OR m.w_merged <> d.word
             |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
             |           AS n_mismatch
             |  FROM mgd m FULL OUTER JOIN dw d ON d.widx = m.widx
             |), bs AS (
             |  SELECT CAST(COALESCE(SUM(bit_count(w_merged)), 0) AS BIGINT)
             |           AS bits_set
             |  FROM mgd
             |), pr AS (
             |  SELECT 'bloomprobe|' || CAST(i AS VARCHAR) AS t,
             |         md5('bloomprobe|' || CAST(i AS VARCHAR)) AS h
             |  FROM generate_series(0, 2047) g(i)
             |), ppos AS (
             |  SELECT t,
             |         ((CAST(('0x'||substring(h,1,8)) AS BIGINT)
             |           + j.j * CAST(('0x'||substring(h,9,8)) AS BIGINT)) % 4096) AS pos
             |  FROM pr CROSS JOIN generate_series(0, 3) j(j)
             |), phit AS (
             |  SELECT t, MIN(CASE WHEN m.w_merged IS NOT NULL
             |                      AND (m.w_merged
             |                           & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0
             |                 THEN 1 ELSE 0 END) AS hit
             |  FROM ppos p LEFT JOIN mgd m ON m.widx = p.pos // 32
             |  GROUP BY 1
             |), pa AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             |         CAST(COALESCE(SUM(CASE WHEN dh.h IS NOT NULL
             |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
             |           AS n_probe_members,
             |         CAST(COALESCE(SUM(ph.hit), 0) AS BIGINT) AS n_bloom_hits
             |  FROM phit ph
             |  JOIN pr p USING (t)
             |  LEFT JOIN (SELECT DISTINCT md5(text) AS h FROM documents) dh
             |    ON dh.h = p.h
             |)
             |SELECT CAST(8 AS BIGINT) AS n_shards, 4096 AS m_bits, 4 AS k,
             |       mm.n_mismatch, bs.bits_set,
             |       round(CAST(bs.bits_set AS DOUBLE) / 4096.0, 6) AS fill_ratio,
             |       pa.n_probes, pa.n_probe_members, pa.n_bloom_hits,
             |       round(CAST(pa.n_bloom_hits - pa.n_probe_members AS DOUBLE)
             |             / CAST(pa.n_probes - pa.n_probe_members AS DOUBLE), 6)
             |         AS fp_rate
             |FROM mm CROSS JOIN bs CROSS JOIN pa""".stripMargin)),

    // Histogram shard-merge audit (HistogramSketch.mergeAudit): shard
    // bin counters under shared corpus bounds, addition-merged, equal
    // the direct histogram bin for bin; merged-histogram quantile
    // estimates carry the family's within-one-bin-width verdict. Over
    // per-document token counts — the length distribution a curation
    // pipeline actually monitors per shard. bins=32 (not the generic
    // 256 default): token counts are INTEGERS spanning ~10–100, and the
    // one-bin-width verdict is only meaningful while the bin width
    // stays above the value spacing (a 0.35-token bin can never bracket
    // an interpolated exact quantile that falls between two integers).
    QueryDef(
      "x231_histogram_merge_audit",
      (s, dir) => graft.ops.HistogramSketch.mergeAudit(
        Tables(s, dir).documents.select(col("doc_id"),
          org.apache.spark.sql.functions.size(
            graft.ext.TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tokens")),
        "doc_id", "n_tokens", bins = 32),
      Some(graft.ops.HistogramSketch.mergeAuditOracleSql(
        raw"""(SELECT doc_id,
             |        length(string_split_regex(trim(text), '\s+')) AS n_tokens
             |      FROM documents)""".stripMargin,
        "doc_id", "n_tokens", bins = 32))),

    // Lang-ID calibration (TextAnalysis.langIdCalibration): reliability
    // diagram + ECE of the x03 classifier vs the labeled column —
    // confidence on a 1e6 fixed-point grid, per-bin exact BIGINTs, ECE
    // terms snapped to 1e-12 before the bounded sum (order-free, the
    // x221/x225 convention). The no-marker rows are excluded from
    // calibration and accounted in n_scored/n_total.
    QueryDef(
      "x232_langid_calibration",
      (s, dir) => graft.ext.TextAnalysis.langIdCalibration(
        Tables(s, dir).documents),
      Some {
        val markers = graft.ext.TextAnalysis.LangMarkers
        val scoreExprs = markers.map { case (l, words) =>
          if (l == "zh")
            raw"length(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS score_$l"
          else s"length(list_filter(ts, x -> x IN (${
            words.map(w => s"'$w'").mkString(", ")}))) AS score_$l"
        }.mkString(",\n    ")
        val maxExpr = markers.map { case (l, _) => s"score_$l" }
          .mkString("greatest(", ", ", ")")
        val sumExpr = markers.map { case (l, _) => s"score_$l" }
          .mkString(" + ")
        val caseExpr = markers.map { case (l, _) =>
          s"WHEN score_$l = m AND m > 0 THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        raw"""WITH t AS (
             |  SELECT doc_id, lang AS labeled_lang, text,
             |         string_split_regex(trim(text), '\s+') AS ts
             |  FROM documents
             |), s AS (
             |  SELECT doc_id, labeled_lang,
             |    $scoreExprs
             |  FROM t
             |), p AS (
             |  SELECT doc_id, labeled_lang, m, ssum,
             |         ($caseExpr) AS predicted_lang
             |  FROM (SELECT *, $maxExpr AS m,
             |               CAST($sumExpr AS BIGINT) AS ssum FROM s)
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM p
             |), conf AS (
             |  SELECT (predicted_lang = labeled_lang) AS is_match,
             |         CAST(FLOOR((1000000 * CAST(m AS BIGINT)) / ssum)
             |           AS BIGINT) AS conf_fp
             |  FROM p WHERE ssum > 0
             |), ns AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_scored FROM conf
             |), pb AS (
             |  SELECT least(9, CAST(FLOOR((conf_fp * 10) / 1000000) AS INT)) AS bin,
             |         CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
             |           AS n_correct,
             |         CAST(SUM(conf_fp) AS BIGINT) AS sum_conf_fp
             |  FROM conf GROUP BY 1
             |), terms AS (
             |  SELECT pb.*, ns.n_scored,
             |         CAST(FLOOR(1e12 * ABS(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)
             |                - CAST(sum_conf_fp AS DOUBLE)
             |                  / (CAST(n AS DOUBLE) * 1000000.0))
             |              * CAST(n AS DOUBLE) / CAST(n_scored AS DOUBLE) + 0.5)
             |           AS BIGINT) AS ece_term_fp
             |  FROM pb CROSS JOIN ns
             |), e AS (
             |  SELECT CAST(SUM(ece_term_fp) AS DOUBLE) / 1e12 AS ee FROM terms
             |)
             |SELECT bin, n, n_correct, sum_conf_fp,
             |       round(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE), 6)
             |         AS accuracy,
             |       round(CAST(sum_conf_fp AS DOUBLE)
             |             / (CAST(n AS DOUBLE) * 1000000.0), 6) AS avg_conf,
             |       round(ABS(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)
             |             - CAST(sum_conf_fp AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * 1000000.0)), 6) AS gap,
             |       n_scored, tot.n_total, round(e.ee, 6) AS ece
             |FROM terms CROSS JOIN tot CROSS JOIN e ORDER BY bin""".stripMargin
      }),

    // Token burstiness / adaptation (TextAnalysis.tokenBurstiness):
    // Church-Gale burstiness (cf/df) and adaptation (df2/df) per heavy
    // token — the template-vs-topical screen. Exact BIGINT counts, one
    // double division per ratio.
    QueryDef(
      "x233_token_burstiness",
      (s, dir) => graft.ext.TextAnalysis.tokenBurstiness(
        Tables(s, dir).documents),
      Some(
        raw"""WITH pd AS (
             |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id,
             |               unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2
             |), agg AS (
             |  SELECT tok, CAST(SUM(c) AS BIGINT) AS cf,
             |         CAST(COUNT(*) AS BIGINT) AS df,
             |         CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |           AS df2
             |  FROM pd GROUP BY 1
             |)
             |SELECT tok, cf, df, df2,
             |       round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6)
             |         AS burstiness,
             |       round(CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE), 6)
             |         AS adaptation
             |FROM agg WHERE cf >= 50
             |ORDER BY cf DESC, tok""".stripMargin)),

    // Table checksum (Reconcile.tableChecksum): the cross-engine
    // reconciliation fingerprint — 64 bucket rows of exact
    // (count, xor1, xor2, modular-sum) accumulators over the full
    // documents row set. The DuckDB twin computing the identical
    // fingerprint IS the point of the operator: matching here proves
    // table equality across engines with one bounded exchange.
    QueryDef(
      "x234_table_checksum",
      (s, dir) => graft.ops.Reconcile.tableChecksum(
        Tables(s, dir).documents,
        Seq("doc_id", "source", "lang", "n_chars", "text")).orderBy("bucket"),
      Some(graft.ops.Reconcile.oracleSql("documents",
        Seq("doc_id", "source", "lang", "n_chars", "text")) + "\nORDER BY 1")),

    // CMS width calibration (TextAnalysis.countMinCalibration): the
    // x114 convention for the counting sketch — heavy-set max/mean
    // one-sided overestimate across a width sweep, next to the N/width
    // expectation bound, all from ONE vocabulary aggregate.
    QueryDef(
      "x235_cms_calibration",
      (s, dir) => graft.ext.TextAnalysis.countMinCalibration(
        Tables(s, dir).documents),
      Some {
        val widths = Seq(64, 128, 256, 512)
        val depth = 4
        def cellSql(h: Int, w: Int) =
          s"CAST(('0x' || substring(md5('cms$h|' || tok), 1, 8)) AS BIGINT) % $w"
        val perW = widths.map { w =>
          val grid = (0 until depth)
            .map(h => s"SELECT $h AS h, ${cellSql(h, w)} AS cell, c FROM ccnt")
            .mkString("\n    UNION ALL ")
          val probe = (0 until depth)
            .map(h =>
              s"SELECT tok, c AS true_count, $h AS h, ${cellSql(h, w)} AS cell FROM hv")
            .mkString("\n    UNION ALL ")
          s"""SELECT $w AS width,
             |       CAST(COUNT(*) AS BIGINT) AS n_heavy,
             |       CAST(MAX(est - true_count) AS BIGINT) AS max_overestimate,
             |       CAST(SUM(est - true_count) AS BIGINT) AS sum_overestimate
             |FROM (SELECT tok, true_count, CAST(MIN(cell_count) AS BIGINT) AS est
             |      FROM ($probe) p
             |      JOIN (SELECT h, cell, CAST(SUM(c) AS BIGINT) AS cell_count
             |            FROM ($grid) GROUP BY 1, 2) g USING (h, cell)
             |      GROUP BY 1, 2)""".stripMargin
        }.mkString("\n  UNION ALL\n")
        raw"""WITH ccnt AS (
             |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1
             |), hv AS (
             |  SELECT tok, c FROM ccnt WHERE c >= 50
             |), nt AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM ccnt
             |), pw AS (
             |  $perW
             |)
             |SELECT width, $depth AS depth, nt.n_tokens, n_heavy,
             |       max_overestimate,
             |       round(CAST(sum_overestimate AS DOUBLE)
             |             / CAST(n_heavy AS DOUBLE), 6) AS mean_overestimate,
             |       round(CAST(nt.n_tokens AS DOUBLE) / CAST(width AS DOUBLE), 6)
             |         AS bound_n_over_w
             |FROM pw CROSS JOIN nt ORDER BY width""".stripMargin
      }),

    // AMS join-size estimate (Frequent.amsJoinEstimate): the two-stream
    // tug-of-war — |L ⋈ R| from the inner product of each side's 96
    // sign-counters, median-of-means, on the SAME key pair x135's
    // exact join advisor prices (lineitem ⋈ orders on orderkey). The
    // exact Σ cnt_L·cnt_R audit rides along gate-only; products/group
    // sums in DECIMAL(38,0)/HUGEINT (|S| ≤ side rows, so the product
    // passes BIGINT at ~3e9-row sides).
    QueryDef(
      "x236_ams_join_estimate",
      (s, dir) => graft.ext.Frequent.amsJoinEstimate(
        Tables(s, dir).lineitem, "l_orderkey",
        Tables(s, dir).orders, "o_orderkey"),
      Some {
        // Bit-slice sign kernel (see Frequent.amsJoinEstimate): one md5
        // per key; sign_j = bit j%4 of hex digit j/4 of the digest.
        val sign = (tbl: String) =>
          raw"""SELECT js.j,
               |       CAST(SUM((((CAST(('0x' || substring(md5(tok), js.j // 4 + 1, 1))
               |           AS BIGINT) >> (js.j % 4)) & 1) * 2 - 1) * c) AS BIGINT) AS s
               |FROM $tbl, (SELECT unnest(generate_series(0, 95)) AS j) js
               |GROUP BY 1""".stripMargin
        raw"""WITH lc AS (
             |  SELECT CAST(l_orderkey AS VARCHAR) AS tok,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1
             |), rc AS (
             |  SELECT CAST(o_orderkey AS VARCHAR) AS tok,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1
             |), sl AS (
             |  ${sign("lc")}
             |), sr AS (
             |  ${sign("rc")}
             |), gg AS (
             |  SELECT sl.j // 32 AS g,
             |         SUM(CAST(sl.s AS HUGEINT) * sr.s) AS grp_fp
             |  FROM sl JOIN sr ON sr.j = sl.j
             |  GROUP BY 1
             |), med AS (
             |  SELECT CAST(greatest(least(g0, g1),
             |           least(greatest(g0, g1), g2)) AS DOUBLE) / 32.0 AS join_est
             |  FROM (SELECT MAX(CASE WHEN g = 0 THEN grp_fp END) AS g0,
             |               MAX(CASE WHEN g = 1 THEN grp_fp END) AS g1,
             |               MAX(CASE WHEN g = 2 THEN grp_fp END) AS g2
             |        FROM gg)
             |), nl AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_left FROM lc
             |), nr AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_right FROM rc
             |), jx AS (
             |  SELECT COALESCE(SUM(CAST(l.c AS HUGEINT) * r.c), 0) AS jx
             |  FROM lc l JOIN rc r ON r.tok = l.tok
             |)
             |SELECT n_left, n_right, 96 AS d,
             |       CAST(jx AS BIGINT) AS join_exact,
             |       round(join_est, 6) AS join_est,
             |       CASE WHEN jx > 0
             |            THEN round(abs(round(join_est, 6) - CAST(jx AS DOUBLE))
             |                 / CAST(jx AS DOUBLE), 6) END AS rel_error
             |FROM nl CROSS JOIN nr CROSS JOIN jx CROSS JOIN med""".stripMargin
      }),

    // Per-source table checksum (Reconcile.tableChecksumByGroup): the
    // feed-level reconciliation fingerprint — a mismatch localizes to
    // WHICH SOURCE diverged before any bucket drill-down. Same exact
    // accumulators as x234, keyed by (source, bucket).
    QueryDef(
      "x237_source_checksum",
      (s, dir) => graft.ops.Reconcile.tableChecksumByGroup(
        Tables(s, dir).documents, "source",
        Seq("doc_id", "lang", "n_chars", "text")).orderBy("source", "bucket"),
      Some(graft.ops.Reconcile.groupedOracleSql("documents", "source",
        Seq("doc_id", "lang", "n_chars", "text")) + "\nORDER BY 1, 2")),

    // Per-source dup rate with a Wilson 95% interval
    // (Curation.dupRateWilson): the quarantine decision keys on the
    // LOWER bound vs the policy threshold, not the point rate. One
    // shared IEEE tree of division/multiplication/sqrt — correctly
    // rounded everywhere, no transcendentals.
    QueryDef(
      "x238_dup_rate_wilson",
      (s, dir) => graft.ext.Curation.dupRateWilson(
        Tables(s, dir).documents),
      Some(
        raw"""WITH per AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
             |  FROM documents GROUP BY 1
             |), w AS (
             |  SELECT source, n_docs, n_docs - n_distinct AS n_dups,
             |         CAST(n_docs - n_distinct AS DOUBLE)
             |           / CAST(n_docs AS DOUBLE) AS p,
             |         CAST(n_docs AS DOUBLE) AS nd
             |  FROM per
             |)
             |SELECT source, n_docs, n_dups,
             |       round(p, 6) AS dup_rate,
             |       round((p + 1.96 * 1.96 / (2.0 * nd))
             |               / (1.0 + 1.96 * 1.96 / nd)
             |             - 1.96 * sqrt(p * (1.0 - p) / nd
             |                 + 1.96 * 1.96 / (4.0 * nd * nd))
             |               / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_lo,
             |       round((p + 1.96 * 1.96 / (2.0 * nd))
             |               / (1.0 + 1.96 * 1.96 / nd)
             |             + 1.96 * sqrt(p * (1.0 - p) / nd
             |                 + 1.96 * 1.96 / (4.0 * nd * nd))
             |               / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_hi,
             |       round((p + 1.96 * 1.96 / (2.0 * nd))
             |               / (1.0 + 1.96 * 1.96 / nd)
             |             - 1.96 * sqrt(p * (1.0 - p) / nd
             |                 + 1.96 * 1.96 / (4.0 * nd * nd))
             |               / (1.0 + 1.96 * 1.96 / nd), 6) > 0.1
             |         AS credibly_above
             |FROM w ORDER BY source""".stripMargin)),

    // Checksum diff (Reconcile.checksumDiff): the localization half of
    // the reconciliation — fingerprint documents against a copy whose
    // every-97th document is deterministically corrupted, and report
    // per-bucket match verdicts. At the gate the mismatching buckets
    // are exactly the corrupted rows' old/new hash buckets; a 3VL-safe
    // verdict (a bucket absent on one side is FALSE, never NULL).
    QueryDef(
      "x239_checksum_diff",
      (s, dir) => {
        val cols = Seq("doc_id", "source", "lang", "n_chars", "text")
        val d = Tables(s, dir).documents
        val corrupted = d.withColumn("text",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.pmod(col("doc_id"),
              org.apache.spark.sql.functions.lit(97L)) === 0L,
            org.apache.spark.sql.functions.concat(col("text"),
              org.apache.spark.sql.functions.lit(" CORRUPTED")))
            .otherwise(col("text")))
        graft.ops.Reconcile.checksumDiff(
          graft.ops.Reconcile.tableChecksum(d, cols),
          graft.ops.Reconcile.tableChecksum(corrupted, cols))
      },
      Some(graft.ops.Reconcile.diffOracleSql(
        "documents",
        """(SELECT doc_id, source, lang, n_chars,
          |        CASE WHEN doc_id % 97 = 0 THEN text || ' CORRUPTED'
          |             ELSE text END AS text
          |      FROM documents)""".stripMargin,
        Seq("doc_id", "source", "lang", "n_chars", "text"))))
  )
}
