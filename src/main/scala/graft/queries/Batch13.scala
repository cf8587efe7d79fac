package graft.queries

import graft.io.Tables

/** Round-13 batch: cross-corpus overlap sketching (x214 KMV pairs, x219
  * shard-merge audit), budget allocation (x215 UniMax; its
  * effective-token composition x220 lives in Extensions next to the
  * cluster CTEs it reuses), rank statistics (x216 Mann–Whitney, x218
  * Kruskal–Wallis — one pooled-midrank kernel), source redundancy
  * (x221 Jensen–Shannon matrix), and the t-closeness privacy audit
  * (x217). Implementations live in ops/ and ext/; bindings here pin
  * parameters and carry the DuckDB oracle twins.
  */
object Batch13 {

  /** Shared oracle CTE chain for the pooled-midrank kernel (mirrors
    * Curation.pooledRankSums): per-source doubled-midrank sums + corpus
    * totals. ONE definition for the x216/x218 oracles — the same
    * single-sourcing rule as the Spark-side kernel they replay. */
  private val RankCtes =
    raw"""WITH vals AS (
         |  SELECT source,
         |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
         |  FROM documents
         |), byv AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY 1
         |), rkm AS (
         |  SELECT v, CAST(2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1
         |           AS BIGINT) AS midrank2
         |  FROM byv
         |), tot AS (
         |  -- cnt cubes in HUGEINT: a bare cnt*cnt*cnt multiplies in
         |  -- BIGINT and DuckDB THROWS on overflow at cnt ~ 2.1e6,
         |  -- narrower than the Spark side's DECIMAL(38,0) envelope the
         |  -- kernel scaladoc documents (round-13 advice).
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
         |         CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE)
         |           AS tie_term_d
         |  FROM byv
         |), ps AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_a,
         |         CAST(SUM(midrank2) AS BIGINT) AS r_sum2
         |  FROM vals JOIN rkm USING (v) GROUP BY 1
         |)""".stripMargin

  /** The UniMax water-filling oracle chain (mirrors
    * Pipeline.unimaxFromCounts), appended after a CTE named `src` with
    * columns (grp, n_docs, n_tokens). ONE definition for the x215 (raw
    * token) and x220 (effective-token) allocation oracles. Every DuckDB
    * aggregate CASTs back to BIGINT (SUM widens to HUGEINT, which
    * pandas would render differently).
    */
  private[queries] def unimaxSql(src: String, epochCap: Int,
      budgetNum: Int, budgetDen: Int, outName: String): String =
    raw""", cap AS (
         |  SELECT *, n_tokens * $epochCap AS capacity_tokens FROM $src
         |), rk AS (
         |  SELECT *,
         |         CAST(ROW_NUMBER() OVER (ORDER BY capacity_tokens, grp) AS BIGINT)
         |           AS rank,
         |         CAST(COALESCE(SUM(capacity_tokens) OVER (
         |             ORDER BY capacity_tokens, grp
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS prefix,
         |         CAST(COUNT(*) OVER () AS BIGINT) AS m,
         |         CAST((SUM(n_tokens) OVER () * $budgetNum) // $budgetDen AS BIGINT)
         |           AS budget_tokens
         |  FROM cap
         |), fl AS (
         |  SELECT *, prefix + capacity_tokens * (m - rank + 1) AS f FROM rk
         |), cp AS (
         |  SELECT *, f <= budget_tokens AS capped FROM fl
         |), ag AS (
         |  SELECT *,
         |         CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT)
         |           AS k_capped,
         |         CAST(COALESCE(SUM(CASE WHEN capped THEN capacity_tokens END)
         |             OVER (), 0) AS BIGINT) AS capped_sum
         |  FROM cp
         |)
         |SELECT grp AS $outName, n_docs, n_tokens, capacity_tokens, rank,
         |       budget_tokens, capped,
         |       round(CASE WHEN capped THEN CAST(capacity_tokens AS DOUBLE)
         |                  ELSE CAST(budget_tokens - capped_sum AS DOUBLE)
         |                         / CAST(m - k_capped AS DOUBLE) END, 6)
         |         AS alloc_tokens,
         |       round(CASE WHEN capped THEN CAST(capacity_tokens AS DOUBLE)
         |                  ELSE CAST(budget_tokens - capped_sum AS DOUBLE)
         |                         / CAST(m - k_capped AS DOUBLE) END
         |             / CAST(n_tokens AS DOUBLE), 6) AS epochs
         |FROM ag ORDER BY $outName""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // KMV bottom-k overlap sketch (ops.Kmv.intersectionBySource —
    // Bar-Yossef et al. 2002; Beyer et al. 2007's multiset form): per
    // source pair, union/Jaccard/intersection estimates composed from
    // two 256-value sketches, never a pairwise corpus join; exact
    // comparands ride along gate-only. The oracle replays the sketch
    // bit-for-bit from the shared md5-first-8-hex hash: at sf0.01+ the
    // combined sketches saturate (estimator branch); tiny corpora fall
    // into the unsaturated-exact branch — both gated.
    QueryDef(
      "x214_kmv_source_overlap",
      (s, dir) => graft.ops.Kmv.intersectionBySource(Tables(s, dir).documents)
        .orderBy("source_a", "source_b"),
      Some(
        s"""${Extensions.ShingleCtes}, ss AS (
           |  SELECT DISTINCT d.source, sh.shingle
           |  FROM sh JOIN documents d USING (doc_id)
           |), hx AS (
           |  SELECT DISTINCT source,
           |         CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
           |  FROM ss
           |), skr AS (
           |  SELECT source, h,
           |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
           |  FROM hx
           |), sk AS (
           |  SELECT source, h FROM skr WHERE rn <= 256
           |), nex AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact FROM ss GROUP BY 1
           |), iex AS (
           |  SELECT a.source AS sa, b.source AS sb,
           |         CAST(COUNT(*) AS BIGINT) AS inter_exact
           |  FROM ss a JOIN ss b ON b.shingle = a.shingle AND a.source < b.source
           |  GROUP BY 1, 2
           |), prs AS (
           |  SELECT a.source AS sa, b.source AS sb
           |  FROM nex a JOIN nex b ON a.source < b.source
           |), pu AS (
           |  SELECT p.sa, p.sb, s.h,
           |         MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
           |         MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
           |  FROM prs p JOIN sk s ON s.source IN (p.sa, p.sb)
           |  GROUP BY 1, 2, 3
           |), rk AS (
           |  SELECT sa, sb, h, ina, inb,
           |         CAST(ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS BIGINT) AS rn,
           |         CAST(COUNT(*) OVER (PARTITION BY sa, sb) AS BIGINT) AS nu
           |  FROM pu
           |), ag AS (
           |  SELECT sa, sb, MAX(nu) AS n_union_sketch, MAX(rn) AS k_eff,
           |         MAX(h) AS hk, CAST(SUM(ina * inb) AS BIGINT) AS matches
           |  FROM rk WHERE rn <= 256 GROUP BY 1, 2
           |), est AS (
           |  SELECT sa, sb, n_union_sketch, k_eff, matches,
           |         CASE WHEN n_union_sketch >= 256
           |              THEN CAST(255 AS DOUBLE) * 4294967296.0
           |                     / (CAST(hk AS DOUBLE) + 0.5)
           |              ELSE CAST(n_union_sketch AS DOUBLE) END AS uest,
           |         CAST(matches AS DOUBLE) / CAST(k_eff AS DOUBLE) AS jraw
           |  FROM ag
           |)
           |SELECT est.sa AS source_a, est.sb AS source_b,
           |       na.n_exact AS n_exact_a, nb.n_exact AS n_exact_b,
           |       n_union_sketch, k_eff,
           |       round(uest, 6) AS union_est,
           |       round(jraw, 6) AS jaccard_est,
           |       round(jraw * uest, 6) AS inter_est,
           |       COALESCE(iex.inter_exact, 0) AS inter_exact,
           |       CASE WHEN COALESCE(iex.inter_exact, 0) > 0
           |            THEN round(abs(round(jraw * uest, 6)
           |                   - CAST(iex.inter_exact AS DOUBLE))
           |                 / CAST(iex.inter_exact AS DOUBLE), 6) END AS rel_error
           |FROM est
           |JOIN nex na ON na.source = est.sa
           |JOIN nex nb ON nb.source = est.sb
           |LEFT JOIN iex ON iex.sa = est.sa AND iex.sb = est.sb
           |ORDER BY source_a, source_b""".stripMargin)),

    // UniMax budget allocation (Pipeline.unimaxAllocate — Chung et al.
    // 2023): token budget 1.6x the corpus, epoch cap 2, grouped by the
    // documents' language column (the paper's own setting: skewed
    // language sizes). Low-resource langs cap at 2 epochs; the surplus
    // water-fills into `en`. The capped/uncapped partition is exact
    // integer arithmetic; the oracle replays the closed-form prefix
    // scan. CASTs pin every DuckDB aggregate back to BIGINT (SUM of
    // BIGINT widens to HUGEINT, which pandas would render differently).
    QueryDef(
      "x215_unimax_allocation",
      (s, dir) => graft.ext.Pipeline.unimaxAllocate(Tables(s, dir).documents)
        .orderBy("lang"),
      Some(
        raw"""WITH cnt AS (
             |  SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             |           AS n_tokens
             |  FROM documents GROUP BY 1
             |)""".stripMargin + unimaxSql("cnt", 2, 16, 10, "lang"))),

    // Mann-Whitney U one-vs-rest sweep (Curation.mannWhitneyBySource —
    // Mann & Whitney 1947): per source, the tie-corrected rank-sum test
    // of its per-doc token-count distribution against the rest of the
    // corpus, sharing ONE pooled midrank pass across all m tests. Exact
    // doubled midranks and BIGINT 2U; the tie term sums t^3-t in
    // HUGEINT here / DECIMAL(38,0) in Spark — identical values, cast to
    // double only inside the shared variance tree.
    QueryDef(
      "x216_mann_whitney_sources",
      (s, dir) => graft.ext.Curation.mannWhitneyBySource(Tables(s, dir).documents)
        .orderBy("source"),
      Some(
        s"""$RankCtes, st AS (
             |  SELECT source, n_a, r_sum2, n_total, tie_term_d,
             |         n_total - n_a AS n_b,
             |         r_sum2 - n_a * (n_a + 1) AS u2
             |  FROM ps CROSS JOIN tot
             |), fin AS (
             |  SELECT *,
             |         CAST(n_a * n_b AS DOUBLE) / 12.0 *
             |           (CAST(n_total + 1 AS DOUBLE)
             |             - tie_term_d / CAST(n_total * (n_total - 1) AS DOUBLE))
             |           AS sig2,
             |         (CAST(u2 - n_a * n_b AS DOUBLE) / 2.0) AS num
             |  FROM st
             |)
             |SELECT source, n_a, n_b,
             |       CAST(u2 AS DOUBLE) / 2.0 AS u_a,
             |       round(CAST(u2 AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE), 6)
             |         AS auc,
             |       CASE WHEN sig2 > 0 THEN round(num / sqrt(sig2), 6) END AS z,
             |       CASE WHEN sig2 > 0
             |            THEN abs(round(num / sqrt(sig2), 6)) > 1.96 END
             |         AS significant
             |FROM fin ORDER BY source""".stripMargin)),

    // t-closeness audit (Pipeline.tClosenessAudit — Li et al. 2007):
    // x159/x163's third privacy rung. Per nation, the ordered EMD
    // between the class's and the global account-balance distribution
    // (1000-currency-unit levels via exact cents, shifted positive so
    // Spark div == DuckDB //). Each |cumdiff| term snaps to the 1e-9
    // fixed-point grid, so the per-class sum is an order-free BIGINT.
    QueryDef(
      "x217_t_closeness",
      (s, dir) => graft.ext.Pipeline.tClosenessAudit(
          Tables(s, dir).customer, "c_nationkey",
          (money(org.apache.spark.sql.functions.col("c_acctbal")) * 100)
            .cast("long"))
        .orderBy("c_nationkey"),
      Some(
        raw"""WITH base AS (
             |  SELECT c_nationkey AS cls,
             |         (CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 100 AS BIGINT)
             |           + 100000000) // 100000 AS lvl
             |  FROM customer
             |), cb AS (
             |  SELECT cls, lvl, CAST(COUNT(*) AS BIGINT) AS n_cl
             |  FROM base GROUP BY 1, 2
             |), gb AS (
             |  SELECT lvl, CAST(SUM(n_cl) AS BIGINT) AS n_l FROM cb GROUP BY 1
             |), cl AS (
             |  SELECT cls, CAST(SUM(n_cl) AS BIGINT) AS n_c FROM cb GROUP BY 1
             |), grid AS (
             |  SELECT cl.cls, gb.lvl, cl.n_c, gb.n_l, COALESCE(cb.n_cl, 0) AS n_cl
             |  FROM cl CROSS JOIN gb
             |  LEFT JOIN cb ON cb.cls = cl.cls AND cb.lvl = gb.lvl
             |), cum AS (
             |  SELECT cls, n_c,
             |         CAST(SUM(n_cl) OVER (PARTITION BY cls ORDER BY lvl)
             |           AS BIGINT) AS p_cum,
             |         CAST(SUM(n_l) OVER (PARTITION BY cls ORDER BY lvl)
             |           AS BIGINT) AS q_cum,
             |         CAST(SUM(n_l) OVER (PARTITION BY cls) AS BIGINT) AS n_total
             |  FROM grid
             |), term AS (
             |  SELECT cls, n_c,
             |         CAST(floor(abs(CAST(p_cum AS DOUBLE) / CAST(n_c AS DOUBLE)
             |               - CAST(q_cum AS DOUBLE) / CAST(n_total AS DOUBLE))
             |             * 1e9 + 0.5) AS BIGINT) AS term_fp
             |  FROM cum
             |), ag AS (
             |  SELECT cls, MAX(n_c) AS class_size,
             |         CAST(COUNT(*) AS BIGINT) AS n_levels,
             |         CAST(SUM(term_fp) AS BIGINT) AS sum_fp
             |  FROM term GROUP BY 1
             |), fin AS (
             |  SELECT cls, class_size, n_levels,
             |         CASE WHEN n_levels > 1
             |              THEN round(CAST(sum_fp AS DOUBLE) / 1e9
             |                     / CAST(n_levels - 1 AS DOUBLE), 6)
             |              ELSE 0.0 END AS emd
             |  FROM ag
             |)
             |SELECT cls AS c_nationkey, class_size, n_levels, emd,
             |       emd <= 0.2 AS t_ok
             |FROM fin ORDER BY c_nationkey""".stripMargin)),

    // Kruskal-Wallis H (Curation.kruskalWallis — Kruskal & Wallis 1952):
    // the k-group omnibus over the SAME pooled-midrank kernel as x216,
    // tie-corrected, with the epsilon-squared effect size. One output
    // row; the per-group R_g^2/(4 n_g) terms snap to the 1e-6 grid so
    // the group sum is order-free; N^3-N is a product of doubles (BIGINT
    // would overflow at scale and DuckDB throws where Spark nulls).
    QueryDef(
      "x218_kruskal_wallis",
      (s, dir) => graft.ext.Curation.kruskalWallis(Tables(s, dir).documents),
      Some(
        s"""$RankCtes, term AS (
           |  SELECT CAST(floor((CAST(r_sum2 AS DOUBLE) * CAST(r_sum2 AS DOUBLE))
           |           / (4.0 * CAST(n_a AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
           |         AS term_fp
           |  FROM ps
           |), g AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           |         CAST(SUM(term_fp) AS BIGINT) AS sum_fp
           |  FROM term
           |), fin AS (
           |  SELECT n_total, n_groups,
           |         12.0 * (CAST(sum_fp AS DOUBLE) / 1e6)
           |           / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
           |           - 3.0 * (CAST(n_total AS DOUBLE) + 1.0) AS h,
           |         1.0 - tie_term_d
           |           / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) - 1.0)
           |              * (CAST(n_total AS DOUBLE) + 1.0)) AS corr
           |  FROM g CROSS JOIN tot
           |)
           |SELECT n_total, n_groups, n_groups - 1 AS df, round(h, 6) AS h,
           |       CASE WHEN corr > 0 THEN round(h / corr, 6) END AS h_corrected,
           |       CASE WHEN corr > 0
           |            THEN round(h / corr / (CAST(n_total AS DOUBLE) - 1.0), 6)
           |            END AS epsilon_sq
           |FROM fin""".stripMargin)),

    // Pairwise Jensen-Shannon divergence (TextAnalysis.jsDivergenceMatrix):
    // x122's symmetric bounded pair form, and x214's distributional
    // companion (shared vocabulary vs shared USAGE). One-sided words
    // contribute exactly p*ln2, so only the intersection vocabulary
    // carries a correction - an inner token join, never a
    // union-of-supports. snapped-ln 1e-12 fixed-point terms; ln 2 is an
    // explicit double literal on both engines.
    QueryDef(
      "x221_js_divergence_matrix",
      (s, dir) => graft.ext.TextAnalysis.jsDivergenceMatrix(
          Tables(s, dir).documents)
        .orderBy("source_a", "source_b"),
      Some(
        raw"""WITH st AS (
             |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT source,
             |               unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2
             |), tot AS (
             |  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1
             |), av AS (
             |  SELECT st.source AS sa, tok, c AS ca, n AS na
             |  FROM st JOIN tot USING (source)
             |), bv AS (
             |  SELECT st.source AS sb, tok, c AS cb, n AS nb
             |  FROM st JOIN tot USING (source)
             |), terms AS (
             |  SELECT sa, sb,
             |         CAST(floor((
             |           (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) *
             |             (floor(ln(CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
             |               / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
             |                  + CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
             |               * 1e9 + 0.5) / 1e9) +
             |           (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
             |             (floor(ln(CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)
             |               / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
             |                  + CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
             |               * 1e9 + 0.5) / 1e9)
             |         ) * 1e12 + 0.5) AS BIGINT) AS term_fp
             |  FROM av JOIN bv USING (tok) WHERE sa < sb
             |), ag AS (
             |  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n_shared,
             |         CAST(SUM(term_fp) AS BIGINT) AS js_fp
             |  FROM terms GROUP BY 1, 2
             |), prs AS (
             |  SELECT a.source AS sa, b.source AS sb
             |  FROM tot a JOIN tot b ON a.source < b.source
             |)
             |SELECT prs.sa AS source_a, prs.sb AS source_b,
             |       COALESCE(n_shared, 0) AS n_shared_vocab,
             |       COALESCE(js_fp, 0) AS js_fp,
             |       0.6931471805599453
             |         + 0.5 * CAST(COALESCE(js_fp, 0) AS DOUBLE) / 1e12
             |         AS js_divergence
             |FROM prs LEFT JOIN ag ON ag.sa = prs.sa AND ag.sb = prs.sb
             |ORDER BY source_a, source_b""".stripMargin)),

    // Rank-biased overlap of source head vocabularies vs the corpus
    // ranking (TextAnalysis.rboHeadVocab — Webber et al. 2010), p = 1/2
    // truncated at depth 20: every geometric weight is an exact power
    // of two, each (1/2)^dd/dd term snaps to the 1e-12 grid, and a
    // token contributes from depth max(rank_src, rank_corpus) on — the
    // join-shaped spelling of the per-depth overlap sum.
    QueryDef(
      "x225_rbo_head_vocab",
      (s, dir) => graft.ext.TextAnalysis.rboHeadVocab(Tables(s, dir).documents)
        .orderBy("source"),
      Some(
        raw"""WITH st AS (
             |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT source,
             |               unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2
             |), corpus AS (
             |  SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM st GROUP BY 1
             |), ra AS (
             |  SELECT source, tok, rn AS ra FROM (
             |    SELECT source, tok,
             |           ROW_NUMBER() OVER (PARTITION BY source
             |             ORDER BY c DESC, tok) AS rn
             |    FROM st) WHERE rn <= 20
             |), rb AS (
             |  SELECT tok, rn AS rb FROM (
             |    SELECT tok, ROW_NUMBER() OVER (ORDER BY cc DESC, tok) AS rn
             |    FROM corpus) WHERE rn <= 20
             |), matched AS (
             |  SELECT source, greatest(ra.ra, rb.rb) AS m
             |  FROM ra JOIN rb USING (tok)
             |), terms AS (
             |  SELECT source,
             |         CAST(floor(pow(0.5, dd.dd) / CAST(dd.dd AS DOUBLE)
             |             * 1e12 + 0.5) AS BIGINT) AS term_fp
             |  FROM matched, unnest(generate_series(matched.m, 20)) AS dd(dd)
             |), ag AS (
             |  SELECT source, CAST(SUM(term_fp) AS BIGINT) AS rbo_fp
             |  FROM terms GROUP BY 1
             |), srcs AS (
             |  SELECT DISTINCT source FROM st
             |)
             |SELECT s.source,
             |       COALESCE(ag.rbo_fp, 0) AS rbo_fp,
             |       round(CAST(COALESCE(ag.rbo_fp, 0) AS DOUBLE) / 1e12, 6) AS rbo,
             |       round(CAST(COALESCE(ag.rbo_fp, 0) AS DOUBLE) / 1e12
             |             / (1.0 - pow(0.5, 20)), 6) AS rbo_norm
             |FROM srcs s LEFT JOIN ag ON ag.source = s.source
             |ORDER BY s.source""".stripMargin)),

    // AMS tug-of-war F2 sketch (Frequent.amsF2 — Alon-Matias-Szegedy
    // 1996): the self-join-size moment from 96 +-1-projection counters,
    // median-of-means (3x32). Every counter is an exact BIGINT (parity
    // sign from the family md5 hash); the only double is one division
    // by 32. Exact F2 and rel_error ride along gate-only - the sketch
    // family's fourth member beside CMS (x134), HLL (x160), KMV (x214).
    QueryDef(
      "x224_ams_f2_sketch",
      (s, dir) => graft.ext.Frequent.amsF2(Tables(s, dir).documents),
      Some(
        raw"""WITH cnt AS (
             |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY 1
             |), sj AS (
             |  SELECT js.j,
             |         CAST(SUM((CAST(('0x' || substr(md5(tok || '|ams|' || js.j), 1, 1))
             |             AS BIGINT) % 2 * 2 - 1) * c) AS BIGINT) AS s
             |  FROM cnt, (SELECT unnest(generate_series(0, 95)) AS j) js
             |  GROUP BY 1
             |), gg AS (
             |  SELECT j // 32 AS g, CAST(SUM(s * s) AS BIGINT) AS grp_fp
             |  FROM sj GROUP BY 1
             |), med AS (
             |  SELECT CAST(greatest(least(g0, g1),
             |           least(greatest(g0, g1), g2)) AS DOUBLE) / 32.0 AS f2_est
             |  FROM (SELECT MAX(CASE WHEN g = 0 THEN grp_fp END) AS g0,
             |               MAX(CASE WHEN g = 1 THEN grp_fp END) AS g1,
             |               MAX(CASE WHEN g = 2 THEN grp_fp END) AS g2
             |        FROM gg)
             |), ex AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
             |         CAST(COUNT(*) AS BIGINT) AS n_distinct,
             |         CAST(SUM(c * c) AS BIGINT) AS f2_exact
             |  FROM cnt
             |)
             |SELECT n_tokens, n_distinct, 96 AS d, f2_exact,
             |       round(f2_est, 6) AS f2_est,
             |       CASE WHEN f2_exact > 0
             |            THEN round(abs(round(f2_est, 6) - CAST(f2_exact AS DOUBLE))
             |                 / CAST(f2_exact AS DOUBLE), 6) END AS rel_error
             |FROM ex CROSS JOIN med""".stripMargin)),

    // KMV shard-merge audit (ops.Kmv.mergeAudit): the bottom-k member
    // of the mergeable-sketch audit family (x175 MinHash min, x201 HLL
    // max) — per-shard sketches merged as bottom-k-of-union must equal
    // the direct corpus sketch (n_mismatch 0), with the merged
    // estimate's rel_error against the exact distinct hash count.
    QueryDef(
      "x219_kmv_merge_audit",
      (s, dir) => graft.ops.Kmv.mergeAudit(Tables(s, dir).documents),
      Some(
        s"""${Extensions.ShingleCtes}, hx AS (
           |  SELECT doc_id,
           |         CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
           |  FROM sh
           |), shsk AS (
           |  SELECT shard, h FROM (
           |    SELECT shard, h, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS rn
           |    FROM (SELECT DISTINCT doc_id % 8 AS shard, h FROM hx)
           |  ) WHERE rn <= 256
           |), mg AS (
           |  SELECT h FROM (
           |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
           |    FROM (SELECT DISTINCT h FROM shsk)
           |  ) WHERE rn <= 256
           |), dr AS (
           |  SELECT h FROM (
           |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
           |    FROM (SELECT DISTINCT h FROM hx)
           |  ) WHERE rn <= 256
           |), mm AS (
           |  SELECT CAST(COALESCE(SUM(CASE WHEN m.h IS NULL OR d.h IS NULL
           |                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           |           AS n_mismatch
           |  FROM mg m FULL OUTER JOIN dr d ON d.h = m.h
           |), st AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sketch, MAX(h) AS hk FROM mg
           |), ex AS (
           |  SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact FROM hx
           |), fin AS (
           |  SELECT n_sketch, n_mismatch, n_exact,
           |         CASE WHEN n_sketch >= 256
           |              THEN round(CAST(255 AS DOUBLE) * 4294967296.0
           |                     / (CAST(hk AS DOUBLE) + 0.5), 6)
           |              ELSE CAST(n_sketch AS DOUBLE) END AS union_estimate
           |  FROM st CROSS JOIN mm CROSS JOIN ex
           |)
           |SELECT CAST(8 AS BIGINT) AS n_shards, n_mismatch, n_sketch,
           |       union_estimate, n_exact,
           |       CASE WHEN n_exact > 0
           |            THEN round(abs(union_estimate - CAST(n_exact AS DOUBLE))
           |                 / CAST(n_exact AS DOUBLE), 6) END AS rel_error
           |FROM fin""".stripMargin))
  )
}
