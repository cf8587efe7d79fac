package graft.queries

import graft.ext.{Curation, Dedup, Similarity}
import graft.io.Tables

/** Round-9 second batch: corpus-curation operators (graft.ext.Curation) —
  * DSIR importance-weighted selection, entropy quality filtering, SemDeDup,
  * the MinHash shard-merge audit, DP-noised statistics release, CUSUM
  * change-point detection, and robust embedding outliers. Implementations
  * live in ext/Curation.scala; bindings here pin parameters and carry the
  * DuckDB oracle twins.
  */
object Frontier {

  /** The 16-plane bucket expression as DuckDB SQL (mirrors
    * Similarity.lshBuckets: Σ_p 2^p·[plane_p·emb > 0]).
    * `private[queries]`: Batch17's incremental semantic dedup oracle
    * replays the same cell kernel — one definition. */
  private[queries] lazy val BucketSql: String =
    (0 until Similarity.NumPlanes).map { p =>
      s"CASE WHEN list_dot_product(emb, ${Similarity.planesSqlLiteral(p)}) > 0" +
        s" THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  private val K = Dedup.MinHashK

  /** Poisson(1) inverse-CDF CASE ladder over a uniform `u` — the SQL
    * twin of Curation.poissonWeight, ONE definition for the x188/x204
    * bootstrap oracles (the est2_fp 1e9→1e6 regrind had to be applied
    * in two copies; a future single-site ladder edit would silently
    * desynchronize one oracle from the deployed sampler). */
  private lazy val PoissonLadderSql: String =
    """CASE WHEN u < exp(-1.0) THEN 0
      |              WHEN u < exp(-1.0) * 2.0 THEN 1
      |              WHEN u < exp(-1.0) * 2.5 THEN 2
      |              WHEN u < exp(-1.0) * (2.5 + 1.0/6.0) THEN 3
      |              WHEN u < exp(-1.0) * (2.5 + 1.0/6.0 + 1.0/24.0) THEN 4
      |              WHEN u < exp(-1.0) * (2.5 + 1.0/6.0 + 1.0/24.0 + 1.0/120.0)
      |                THEN 5
      |              ELSE 6 END""".stripMargin

  /** Derandomized bootstrap uniform from (`idCol`, replicate r): md5
    * first-8-hex mod 1e6 midpoint on the `|boot|` salt stream — the SQL
    * twin of the Spark side's hash32 draw, shared by both bootstrap
    * oracles. */
  // ONE LINE by design: continuation lines starting with "||" would be
  // half-eaten by the CALLER's stripMargin (it strips through the first
  // '|' of the concat operator).
  private def bootUniformSql(idCol: String): String =
    s"(CAST(CAST(('0x'||substring(md5(CAST($idCol AS VARCHAR) || '|boot|' " +
      s"|| CAST(r AS VARCHAR)),1,8)) AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0"

  val defs: Seq[QueryDef] = Seq(

    // DSIR (Xie et al. 2023): hashed-unigram importance weights against a
    // target source, top-20% selection. The "model" is 64 bucket
    // log-ratios; everything else is token-stream aggregates.
    QueryDef(
      "x172_dsir_weights",
      (s, dir) => Curation.dsirWeights(Tables(s, dir).documents, "src0"),
      Some(
        raw"""WITH tok AS (
             |  SELECT doc_id, source,
             |         unnest(string_split_regex(trim(text), '\s+')) AS w
             |  FROM documents
             |), b AS (
             |  SELECT doc_id, source,
             |         CAST(('0x'||substring(md5(w),1,8)) AS BIGINT) % 64 AS bucket
             |  FROM tok
             |), raw AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM b GROUP BY 1
             |), rt AS (
             |  SELECT CAST(SUM(cr) AS BIGINT) AS tr FROM raw
             |), tgt AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
             |  FROM b WHERE source = 'src0' GROUP BY 1
             |), tt AS (
             |  SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM tgt
             |), lr AS (
             |  SELECT r.bucket,
             |         CAST(floor(ln((COALESCE(t.ct, 0) + 1.0) * (rt.tr + 64.0)
             |           / ((r.cr + 1.0) * (tt.tt + 64.0))) * 1e9 + 0.5) AS BIGINT)
             |           AS lr_fp
             |  FROM raw r LEFT JOIN tgt t USING (bucket)
             |  CROSS JOIN rt CROSS JOIN tt
             |), d AS (
             |  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |         CAST(SUM(lr.lr_fp) AS BIGINT) AS logw_fp
             |  FROM b JOIN lr USING (bucket) GROUP BY 1
             |), nn AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d
             |)
             |SELECT doc_id, n_tokens, logw_fp,
             |       round(CAST(logw_fp AS DOUBLE) / 1e9 / n_tokens, 6) AS avg_logw,
             |       (ROW_NUMBER() OVER (ORDER BY logw_fp DESC, doc_id ASC))
             |         <= CAST(ceil(0.2 * nd) AS BIGINT) AS selected
             |FROM d CROSS JOIN nn ORDER BY doc_id""".stripMargin)),

    // Unigram-entropy quality screen: exact integer sufficient statistics
    // (count × snapped-fp log), one division at the end.
    QueryDef(
      "x173_token_entropy",
      (s, dir) => Curation.tokenEntropy(Tables(s, dir).documents),
      Some(
        raw"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
             |  FROM documents
             |), tc AS (
             |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
             |), per AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             |         CAST(COUNT(*) AS BIGINT) AS k
             |  FROM tc GROUP BY 1
             |), terms AS (
             |  SELECT tc.doc_id, per.n, per.k,
             |         tc.c * CAST(floor(ln(CAST(tc.c AS DOUBLE) / CAST(per.n AS DOUBLE))
             |           * 1e9 + 0.5) AS BIGINT) AS t_fp
             |  FROM tc JOIN per USING (doc_id)
             |), agg AS (
             |  SELECT doc_id, n, k, CAST(SUM(t_fp) AS BIGINT) AS s_fp
             |  FROM terms GROUP BY 1, 2, 3
             |)
             |SELECT doc_id, n AS n_tokens, k AS n_distinct,
             |       round(-CAST(s_fp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) AS entropy,
             |       round(CASE WHEN k > 1
             |               THEN (-CAST(s_fp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
             |                 / ln(CAST(k AS DOUBLE))
             |               ELSE 0.0 END, 6) AS norm_entropy
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): within-cell cosine prune over the
    // pinned 16-plane cells, keep-first; per-cell retention report.
    QueryDef(
      "x174_semantic_dedup",
      (s, dir) => Curation.semanticDedup(Tables(s, dir).embeddings, tau = 0.4),
      Some(
        raw"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), bk AS (
             |  SELECT vec_id, emb, $BucketSql AS bucket FROM e
             |), nv AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM bk GROUP BY 1
             |), keptb AS (
             |  SELECT bucket FROM nv WHERE n_vecs <= 256
             |), kept AS (
             |  SELECT bk.* FROM bk JOIN keptb USING (bucket)
             |), drp AS (
             |  SELECT DISTINCT a.bucket, b.vec_id
             |  FROM kept a JOIN kept b
             |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) >= 0.4
             |), nd AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_dropped FROM drp GROUP BY 1
             |)
             |SELECT nv.bucket, nv.n_vecs,
             |       CASE WHEN nv.n_vecs <= 256
             |            THEN CAST(COALESCE(nd.n_dropped, 0) AS BIGINT) END
             |         AS n_dropped,
             |       CASE WHEN nv.n_vecs <= 256
             |            THEN round(CAST(nv.n_vecs - COALESCE(nd.n_dropped, 0)
             |              AS DOUBLE) / CAST(nv.n_vecs AS DOUBLE), 6) END
             |         AS retention,
             |       nv.n_vecs <= 256 AS within_cap
             |FROM nv LEFT JOIN nd USING (bucket) ORDER BY nv.bucket""".stripMargin)),

    // Mergeable-sketch audit: sharded MinHash == direct MinHash
    // (elementwise-min merge), plus the estimator-vs-exact Jaccard matrix
    // over per-source trigram sets.
    QueryDef(
      "x175_minhash_merge_audit",
      (s, dir) => Curation.minhashMergeAudit(Tables(s, dir).documents),
      Some {
        val sigs = (0 until K).map(j =>
          s"CAST(MIN((h1 + $j * h2) % 4294967296) AS BIGINT) AS s$j").mkString(", ")
        val merges = (0 until K).map(j =>
          s"CAST(MIN(s$j) AS BIGINT) AS m$j").mkString(", ")
        val mmSum = (0 until K).map(j =>
          s"CASE WHEN d.s$j <> m.m$j THEN 1 ELSE 0 END").mkString(" + ")
        val matchSum = (0 until K).map(j =>
          s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")
        raw"""WITH d0 AS (
             |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
             |  FROM documents
             |), tri AS (
             |  SELECT doc_id, source, array_to_string(ts[i:i+2], ' ') AS g
             |  FROM (SELECT doc_id, source, ts,
             |               unnest(generate_series(1, len(ts) - 2)) AS i
             |        FROM d0 WHERE len(ts) >= 3)
             |), st AS (
             |  SELECT DISTINCT source, g FROM tri
             |), h AS (
             |  SELECT source,
             |         CAST(('0x'||substring(md5(g),1,8)) AS BIGINT) AS h1,
             |         CAST(('0x'||substring(md5(g),9,8)) AS BIGINT) AS h2
             |  FROM st
             |), direct AS (
             |  SELECT source, $sigs FROM h GROUP BY source
             |), sst AS (
             |  SELECT DISTINCT source, doc_id % 4 AS shard, g FROM tri
             |), hs AS (
             |  SELECT source, shard,
             |         CAST(('0x'||substring(md5(g),1,8)) AS BIGINT) AS h1,
             |         CAST(('0x'||substring(md5(g),9,8)) AS BIGINT) AS h2
             |  FROM sst
             |), pershard AS (
             |  SELECT source, shard, $sigs FROM hs GROUP BY source, shard
             |), merged AS (
             |  SELECT source, $merges FROM pershard GROUP BY source
             |), mm AS (
             |  SELECT d.source, CAST($mmSum AS BIGINT) AS mismatches
             |  FROM direct d JOIN merged m USING (source)
             |), sizes AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM st GROUP BY 1
             |), inter AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |         CAST(COUNT(*) AS BIGINT) AS n_inter
             |  FROM st a JOIN st b ON a.g = b.g AND a.source < b.source
             |  GROUP BY 1, 2
             |), pairs AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |         CAST($matchSum AS BIGINT) AS n_match
             |  FROM direct a JOIN direct b ON a.source < b.source
             |), base AS (
             |  SELECT p.source_a, p.source_b,
             |         round(CAST(p.n_match AS DOUBLE) / ${K.toDouble}, 6) AS est_jaccard,
             |         round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             |           / CAST(sa.sz + sb.sz - COALESCE(i.n_inter, 0) AS DOUBLE), 6)
             |           AS exact_jaccard,
             |         ma.mismatches AS mm_a, mb.mismatches AS mm_b
             |  FROM pairs p
             |  LEFT JOIN inter i
             |    ON i.source_a = p.source_a AND i.source_b = p.source_b
             |  JOIN sizes sa ON sa.source = p.source_a
             |  JOIN sizes sb ON sb.source = p.source_b
             |  JOIN mm ma ON ma.source = p.source_a
             |  JOIN mm mb ON mb.source = p.source_b
             |)
             |SELECT source_a, source_b, est_jaccard, exact_jaccard,
             |       round(abs(est_jaccard - exact_jaccard), 6) AS abs_err,
             |       mm_a, mm_b
             |FROM base ORDER BY source_a, source_b""".stripMargin
      }),

    // Laplace-mechanism DP release of the event-type histogram with
    // derandomized inverse-CDF noise; the calibration audit keeps the
    // true counts alongside.
    QueryDef(
      "x176_dp_histogram",
      (s, dir) => Curation.dpNoisyCounts(Tables(s, dir).events),
      Some(
        raw"""WITH c AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
             |  FROM events GROUP BY 1
             |), n AS (
             |  SELECT event_type, true_count,
             |         (CAST(CAST(('0x'||substring(md5(event_type || '|dp-v1'),1,8))
             |             AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
             |  FROM c
             |), z AS (
             |  SELECT event_type, true_count,
             |         round(-1.0 * sign(u - 0.5)
             |           * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
             |  FROM n
             |)
             |SELECT event_type, true_count, noise,
             |       round(CAST(true_count AS DOUBLE) + noise, 6) AS noisy_count,
             |       CAST(1.0 AS DOUBLE) AS epsilon
             |FROM z ORDER BY event_type""".stripMargin)),

    // Cumulative-deviation change-point over the daily event count:
    // exact integer CUSUM (scaled by D), earliest-day tie-break,
    // before/after means.
    QueryDef(
      "x177_cusum_changepoint",
      (s, dir) => Curation.changepoint(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |         CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS d_days,
             |         CAST(SUM(y) AS BIGINT) AS s_tot
             |  FROM daily
             |), cum AS (
             |  SELECT day, y, t.d_days, t.s_tot,
             |         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx,
             |         CAST(SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             |           AS BIGINT) AS cum
             |  FROM daily CROSS JOIN tot t
             |), c AS (
             |  SELECT *, d_days * cum - idx * s_tot AS c_fp FROM cum
             |), r AS (
             |  SELECT *, ROW_NUMBER() OVER (ORDER BY abs(c_fp) DESC, day ASC) AS rk
             |  FROM c
             |)
             |SELECT strftime(day, '%Y-%m-%d') AS cp_day, d_days AS n_days,
             |       round(CAST(abs(c_fp) AS DOUBLE) / CAST(d_days AS DOUBLE), 6)
             |         AS max_dev,
             |       round(CAST(cum AS DOUBLE) / CAST(idx AS DOUBLE), 6) AS mean_before,
             |       CASE WHEN d_days > idx
             |            THEN round(CAST(s_tot - cum AS DOUBLE)
             |              / CAST(d_days - idx AS DOUBLE), 6) END AS mean_after
             |FROM r WHERE rk = 1""".stripMargin)),

    // Robust embedding outliers: exact-integer d² to the own-label
    // centroid, per-label median/MAD z-scores, global top-20.
    QueryDef(
      "x178_embedding_outliers",
      (s, dir) => Curation.embeddingOutliers(Tables(s, dir).embeddings),
      Some(
        raw"""WITH ex AS (
             |  SELECT vec_id, label, ord - 1 AS dim,
             |         CAST(floor(CAST(val AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS v_fp
             |  FROM (SELECT vec_id, label, unnest(embedding) AS val,
             |               generate_subscripts(embedding, 1) AS ord
             |        FROM embeddings)
             |), cent AS (
             |  SELECT label, dim,
             |         CAST(SUM(v_fp) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c_fp
             |  FROM ex GROUP BY 1, 2
             |), d2 AS (
             |  SELECT ex.vec_id, ex.label,
             |         CAST(SUM((ex.v_fp - c.c_fp) * (ex.v_fp - c.c_fp)) AS BIGINT) AS d2
             |  FROM ex JOIN cent c ON ex.label = c.label AND ex.dim = c.dim
             |  GROUP BY 1, 2
             |), med AS (
             |  SELECT label, median(d2) AS med FROM d2 GROUP BY 1
             |), wm AS (
             |  SELECT d2.vec_id, d2.label, d2.d2, med.med
             |  FROM d2 JOIN med USING (label)
             |), mad AS (
             |  SELECT label, median(abs(CAST(d2 AS DOUBLE) - med)) AS mad
             |  FROM wm GROUP BY 1
             |), z AS (
             |  SELECT wm.vec_id, wm.label, wm.d2,
             |         round((CAST(wm.d2 AS DOUBLE) - wm.med)
             |           / (1.4826 * mad.mad), 6) AS z
             |  FROM wm JOIN mad USING (label) WHERE mad.mad > 0
             |)
             |SELECT CAST(ROW_NUMBER() OVER (ORDER BY z DESC, vec_id ASC) AS BIGINT)
             |         AS rank,
             |       vec_id, label, d2, z
             |FROM z QUALIFY rank <= 20 ORDER BY rank""".stripMargin)),

    // Exact two-sample KS drift test per source (length distribution vs
    // the rest of the corpus), integer supremum, alpha=0.05 decision.
    QueryDef(
      "x179_ks_drift",
      (s, dir) => Curation.ksBySource(Tables(s, dir).documents),
      Some(
        raw"""WITH counts AS (
             |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2
             |), vals AS (
             |  SELECT DISTINCT n_chars FROM documents
             |), srcs AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
             |  FROM documents GROUP BY 1
             |), pv AS (
             |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS ct
             |  FROM documents GROUP BY 1
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM documents
             |), grid AS (
             |  SELECT s.source, s.ns, v.n_chars, COALESCE(c.c, 0) AS c, p.ct, t.nt
             |  FROM srcs s CROSS JOIN vals v
             |  LEFT JOIN counts c ON c.source = s.source AND c.n_chars = v.n_chars
             |  JOIN pv p ON p.n_chars = v.n_chars
             |  CROSS JOIN tot t
             |), cums AS (
             |  SELECT source, ns, nt - ns AS nr,
             |         CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s,
             |         CAST(SUM(ct) OVER (PARTITION BY source ORDER BY n_chars
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
             |  FROM grid
             |), d AS (
             |  SELECT source, ns, nr,
             |         MAX(abs(cum_s * nr - (cum_t - cum_s) * ns)) AS d_fp
             |  FROM cums GROUP BY 1, 2, 3
             |), base AS (
             |  SELECT source, ns AS n_source,
             |         round(CAST(d_fp AS DOUBLE) / CAST(ns * nr AS DOUBLE), 6)
             |           AS ks_stat,
             |         round(1.358 * sqrt(CAST(ns + nr AS DOUBLE)
             |           / CAST(ns * nr AS DOUBLE)), 6) AS crit_05
             |  FROM d
             |)
             |SELECT source, n_source, ks_stat, crit_05,
             |       ks_stat > crit_05 AS significant
             |FROM base ORDER BY source""".stripMargin)),

    // Kaplan–Meier time-to-first-purchase with right censoring at the
    // corpus horizon; snapped-ln running product, explicit zero
    // absorption.
    QueryDef(
      "x180_survival_km",
      (s, dir) => Curation.kaplanMeier(Tables(s, dir).events),
      Some(
        raw"""WITH base AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
             |  FROM events
             |), pu AS (
             |  SELECT user_id, MIN(us) AS t0,
             |         MIN(CASE WHEN event_type = 'purchase' THEN us END) AS tp
             |  FROM base GROUP BY 1
             |), hz AS (
             |  SELECT MAX(us) AS tmax FROM base
             |), durs AS (
             |  SELECT user_id,
             |         CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
             |              ELSE (tmax - t0) // 86400000000 END AS dur,
             |         tp IS NOT NULL AS is_event
             |  FROM pu CROSS JOIN hz
             |), nn AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM durs
             |), bd AS (
             |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS c_obs,
             |         CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d_i
             |  FROM durs GROUP BY 1
             |), cums AS (
             |  SELECT dur, d_i, c_obs, n_users,
             |         CAST(SUM(c_obs) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             |           AS BIGINT) AS cum_obs
             |  FROM bd CROSS JOIN nn
             |), ev AS (
             |  SELECT dur, d_i, n_users - cum_obs + c_obs AS n_risk
             |  FROM cums WHERE d_i > 0
             |), lnf AS (
             |  SELECT dur, d_i, n_risk,
             |         CASE WHEN d_i < n_risk
             |              THEN CAST(floor(ln(CAST(n_risk - d_i AS DOUBLE)
             |                / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
             |         END AS lnf_fp
             |  FROM ev
             |), agg AS (
             |  SELECT dur, d_i, n_risk,
             |         CAST(SUM(lnf_fp) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             |           AS BIGINT) AS cum_ln_fp,
             |         MAX(CASE WHEN d_i = n_risk THEN 1 ELSE 0 END)
             |           OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS zeroed
             |  FROM lnf
             |)
             |SELECT dur AS duration_days, n_risk AS n_at_risk, d_i AS n_events,
             |       CASE WHEN zeroed = 1 THEN 0.0
             |            ELSE round(floor(exp(CAST(cum_ln_fp AS DOUBLE) / 1e9)
             |              * 1e9 + 0.5) / 1e9, 6) END AS survival
             |FROM agg ORDER BY duration_days""".stripMargin)),

    // Benford first-digit audit over event values: exact integer-cents
    // digit extraction, per-digit observed vs log10(1+1/d).
    QueryDef(
      "x181_benford_audit",
      (s, dir) => Curation.benford(Tables(s, dir).events),
      Some(
        raw"""WITH f AS (
             |  SELECT value FROM events WHERE value > 0
             |), dg AS (
             |  SELECT CAST(substring(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM f
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM dg WHERE digit >= 1
             |), g AS (
             |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
             |  FROM dg WHERE digit >= 1 GROUP BY 1
             |), base AS (
             |  SELECT digit, n_obs,
             |         round(CAST(n_obs AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS obs_frac,
             |         round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p
             |  FROM g CROSS JOIN tot
             |)
             |SELECT digit, n_obs, obs_frac, benford_p,
             |       round(abs(obs_frac - benford_p), 6) AS abs_dev
             |FROM base ORDER BY digit""".stripMargin)),

    // Graph-expansion ANN refinement: neighbor-of-neighbor widening of
    // the banded candidate pool through a degree-capped (M=32) adjacency
    // — the HNSW bounded-neighbor-list invariant — exact re-rank, recall
    // lift vs brute truth for the pinned query set.
    QueryDef(
      "x182_knn_expansion",
      (s, dir) => Curation.knnExpansion(Tables(s, dir).embeddings, 0L until 10L),
      Some {
        raw"""${Advanced.bandCandSql(Similarity.SparseBands,
          Similarity.SparseBandBits, Similarity.SparseBucketCap)}, adj AS (
             |  SELECT vec_a AS src, vec_b AS dst FROM cand
             |  UNION ALL
             |  SELECT vec_b AS src, vec_a AS dst FROM cand
             |), qadj AS (
             |  SELECT src AS qid, dst AS nid FROM adj WHERE src < 10
             |), basetop AS (
             |  SELECT qid, nid FROM (
             |    SELECT c.qid, c.nid,
             |           ROW_NUMBER() OVER (PARTITION BY c.qid
             |             ORDER BY list_dot_product(eq.emb, en.emb) DESC, c.nid ASC)
             |             AS rn
             |    FROM qadj c
             |    JOIN e eq ON eq.vec_id = c.qid
             |    JOIN e en ON en.vec_id = c.nid) t
             |  WHERE rn <= 5
             |), adjc AS (
             |  SELECT src, dst FROM (
             |    SELECT src, dst,
             |           ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst ASC) AS drn
             |    FROM adj) t
             |  WHERE drn <= 32
             |), hop2 AS (
             |  SELECT b.qid, a.dst AS nid
             |  FROM basetop b JOIN adjc a ON a.src = b.nid
             |  WHERE a.dst <> b.qid
             |), expcand AS (
             |  SELECT DISTINCT qid, nid FROM (
             |    SELECT qid, nid FROM qadj UNION ALL SELECT qid, nid FROM hop2)
             |), exptop AS (
             |  SELECT qid, nid FROM (
             |    SELECT c.qid, c.nid,
             |           ROW_NUMBER() OVER (PARTITION BY c.qid
             |             ORDER BY list_dot_product(eq.emb, en.emb) DESC, c.nid ASC)
             |             AS rn
             |    FROM expcand c
             |    JOIN e eq ON eq.vec_id = c.qid
             |    JOIN e en ON en.vec_id = c.nid) t
             |  WHERE rn <= 5
             |), q AS (
             |  SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10
             |), truth AS (
             |  SELECT qid, nid FROM (
             |    SELECT q.qid, e.vec_id AS nid,
             |           ROW_NUMBER() OVER (PARTITION BY q.qid
             |             ORDER BY list_dot_product(q.qemb, e.emb) DESC, e.vec_id ASC)
             |             AS rn
             |    FROM q, e WHERE e.vec_id <> q.qid) t
             |  WHERE rn <= 5
             |), bh AS (
             |  SELECT t.qid,
             |         CAST(SUM(CASE WHEN b.nid IS NOT NULL THEN 1 ELSE 0 END)
             |           AS BIGINT) AS base_hits
             |  FROM truth t LEFT JOIN basetop b ON b.qid = t.qid AND b.nid = t.nid
             |  GROUP BY 1
             |), eh AS (
             |  SELECT t.qid,
             |         CAST(SUM(CASE WHEN x.nid IS NOT NULL THEN 1 ELSE 0 END)
             |           AS BIGINT) AS exp_hits
             |  FROM truth t LEFT JOIN exptop x ON x.qid = t.qid AND x.nid = t.nid
             |  GROUP BY 1
             |), base2 AS (
             |  SELECT b.qid, b.base_hits, h.exp_hits,
             |         round(CAST(b.base_hits AS DOUBLE) / 5.0, 6) AS recall_base,
             |         round(CAST(h.exp_hits AS DOUBLE) / 5.0, 6) AS recall_exp
             |  FROM bh b JOIN eh h USING (qid)
             |)
             |SELECT qid, base_hits, exp_hits, recall_base, recall_exp,
             |       round(recall_exp - recall_base, 6) AS lift
             |FROM base2 ORDER BY qid""".stripMargin
      }),

    // Exact weighted percentiles per return flag: integer threshold
    // crossing on a per-group cumulative-weight window.
    QueryDef(
      "x183_weighted_percentiles",
      (s, dir) => Curation.weightedPercentiles(Tables(s, dir).lineitem),
      Some(
        raw"""WITH base AS (
             |  SELECT l_returnflag AS grp, l_extendedprice AS x,
             |         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
             |  FROM lineitem
             |), twt AS (
             |  SELECT grp, CAST(SUM(w) AS BIGINT) AS tw FROM base GROUP BY 1
             |), cums AS (
             |  SELECT b.grp, b.x, t.tw,
             |         CAST(SUM(b.w) OVER (PARTITION BY b.grp
             |           ORDER BY b.x, b.l_orderkey, b.l_linenumber
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
             |  FROM base b JOIN twt t USING (grp)
             |)
             |SELECT grp AS l_returnflag, tw AS total_weight,
             |       MIN(CASE WHEN cw * 2 >= tw THEN x END) AS wp50,
             |       MIN(CASE WHEN cw * 10 >= tw * 9 THEN x END) AS wp90
             |FROM cums GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // U-shaped multi-touch attribution: 40/20/40 credit split on the
    // 1e-6 integer grid, per-channel exact totals.
    QueryDef(
      "x184_multitouch_attribution",
      (s, dir) => Curation.multiTouchAttribution(Tables(s, dir).events),
      Some(
        raw"""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             |         event_id
             |  FROM events
             |), p AS (
             |  SELECT user_id, us AS p_us, event_id AS p_id
             |  FROM ev WHERE event_type = 'purchase'
             |), t AS (
             |  SELECT user_id, event_type AS channel, us AS t_us, event_id AS t_id
             |  FROM ev WHERE event_type IN ('view', 'click')
             |), j AS (
             |  SELECT p.p_id, t.channel, t.t_us, t.t_id
             |  FROM p JOIN t ON p.user_id = t.user_id
             |  WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000
             |), ranked AS (
             |  SELECT p_id, channel,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY p_id
             |           ORDER BY t_us, t_id) AS BIGINT) AS pos,
             |         CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS k
             |  FROM j
             |), credited AS (
             |  SELECT channel,
             |         CASE WHEN k = 1 THEN 1000000
             |              WHEN pos = 1 OR pos = k
             |                THEN CASE WHEN k = 2 THEN 500000 ELSE 400000 END
             |              ELSE 200000 // (k - 2) END AS credit_fp
             |  FROM ranked
             |)
             |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
             |       round(CAST(SUM(credit_fp) AS DOUBLE) / 1e6, 6) AS credit
             |FROM credited GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Theil–Sen robust trend of daily event volume: median pairwise
    // slope + median residual intercept, snapped before each median.
    QueryDef(
      "x185_theilsen_trend",
      (s, dir) => Curation.theilSen(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT day, y,
             |         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
             |  FROM (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |               CAST(COUNT(*) AS BIGINT) AS y
             |        FROM events GROUP BY 1)
             |), slopes AS (
             |  SELECT floor(CAST(b.y - a.y AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)
             |           * 1e9 + 0.5) / 1e9 AS s
             |  FROM daily a JOIN daily b ON a.i < b.i
             |), sl AS (
             |  SELECT median(s) AS slope FROM slopes
             |), res AS (
             |  SELECT sl.slope,
             |         floor((CAST(d.y AS DOUBLE) - sl.slope * CAST(d.i AS DOUBLE))
             |           * 1e9 + 0.5) / 1e9 AS r
             |  FROM daily d CROSS JOIN sl
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             |       round(slope, 6) AS slope,
             |       round(median(r), 6) AS intercept
             |FROM res GROUP BY slope""".stripMargin)),

    // RFM segmentation: per-user recency/frequency/monetary with ntile
    // quintile scores (5 = best on every axis) and the monetary
    // cumulative-distribution percentile. Monetary is exact integer
    // cents. The Spark side derives each score from exactAscRank's
    // partitioned-window global rank (no user-grain data through a
    // single-task window); the oracle runs the equivalent global
    // ntile/cume_dist spec over the deterministic (metric, user_id)
    // orders — the outputs are bit-identical.
    QueryDef(
      "x186_rfm_segmentation",
      (s, dir) => Curation.rfmSegmentation(Tables(s, dir).events),
      Some(
        raw"""WITH ev AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
             |  FROM events
             |), hz AS (
             |  SELECT MAX(us) AS tmax FROM ev
             |), per AS (
             |  SELECT user_id, MAX(us) AS last_us,
             |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS frequency,
             |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents
             |                       ELSE 0 END) AS BIGINT) AS monetary_cents
             |  FROM ev GROUP BY 1
             |), rec AS (
             |  SELECT user_id, (tmax - last_us) // 86400000000 AS recency_days,
             |         frequency, monetary_cents
             |  FROM per CROSS JOIN hz
             |)
             |SELECT user_id, recency_days, frequency, monetary_cents,
             |       CAST(6 - ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC)
             |         AS BIGINT) AS r_q,
             |       CAST(6 - ntile(5) OVER (ORDER BY frequency DESC, user_id ASC)
             |         AS BIGINT) AS f_q,
             |       CAST(6 - ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC)
             |         AS BIGINT) AS m_q,
             |       round(cume_dist() OVER (ORDER BY monetary_cents ASC, user_id ASC), 6)
             |         AS m_cume
             |FROM rec ORDER BY user_id""".stripMargin)),

    // Revenue concentration: exact-integer Gini coefficient over
    // per-user purchase cents plus the top-decile revenue share —
    // the "how skewed is this corpus/revenue" audit (the same math
    // audits per-source token concentration in a training mix).
    QueryDef(
      "x187_gini_concentration",
      (s, dir) => Curation.giniConcentration(Tables(s, dir).events),
      Some(
        raw"""WITH per AS (
             |  SELECT user_id,
             |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
             |           AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1
             |), ranked AS (
             |  SELECT user_id, cents,
             |         CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, user_id ASC)
             |           AS BIGINT) AS i
             |  FROM per
             |), agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(cents) AS BIGINT) AS tot,
             |         CAST(SUM(i * cents) AS BIGINT) AS iws
             |  FROM ranked
             |), top AS (
             |  SELECT a.n, a.tot, a.iws, CAST(SUM(r.cents) AS BIGINT) AS top_cents
             |  FROM ranked r CROSS JOIN agg a
             |  WHERE r.i > a.n - ceil(CAST(a.n AS DOUBLE) / 10.0)
             |  GROUP BY 1, 2, 3
             |)
             |SELECT n AS n_users, tot AS total_cents,
             |       round((2.0 * CAST(iws AS DOUBLE)
             |         - CAST(n + 1 AS DOUBLE) * CAST(tot AS DOUBLE))
             |         / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini,
             |       round(CAST(top_cents AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             |         AS top_decile_share
             |FROM top""".stripMargin)),

    // Poisson-bootstrap CI for the mean purchase value: derandomized
    // Poisson(1) replicate weights, integer ratio estimates per
    // replicate, snapped-grid moments.
    QueryDef(
      "x188_poisson_bootstrap",
      (s, dir) => Curation.poissonBootstrap(Tables(s, dir).events),
      Some(
        raw"""WITH purch AS (
             |  SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'
             |), expl AS (
             |  SELECT event_id, cents, r
             |  FROM purch CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS r)
             |), uu AS (
             |  SELECT cents, r,
             |         ${bootUniformSql("event_id")} AS u
             |  FROM expl
             |), ww AS (
             |  SELECT cents, r,
             |         $PoissonLadderSql AS w
             |  FROM uu
             |), per AS (
             |  SELECT r, floor(CAST(SUM(w * cents) AS DOUBLE)
             |           / CAST(SUM(w) AS DOUBLE) * 1e9 + 0.5) / 1e9 AS est
             |  FROM ww GROUP BY 1
             |  HAVING SUM(w) > 0
             |), per2 AS (
             |  SELECT r, est,
             |         CAST(floor(est * est * 1e6 + 0.5) AS BIGINT) AS est2_fp
             |  FROM per
             |), agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nr, SUM(est) AS s1,
             |         CAST(SUM(est2_fp) AS BIGINT) AS s2fp
             |  FROM per2
             |), pt AS (
             |  SELECT CAST(SUM(cents) AS BIGINT) AS pc,
             |         CAST(COUNT(*) AS BIGINT) AS pn
             |  FROM purch
             |), base AS (
             |  SELECT round(CAST(pc AS DOUBLE) / 100.0 / CAST(pn AS DOUBLE), 6)
             |           AS point_mean,
             |         nr AS n_replicates,
             |         round(s1 / CAST(nr AS DOUBLE) / 100.0, 6) AS boot_mean,
             |         round(sqrt(greatest(0.0,
             |           (CAST(s2fp AS DOUBLE) / 1e6 - s1 * s1 / CAST(nr AS DOUBLE))
             |             / CAST(nr - 1 AS DOUBLE))) / 100.0, 6) AS boot_sd
             |  FROM agg CROSS JOIN pt
             |)
             |SELECT point_mean, n_replicates, boot_mean, boot_sd,
             |       round(point_mean - 1.96 * boot_sd, 6) AS ci_lo,
             |       round(point_mean + 1.96 * boot_sd, 6) AS ci_hi
             |FROM base""".stripMargin)),

    // Split-conformal forecast band over daily volume: Theil–Sen fit on
    // the first 2/3, exact order-statistic q90 on the held-out days.
    QueryDef(
      "x189_conformal_band",
      (s, dir) => Curation.conformalBand(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
             |  FROM (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |               CAST(COUNT(*) AS BIGINT) AS y
             |        FROM events GROUP BY 1)
             |), b0 AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS d,
             |         CAST(ceil(CAST(COUNT(*) AS DOUBLE) * 2.0 / 3.0) AS BIGINT)
             |           AS n_train
             |  FROM daily
             |), train AS (
             |  SELECT daily.* FROM daily CROSS JOIN b0 WHERE i <= n_train
             |), slopes AS (
             |  SELECT floor(CAST(b.y - a.y AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)
             |           * 1e9 + 0.5) / 1e9 AS s
             |  FROM train a JOIN train b ON a.i < b.i
             |), sl AS (
             |  SELECT median(s) AS b FROM slopes
             |), ic AS (
             |  SELECT sl.b,
             |         median(floor((CAST(t.y AS DOUBLE) - sl.b * CAST(t.i AS DOUBLE))
             |           * 1e9 + 0.5) / 1e9) AS a
             |  FROM train t CROSS JOIN sl GROUP BY sl.b
             |), cal AS (
             |  SELECT b0.d, b0.n_train, ic.a, ic.b,
             |         floor(abs(CAST(y AS DOUBLE)
             |           - (ic.a + ic.b * CAST(i AS DOUBLE))) * 1e9 + 0.5) / 1e9 AS ar
             |  FROM daily CROSS JOIN b0 CROSS JOIN ic WHERE i > b0.n_train
             |), mm AS (
             |  SELECT d, n_train, a, b, CAST(COUNT(*) AS BIGINT) AS m
             |  FROM cal GROUP BY 1, 2, 3, 4
             |), rk AS (
             |  SELECT cal.d, cal.n_train, cal.a, cal.b, cal.ar, mm.m,
             |         CAST(ceil(CAST(mm.m + 1 AS DOUBLE) * 0.9) AS BIGINT) AS k,
             |         CAST(ROW_NUMBER() OVER (ORDER BY cal.ar ASC, cal.d ASC)
             |           AS BIGINT) AS rn
             |  FROM cal JOIN mm ON mm.d = cal.d AND mm.n_train = cal.n_train
             |   AND mm.a = cal.a AND mm.b = cal.b
             |)
             |SELECT d AS n_days, n_train, m AS n_cal,
             |       round(b, 6) AS slope, round(a, 6) AS intercept,
             |       round(ar, 6) AS q90,
             |       round(a + b * CAST(d + 1 AS DOUBLE), 6) AS forecast_next,
             |       round(a + b * CAST(d + 1 AS DOUBLE) - ar, 6) AS band_lo,
             |       round(a + b * CAST(d + 1 AS DOUBLE) + ar, 6) AS band_hi
             |FROM rk WHERE rn = least(k, m)""".stripMargin)),

    // Int8 scalar-quantization recall: quantized top-k (exact integer
    // code dots x scales) vs full-precision truth for the pinned
    // queries.
    QueryDef(
      "x190_quantization_recall",
      (s, dir) => Curation.quantizationRecall(Tables(s, dir).embeddings,
        0L until 10L),
      Some(
        raw"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), mxs AS (
             |  SELECT vec_id, emb,
             |         list_aggregate(list_transform(emb, y -> abs(y)), 'max') AS mx
             |  FROM e
             |), quant AS (
             |  SELECT vec_id,
             |         list_transform(emb, x -> CASE WHEN mx = 0 THEN 0
             |           ELSE CAST(floor(x * 127.0 / mx + 0.5) AS INTEGER) END) AS q,
             |         mx / 127.0 AS scale
             |  FROM mxs
             |), qq AS (
             |  SELECT vec_id AS qid, q AS qa, scale AS sa
             |  FROM quant WHERE vec_id < 10
             |), qtop AS (
             |  SELECT qid, nid FROM (
             |    SELECT qq.qid, c.vec_id AS nid,
             |           ROW_NUMBER() OVER (PARTITION BY qq.qid
             |             ORDER BY list_dot_product(qq.qa, c.q) * qq.sa * c.scale
             |               DESC, c.vec_id ASC) AS rn
             |    FROM quant c CROSS JOIN qq WHERE c.vec_id <> qq.qid) t
             |  WHERE rn <= 5
             |), tq AS (
             |  SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 10
             |), truth AS (
             |  SELECT qid, nid FROM (
             |    SELECT tq.qid, e.vec_id AS nid,
             |           ROW_NUMBER() OVER (PARTITION BY tq.qid
             |             ORDER BY list_dot_product(tq.qe, e.emb) DESC, e.vec_id ASC)
             |             AS rn
             |    FROM e CROSS JOIN tq WHERE e.vec_id <> tq.qid) t
             |  WHERE rn <= 5
             |)
             |SELECT t.qid,
             |       CAST(SUM(CASE WHEN q.nid IS NOT NULL THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_overlap,
             |       round(CAST(SUM(CASE WHEN q.nid IS NOT NULL THEN 1 ELSE 0 END)
             |         AS DOUBLE) / 5.0, 6) AS recall
             |FROM truth t LEFT JOIN qtop q ON q.qid = t.qid AND q.nid = t.nid
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HLL register shard-merge audit + union cardinality: per-shard
    // registers max-merged must equal the direct registers (the
    // mergeability a distributed sketch rests on), estimate vs exact.
    QueryDef(
      "x191_hll_merge_audit",
      (s, dir) => graft.ops.Hll.mergeAudit(Tables(s, dir).documents, "text",
        org.apache.spark.sql.functions.col("doc_id") % 4),
      Some {
        val est = "(0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 * 134217728.0" +
          " / CAST(sum_fp AS DOUBLE)"
        val corrected =
          s"""CASE WHEN $est <= 2.5 * 64.0 AND v_empty > 0
             |     THEN 64.0 * ln(64.0 / CAST(v_empty AS DOUBLE))
             |     ELSE $est END""".stripMargin
        raw"""WITH h AS (
             |  SELECT doc_id % 4 AS shard,
             |         CAST(('0x'||substring(md5(text),1,8)) AS BIGINT) AS hv
             |  FROM documents WHERE text IS NOT NULL
             |), ranks AS (
             |  SELECT shard, hv % 64 AS bucket,
             |         CASE WHEN hv // 64 > 0 THEN 27 - length(bin(hv // 64))
             |              ELSE 27 END AS rank
             |  FROM h
             |), pershard AS (
             |  SELECT shard, bucket, MAX(rank) AS reg FROM ranks GROUP BY 1, 2
             |), merged AS (
             |  SELECT bucket, MAX(reg) AS reg FROM pershard GROUP BY 1
             |), direct AS (
             |  SELECT bucket, MAX(rank) AS dreg FROM ranks GROUP BY 1
             |), mm AS (
             |  SELECT CAST(SUM(CASE WHEN m.reg <> d.dreg THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_mismatch
             |  FROM merged m JOIN direct d USING (bucket)
             |), fp AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
             |         CAST(SUM(1::BIGINT << (27 - reg)) AS BIGINT) AS sum_fp_present
             |  FROM merged
             |), wf AS (
             |  SELECT CAST(64 - n_buckets AS BIGINT) AS v_empty,
             |         CAST(sum_fp_present + (64 - n_buckets) * 134217728 AS BIGINT)
             |           AS sum_fp
             |  FROM fp
             |), ex AS (
             |  SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact FROM documents
             |)
             |SELECT mm.n_mismatch, wf.v_empty, wf.sum_fp, ex.n_exact,
             |       round($corrected, 6) AS union_estimate,
             |       CASE WHEN n_exact > 0 THEN
             |         round(abs(round($corrected, 6) - CAST(n_exact AS DOUBLE))
             |           / CAST(n_exact AS DOUBLE), 6) END AS rel_error
             |FROM mm CROSS JOIN wf CROSS JOIN ex""".stripMargin
      }),

    // Neyman variance-optimal allocation vs proportional, from exact
    // integer sufficient statistics.
    QueryDef(
      "x192_neyman_allocation",
      (s, dir) => Curation.neymanAllocation(Tables(s, dir).documents),
      Some(
        raw"""WITH strata AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
             |         CAST(SUM(n_chars) AS BIGINT) AS sy,
             |         CAST(SUM(n_chars * n_chars) AS BIGINT) AS syy
             |  FROM documents GROUP BY 1
             |), tot AS (
             |  SELECT CAST(SUM(nh) AS BIGINT) AS n FROM strata
             |), ws AS (
             |  SELECT source, nh,
             |         CASE WHEN nh > 1 THEN floor(sqrt(greatest(0.0,
             |           (CAST(nh AS DOUBLE) * CAST(syy AS DOUBLE)
             |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             |             / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE))))
             |           * 1e9 + 0.5) / 1e9 ELSE 0.0 END AS sh
             |  FROM strata
             |), ws2 AS (
             |  SELECT source, nh, sh,
             |         floor(CAST(nh AS DOUBLE) * sh * 1e9 + 0.5) / 1e9 AS wh
             |  FROM ws
             |), wt AS (
             |  SELECT SUM(wh) AS wsum FROM ws2
             |)
             |SELECT source, nh AS n_stratum, round(sh, 6) AS stddev,
             |       CAST(floor(100.0 * CAST(nh AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
             |         AS BIGINT) AS alloc_prop,
             |       CAST(floor(100.0 * wh / wsum + 0.5) AS BIGINT) AS alloc_neyman
             |FROM ws2 CROSS JOIN tot CROSS JOIN wt ORDER BY source""".stripMargin)),

    // Lincoln–Petersen / Chapman capture–recapture estimate of the
    // distinct-document count from two content-hash captures.
    QueryDef(
      "x193_capture_recapture",
      (s, dir) => Curation.captureRecapture(Tables(s, dir).documents),
      Some(
        raw"""WITH m AS (
             |  SELECT text,
             |         CAST(('0x'||substring(md5(text || '|capA'),1,8)) AS BIGINT)
             |           % 100 < 30 AS in_a,
             |         CAST(('0x'||substring(md5(text || '|capB'),1,8)) AS BIGINT)
             |           % 100 < 30 AS in_b
             |  FROM documents
             |), agg AS (
             |  SELECT CAST(COUNT(DISTINCT CASE WHEN in_a THEN text END) AS BIGINT)
             |           AS n_a,
             |         CAST(COUNT(DISTINCT CASE WHEN in_b THEN text END) AS BIGINT)
             |           AS n_b,
             |         CAST(COUNT(DISTINCT CASE WHEN in_a AND in_b THEN text END)
             |           AS BIGINT) AS n_both,
             |         CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
             |  FROM m
             |), base AS (
             |  SELECT n_a, n_b, n_both, n_exact,
             |         CASE WHEN n_both > 0
             |              THEN round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             |                / CAST(n_both AS DOUBLE), 6) END AS lp_estimate,
             |         round(CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
             |           / CAST(n_both + 1 AS DOUBLE) - 1.0, 6) AS chapman_estimate
             |  FROM agg
             |)
             |SELECT n_a, n_b, n_both, n_exact, lp_estimate, chapman_estimate,
             |       round(abs(chapman_estimate - CAST(n_exact AS DOUBLE))
             |         / CAST(n_exact AS DOUBLE), 6) AS rel_error
             |FROM base""".stripMargin)),

    // Good–Turing missing mass per source: P0 = N1/N and the adjusted
    // singleton count 2*N2/N1.
    QueryDef(
      "x194_good_turing",
      (s, dir) => Curation.goodTuring(Tables(s, dir).documents),
      Some(
        raw"""WITH tc AS (
             |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT source,
             |               unnest(string_split_regex(trim(text), '\s+')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2
             |)
             |SELECT source,
             |       CAST(SUM(c) AS BIGINT) AS n_tokens,
             |       CAST(COUNT(*) AS BIGINT) AS n_types,
             |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |       round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |         / CAST(SUM(c) AS DOUBLE), 6) AS p_unseen,
             |       CASE WHEN SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
             |            THEN round(2.0 * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
             |              AS DOUBLE) / CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             |              AS DOUBLE), 6) END AS r_star
             |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Temporal train/test eval of the event-transition model: argmax
    // successor accuracy vs the majority baseline on held-out days.
    QueryDef(
      "x195_next_event_eval",
      (s, dir) => Curation.nextEventEval(Tables(s, dir).events),
      Some(
        raw"""WITH wd AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             |         event_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
             |  FROM events
             |), di AS (
             |  SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS day_idx
             |  FROM (SELECT DISTINCT day FROM wd)
             |), ev AS (
             |  SELECT wd.user_id, wd.event_type, wd.us, wd.event_id,
             |         CASE WHEN di.day_idx <= 20 THEN 'train' ELSE 'test' END AS split
             |  FROM wd JOIN di USING (day)
             |), trans AS (
             |  SELECT split, event_type AS prev,
             |         lead(event_type) OVER (PARTITION BY user_id, split
             |           ORDER BY us, event_id) AS next_type
             |  FROM ev
             |  QUALIFY next_type IS NOT NULL
             |), model AS (
             |  SELECT prev, next_type AS predicted FROM (
             |    SELECT prev, next_type, COUNT(*) AS c,
             |           ROW_NUMBER() OVER (PARTITION BY prev
             |             ORDER BY COUNT(*) DESC, next_type ASC) AS rn
             |    FROM trans WHERE split = 'train' GROUP BY 1, 2) t
             |  WHERE rn = 1
             |), maj AS (
             |  SELECT next_type AS majority_type FROM (
             |    SELECT next_type, COUNT(*) AS c
             |    FROM trans WHERE split = 'train' GROUP BY 1
             |    ORDER BY c DESC, next_type ASC LIMIT 1)
             |), test AS (
             |  SELECT prev, next_type FROM trans WHERE split = 'test'
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             |       CAST(SUM(CASE WHEN m.predicted = t.next_type THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_hits,
             |       CAST(SUM(CASE WHEN j.majority_type = t.next_type THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_majority_hits,
             |       round(CAST(SUM(CASE WHEN m.predicted = t.next_type THEN 1 ELSE 0
             |         END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
             |       round(CAST(SUM(CASE WHEN j.majority_type = t.next_type THEN 1
             |         ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             |         AS baseline_accuracy
             |FROM test t LEFT JOIN model m USING (prev) CROSS JOIN maj j""".stripMargin)),

    // kNN-disagreement mislabel screen over the sparse banded ANN path.
    QueryDef(
      "x196_label_noise_screen",
      (s, dir) => Curation.labelNoiseScreen(Tables(s, dir).embeddings),
      Some {
        raw"""${Advanced.bandCandSql(Similarity.SparseBands,
          Similarity.SparseBandBits, Similarity.SparseBucketCap)}, directed AS (
             |  SELECT vec_a AS vec_id, vec_b AS neighbor_id FROM cand
             |  UNION ALL
             |  SELECT vec_b AS vec_id, vec_a AS neighbor_id FROM cand
             |), lab AS (
             |  SELECT vec_id, label FROM embeddings
             |), topk AS (
             |  SELECT vec_id, neighbor_id FROM (
             |    SELECT d.vec_id, d.neighbor_id,
             |           ROW_NUMBER() OVER (PARTITION BY d.vec_id
             |             ORDER BY list_dot_product(ea.emb, eb.emb) DESC,
             |               d.neighbor_id ASC) AS rank
             |    FROM directed d
             |    JOIN e ea ON ea.vec_id = d.vec_id
             |    JOIN e eb ON eb.vec_id = d.neighbor_id) r
             |  WHERE rank <= 5
             |), agg AS (
             |  SELECT t.vec_id, la.label,
             |         CAST(COUNT(*) AS BIGINT) AS n_neighbors,
             |         CAST(SUM(CASE WHEN lb.label <> la.label THEN 1 ELSE 0 END)
             |           AS BIGINT) AS n_disagree
             |  FROM topk t
             |  JOIN lab la ON la.vec_id = t.vec_id
             |  JOIN lab lb ON lb.vec_id = t.neighbor_id
             |  GROUP BY 1, 2
             |)
             |SELECT vec_id, label, n_neighbors, n_disagree,
             |       round(CAST(n_disagree AS DOUBLE) / CAST(n_neighbors AS DOUBLE), 6)
             |         AS disagreement
             |FROM agg
             |WHERE n_neighbors >= 3 AND n_disagree * 5 >= n_neighbors * 4
             |ORDER BY vec_id""".stripMargin
      }),

    // Monroe et al. log-odds characteristic keywords per source.
    QueryDef(
      "x197_logodds_keywords",
      (s, dir) => Curation.logOddsKeywords(Tables(s, dir).documents),
      Some(
        raw"""WITH sw AS (
             |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS ysw
             |  FROM (SELECT source,
             |               unnest(string_split_regex(trim(text), '\s+')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2
             |), wt AS (
             |  SELECT w, CAST(SUM(ysw) AS BIGINT) AS yw FROM sw GROUP BY 1
             |), st AS (
             |  SELECT source, CAST(SUM(ysw) AS BIGINT) AS ns FROM sw GROUP BY 1
             |), vv AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(yw) AS BIGINT) AS n
             |  FROM wt
             |), sc AS (
             |  SELECT sw.source, sw.w, sw.ysw,
             |         sw.ysw + 1 AS a,
             |         st.ns + vv.v - sw.ysw - 1 AS b,
             |         wt.yw - sw.ysw + 1 AS c2,
             |         vv.n - st.ns + vv.v - (wt.yw - sw.ysw) - 1 AS d2
             |  FROM sw JOIN wt USING (w) JOIN st USING (source) CROSS JOIN vv
             |), zz AS (
             |  SELECT source, w, ysw,
             |         round((CAST(
             |             CAST(floor(ln(CAST(a AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
             |           - CAST(floor(ln(CAST(b AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
             |           - CAST(floor(ln(CAST(c2 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
             |           + CAST(floor(ln(CAST(d2 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
             |           AS DOUBLE) / 1e9)
             |           / sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(c2 AS DOUBLE)), 6)
             |           AS z
             |  FROM sc
             |)
             |SELECT source, rank, w AS word, ysw, z FROM (
             |  SELECT source, w, ysw, z,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY source
             |           ORDER BY z DESC, w ASC) AS BIGINT) AS rank
             |  FROM zz) t
             |WHERE rank <= 3 ORDER BY source, rank""".stripMargin)),

    // Pearson chi-square independence of hour-of-day x event type.
    QueryDef(
      "x198_hour_type_chi2",
      (s, dir) => Curation.hourTypeChiSquare(Tables(s, dir).events),
      Some(
        raw"""WITH obs AS (
             |  SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
             |         event_type AS t, CAST(COUNT(*) AS BIGINT) AS o
             |  FROM events GROUP BY 1, 2
             |), hrs AS (
             |  SELECT DISTINCT h FROM obs
             |), tps AS (
             |  SELECT DISTINCT t FROM obs
             |), rt AS (
             |  SELECT h, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1
             |), ct AS (
             |  SELECT t, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1
             |), nn AS (
             |  SELECT CAST(SUM(o) AS BIGINT) AS n,
             |         CAST(COUNT(DISTINCT h) AS BIGINT) AS nh,
             |         CAST(COUNT(DISTINCT t) AS BIGINT) AS nt
             |  FROM obs
             |), grid AS (
             |  SELECT hrs.h, tps.t, COALESCE(obs.o, 0) AS o0, rt.r, ct.c,
             |         nn.n, nn.nh, nn.nt
             |  FROM hrs CROSS JOIN tps
             |  LEFT JOIN obs ON obs.h = hrs.h AND obs.t = tps.t
             |  JOIN rt ON rt.h = hrs.h
             |  JOIN ct ON ct.t = tps.t
             |  CROSS JOIN nn
             |), terms AS (
             |  SELECT h, t, nh, nt,
             |         CAST(floor(
             |           (CAST(n AS DOUBLE) * CAST(o0 AS DOUBLE)
             |             - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
             |           * (CAST(n AS DOUBLE) * CAST(o0 AS DOUBLE)
             |             - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
             |           / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
             |             * CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS term_fp
             |  FROM grid
             |), chi AS (
             |  SELECT round(CAST(SUM(term_fp) AS DOUBLE) / 1e6, 6) AS chi2,
             |         (nh - 1) * (nt - 1) AS dof
             |  FROM terms GROUP BY nh, nt
             |), top1 AS (
             |  SELECT CAST(h AS VARCHAR) || ':' || t AS top_cell,
             |         round(CAST(term_fp AS DOUBLE) / 1e6, 6) AS top_cell_term
             |  FROM terms ORDER BY term_fp DESC, h ASC, t ASC LIMIT 1
             |)
             |SELECT chi2, dof, top_cell, top_cell_term
             |FROM chi CROSS JOIN top1""".stripMargin)),

    // Data scaling-law probe: nested-subset OOV curve in one pass (min-
    // hash threshold trick) + exact-integer log-log OLS exponent.
    QueryDef(
      "x199_scaling_law_probe",
      (s, dir) => Curation.scalingLawProbe(Tables(s, dir).documents),
      Some(
        raw"""WITH marked AS (
             |  SELECT doc_id, text,
             |         CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR) || '|eval'),
             |           1,8)) AS BIGINT) % 100 < 10 AS is_eval,
             |         CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR) || '|sub'),
             |           1,8)) AS BIGINT) % 100 AS h
             |  FROM documents
             |), tok AS (
             |  SELECT is_eval, h, array_to_string(ts[i:i+1], ' ') AS w
             |  FROM (SELECT is_eval, h, ts,
             |               unnest(generate_series(1, len(ts) - 1)) AS i
             |        FROM (SELECT is_eval, h,
             |                     string_split_regex(trim(text), '\s+') AS ts
             |              FROM marked)
             |        WHERE len(ts) >= 2)
             |), th AS (
             |  SELECT w, CAST(MIN(h) AS BIGINT) AS min_h
             |  FROM tok WHERE NOT is_eval GROUP BY 1
             |), oh AS (
             |  SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM tok WHERE NOT is_eval GROUP BY 1
             |), et AS (
             |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ce
             |  FROM tok WHERE is_eval GROUP BY 1
             |), etj AS (
             |  SELECT et.w, et.ce, th.min_h FROM et LEFT JOIN th USING (w)
             |), pcts AS (
             |  SELECT unnest([20, 40, 60, 80, 100]) AS pct
             |), ntok AS (
             |  SELECT pct, CAST(SUM(cnt) AS BIGINT) AS n_tokens
             |  FROM pcts JOIN oh ON oh.h < pcts.pct GROUP BY 1
             |), oov AS (
             |  SELECT pct, CAST(SUM(ce) AS BIGINT) AS n_eval,
             |         CAST(SUM(CASE WHEN min_h IS NULL OR min_h >= pct THEN ce
             |                       ELSE 0 END) AS BIGINT) AS n_oov
             |  FROM pcts CROSS JOIN etj GROUP BY 1
             |), pts AS (
             |  SELECT n.pct, n.n_tokens, o.n_eval, o.n_oov,
             |         CAST(floor(ln(CAST(n.n_tokens AS DOUBLE)) * 1e6 + 0.5)
             |           AS BIGINT) AS x_fp,
             |         CAST(floor(ln((CAST(o.n_oov AS DOUBLE) + 1.0)
             |           / (CAST(o.n_eval AS DOUBLE) + 1.0)) * 1e6 + 0.5)
             |           AS BIGINT) AS y_fp
             |  FROM ntok n JOIN oov o USING (pct)
             |), fit AS (
             |  SELECT round(
             |    CAST(COUNT(*) * SUM(x_fp * y_fp) - SUM(x_fp) * SUM(y_fp) AS DOUBLE)
             |    / CAST(COUNT(*) * SUM(x_fp * x_fp) - SUM(x_fp) * SUM(x_fp)
             |        AS DOUBLE), 6) AS alpha
             |  FROM pts
             |)
             |SELECT pct AS subset_pct, n_tokens, n_eval, n_oov,
             |       round(CAST(n_oov AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
             |         AS oov_rate,
             |       alpha
             |FROM pts CROSS JOIN fit ORDER BY subset_pct""".stripMargin)),

    // Market-basket association mining: top part pairs by lift with
    // integer cross-product ranking.
    QueryDef(
      "x200_market_basket",
      (s, dir) => Curation.marketBasket(Tables(s, dir).lineitem),
      Some(
        raw"""WITH basket AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             |), no AS (
             |  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |  FROM basket
             |), pc AS (
             |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS np
             |  FROM basket GROUP BY 1
             |), pr AS (
             |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |         CAST(COUNT(*) AS BIGINT) AS n_ab
             |  FROM basket a JOIN basket b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
             |), sc AS (
             |  SELECT pr.part_a, pr.part_b, pr.n_ab, pa.np AS n_a, pb.np AS n_b,
             |         no.n_orders
             |  FROM pr
             |  JOIN pc pa ON pa.l_partkey = pr.part_a
             |  JOIN pc pb ON pb.l_partkey = pr.part_b
             |  CROSS JOIN no
             |), rk AS (
             |  SELECT part_a, part_b, n_ab, n_a, n_b, n_orders,
             |         CAST(ROW_NUMBER() OVER (ORDER BY
             |           CAST(n_ab * n_orders AS DOUBLE)
             |             / CAST(n_a * n_b AS DOUBLE) DESC,
             |           part_a ASC, part_b ASC) AS BIGINT) AS rank
             |  FROM sc
             |)
             |SELECT rank, part_a, part_b, n_ab, n_a, n_b,
             |       round(CAST(n_ab * n_orders AS DOUBLE)
             |         / CAST(n_a * n_b AS DOUBLE), 6) AS lift,
             |       round(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
             |         AS confidence
             |FROM rk WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // James–Stein partial pooling of per-bucket purchase means.
    QueryDef(
      "x201_james_stein",
      (s, dir) => Curation.jamesSteinShrinkage(Tables(s, dir).events),
      Some(
        raw"""WITH purch AS (
             |  SELECT user_id % 10 AS grp,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'
             |), g AS (
             |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(cents) AS BIGINT) AS s,
             |         CAST(SUM(cents * cents) AS BIGINT) AS ss
             |  FROM purch GROUP BY 1
             |), tot AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
             |         CAST(COUNT(*) AS BIGINT) AS k
             |  FROM g
             |), wg AS (
             |  SELECT g.grp, g.n, g.s, g.ss, t.nt, t.st, t.k,
             |         floor(CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE) * 1e9 + 0.5)
             |           / 1e9 AS raw_mean,
             |         floor(CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE) * 1e9 + 0.5)
             |           / 1e9 AS grand_mean
             |  FROM g CROSS JOIN tot t
             |), terms AS (
             |  SELECT wg.*,
             |         CAST(floor(CAST(n * ss - s * s AS DOUBLE) / CAST(n AS DOUBLE)
             |           * 1e3 + 0.5) AS BIGINT) AS w_fp,
             |         CAST(floor(CAST(n AS DOUBLE)
             |           * (raw_mean - grand_mean) * (raw_mean - grand_mean)
             |           * 1e3 + 0.5) AS BIGINT) AS b_fp
             |  FROM wg
             |), vw AS (
             |  SELECT floor(CAST(SUM(w_fp) AS DOUBLE) / 1e3
             |           / CAST(MIN(nt) - MIN(k) AS DOUBLE) * 1e9 + 0.5) / 1e9 AS s2w,
             |         floor(CAST(SUM(b_fp) AS DOUBLE) / 1e3
             |           / CAST(MIN(k) - 1 AS DOUBLE) * 1e9 + 0.5) / 1e9 AS s2b
             |  FROM terms
             |), fin AS (
             |  SELECT wg.grp, wg.n, wg.raw_mean, wg.grand_mean,
             |         floor(CAST(wg.n AS DOUBLE) / (CAST(wg.n AS DOUBLE)
             |           + floor(vw.s2w / greatest(vw.s2b, 1e-9) * 1e9 + 0.5) / 1e9)
             |           * 1e9 + 0.5) / 1e9 AS w
             |  FROM wg CROSS JOIN vw
             |)
             |SELECT grp, n AS n_purchases,
             |       round(raw_mean / 100.0, 6) AS raw_mean,
             |       round(grand_mean / 100.0, 6) AS grand_mean,
             |       round(w, 6) AS weight,
             |       round((w * raw_mean + (1.0 - w) * grand_mean) / 100.0, 6)
             |         AS shrunk_mean
             |FROM fin ORDER BY grp""".stripMargin)),

    // 10%-trimmed robust mean per event type.
    QueryDef(
      "x202_trimmed_mean",
      (s, dir) => Curation.trimmedMean(Tables(s, dir).events),
      Some(
        raw"""WITH base AS (
             |  SELECT event_type,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, event_id
             |  FROM events
             |), rk AS (
             |  SELECT event_type, cents,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
             |           ORDER BY cents ASC, event_id ASC) AS BIGINT) AS rk,
             |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
             |  FROM base
             |), cutd AS (
             |  SELECT event_type, cents, rk, n,
             |         CAST(ceil(CAST(n AS DOUBLE) * 0.1) AS BIGINT) AS cut
             |  FROM rk
             |)
             |SELECT event_type, MIN(n) AS n,
             |       CAST(SUM(CASE WHEN rk > cut AND rk <= n - cut THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_kept,
             |       round(CAST(SUM(cents) AS DOUBLE) / 100.0
             |         / CAST(MIN(n) AS DOUBLE), 6) AS raw_mean,
             |       round(CAST(SUM(CASE WHEN rk > cut AND rk <= n - cut THEN cents
             |         END) AS DOUBLE) / 100.0
             |         / CAST(SUM(CASE WHEN rk > cut AND rk <= n - cut THEN 1 ELSE 0
             |         END) AS DOUBLE), 6) AS trimmed_mean
             |FROM cutd GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CUPED covariate adjustment: theta and the achieved variance
    // reduction (rho^2) from exact integer sufficient statistics.
    QueryDef(
      "x203_cuped",
      (s, dir) => Curation.cuped(Tables(s, dir).events),
      Some(
        raw"""WITH wd AS (
             |  SELECT user_id, event_type,
             |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             |         date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
             |  FROM events
             |), di AS (
             |  SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS day_idx
             |  FROM (SELECT DISTINCT day FROM wd)
             |), per AS (
             |  SELECT user_id,
             |         CAST(SUM(CASE WHEN day_idx <= 15 THEN 1 ELSE 0 END) AS BIGINT)
             |           AS x,
             |         CAST(SUM(CASE WHEN day_idx > 15 AND event_type = 'purchase'
             |           THEN cents ELSE 0 END) AS BIGINT) AS y
             |  FROM wd JOIN di USING (day) GROUP BY 1
             |), st AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |         CAST(SUM(x * x) AS BIGINT) AS sxx,
             |         CAST(SUM(x * y) AS BIGINT) AS sxy,
             |         CAST(SUM(y * y) AS BIGINT) AS syy
             |  FROM per
             |)
             |SELECT n AS n_users,
             |       round(CAST(n * sxy - sx * sy AS DOUBLE)
             |         / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
             |       round((CAST(n * sxy - sx * sy AS DOUBLE)
             |           * CAST(n * sxy - sx * sy AS DOUBLE))
             |         / (CAST(n * sxx - sx * sx AS DOUBLE)
             |           * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             |         AS variance_reduction
             |FROM st""".stripMargin)),

    // Complete A/B readout: hash arms, SRM guard, Poisson-bootstrap CI
    // on the treatment-control difference (A/A by construction).
    QueryDef(
      "x204_ab_test_harness",
      (s, dir) => Curation.abTestHarness(Tables(s, dir).events),
      Some {
        val w = PoissonLadderSql
        raw"""WITH pu AS (
             |  SELECT user_id,
             |         CAST(SUM(CASE WHEN event_type = 'purchase'
             |           THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS y,
             |         CAST(CAST(('0x'||substring(md5(CAST(user_id AS VARCHAR)
             |           || '|ab'),1,8)) AS BIGINT) % 2 AS INT) AS arm
             |  FROM events GROUP BY user_id
             |), srm AS (
             |  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |         floor(CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS DOUBLE)
             |           / CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             |           * 1e9 + 0.5) / 1e9 AS mean_a_c,
             |         floor(CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS DOUBLE)
             |           / CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |           * 1e9 + 0.5) / 1e9 AS mean_b_c
             |  FROM pu
             |), ex AS (
             |  SELECT user_id, arm, y, r
             |  FROM pu CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS r)
             |), uu AS (
             |  SELECT arm, y, r,
             |         ${bootUniformSql("user_id")} AS u
             |  FROM ex
             |), ww AS (
             |  SELECT arm, y, r,
             |         $w AS w
             |  FROM uu
             |), per AS (
             |  SELECT r,
             |         CAST(SUM(CASE WHEN arm = 0 THEN w * y ELSE 0 END) AS BIGINT)
             |           AS wya,
             |         CAST(SUM(CASE WHEN arm = 0 THEN w ELSE 0 END) AS BIGINT) AS wa,
             |         CAST(SUM(CASE WHEN arm = 1 THEN w * y ELSE 0 END) AS BIGINT)
             |           AS wyb,
             |         CAST(SUM(CASE WHEN arm = 1 THEN w ELSE 0 END) AS BIGINT) AS wb
             |  FROM ww GROUP BY 1
             |), dd AS (
             |  SELECT floor(CAST(wya AS DOUBLE) / CAST(wa AS DOUBLE) * 1e9 + 0.5)
             |           / 1e9
             |       - floor(CAST(wyb AS DOUBLE) / CAST(wb AS DOUBLE) * 1e9 + 0.5)
             |           / 1e9 AS d
             |  FROM per WHERE wa > 0 AND wb > 0
             |), d2 AS (
             |  SELECT d, CAST(floor(d * d * 1e6 + 0.5) AS BIGINT) AS d2_fp FROM dd
             |), boot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nr, SUM(d) AS s1,
             |         CAST(SUM(d2_fp) AS BIGINT) AS s2fp
             |  FROM d2
             |), base AS (
             |  SELECT s.n_a, s.n_b, s.mean_a_c, s.mean_b_c,
             |         s.mean_a_c - s.mean_b_c AS diff_c,
             |         sqrt(greatest(0.0, (CAST(b.s2fp AS DOUBLE) / 1e6
             |           - b.s1 * b.s1 / CAST(b.nr AS DOUBLE))
             |           / CAST(b.nr - 1 AS DOUBLE))) AS sd_c,
             |         round(CAST((s.n_a - s.n_b) * (s.n_a - s.n_b) AS DOUBLE)
             |           / CAST(s.n_a + s.n_b AS DOUBLE), 6) AS srm_chi2
             |  FROM srm s CROSS JOIN boot b
             |)
             |SELECT n_a, n_b,
             |       round(mean_a_c / 100.0, 6) AS mean_a,
             |       round(mean_b_c / 100.0, 6) AS mean_b,
             |       round(diff_c / 100.0, 6) AS diff,
             |       round(sd_c / 100.0, 6) AS boot_sd,
             |       round((diff_c - 1.96 * sd_c) / 100.0, 6) AS ci_lo,
             |       round((diff_c + 1.96 * sd_c) / 100.0, 6) AS ci_hi,
             |       srm_chi2,
             |       srm_chi2 > 3.841 AS srm_flag
             |FROM base""".stripMargin
      }),

    // Item-item collaborative filtering: cosine co-purchase similarity
    // over the hot-basket-capped (top-64 parts per customer) purchase
    // matrix, top-5 recommendations for the pinned customers.
    QueryDef(
      "x205_item_item_cf",
      (s, dir) => Curation.itemItemCf(Tables(s, dir).orders,
        Tables(s, dir).lineitem, 1L to 5L),
      Some(
        raw"""WITH cp0 AS (
             |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |), pop AS (
             |  SELECT part, CAST(COUNT(*) AS BIGINT) AS np0 FROM cp0 GROUP BY 1
             |), cp AS (
             |  SELECT cust, part FROM (
             |    SELECT c.cust, c.part,
             |           ROW_NUMBER() OVER (PARTITION BY c.cust
             |             ORDER BY p.np0 DESC, c.part ASC) AS brn
             |    FROM cp0 c JOIN pop p USING (part)) t
             |  WHERE brn <= 64
             |), pcnt AS (
             |  SELECT part, CAST(COUNT(*) AS BIGINT) AS np FROM cp GROUP BY 1
             |), pairs AS (
             |  SELECT a.part AS pa, b.part AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
             |  FROM cp a JOIN cp b ON a.cust = b.cust AND a.part < b.part
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |), sims AS (
             |  SELECT pa, pb,
             |         CAST(floor(CAST(n_ab AS DOUBLE)
             |           / sqrt(CAST(na.np AS DOUBLE) * CAST(nb.np AS DOUBLE))
             |           * 1e9 + 0.5) AS BIGINT) AS sim_fp
             |  FROM pairs
             |  JOIN pcnt na ON na.part = pairs.pa
             |  JOIN pcnt nb ON nb.part = pairs.pb
             |), und AS (
             |  SELECT pa AS owned, pb AS cand, sim_fp FROM sims
             |  UNION ALL
             |  SELECT pb AS owned, pa AS cand, sim_fp FROM sims
             |), own AS (
             |  SELECT cust, part FROM cp WHERE cust IN (1, 2, 3, 4, 5)
             |), ownall AS (
             |  SELECT cust, part FROM cp0 WHERE cust IN (1, 2, 3, 4, 5)
             |), scored AS (
             |  SELECT o.cust, u.cand, CAST(SUM(u.sim_fp) AS BIGINT) AS score_fp,
             |         CAST(COUNT(*) AS BIGINT) AS n_paths
             |  FROM own o
             |  JOIN und u ON u.owned = o.part
             |  LEFT JOIN ownall o2 ON o2.cust = o.cust AND o2.part = u.cand
             |  WHERE o2.part IS NULL
             |  GROUP BY 1, 2
             |)
             |SELECT cust AS o_custkey, rank, cand AS part, n_paths,
             |       round(CAST(score_fp AS DOUBLE) / 1e9, 6) AS score
             |FROM (SELECT scored.*,
             |             CAST(ROW_NUMBER() OVER (PARTITION BY cust
             |               ORDER BY score_fp DESC, cand ASC) AS BIGINT) AS rank
             |      FROM scored)
             |WHERE rank <= 5 ORDER BY o_custkey, rank""".stripMargin)),

    // Walk-forward canonical MASE (Hyndman & Koehler 2006): frozen
    // Theil-Sen test error scaled by the IN-SAMPLE one-step naive MAE.
    QueryDef(
      "x206_forecast_skill",
      (s, dir) => Curation.forecastSkill(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT day, y,
             |         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             |         lag(y) OVER (ORDER BY day) AS y_prev
             |  FROM (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |               CAST(COUNT(*) AS BIGINT) AS y
             |        FROM events GROUP BY 1)
             |), b0 AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS d FROM daily
             |), wb AS (
             |  SELECT daily.*, b0.d, b0.d - 10 AS n_train
             |  FROM daily CROSS JOIN b0
             |), train AS (
             |  SELECT * FROM wb WHERE i <= n_train
             |), slopes AS (
             |  SELECT floor(CAST(b.y - a.y AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)
             |           * 1e9 + 0.5) / 1e9 AS s
             |  FROM train a JOIN train b ON a.i < b.i
             |), sl AS (
             |  SELECT median(s) AS b FROM slopes
             |), ic AS (
             |  SELECT sl.b,
             |         median(floor((CAST(t.y AS DOUBLE) - sl.b * CAST(t.i AS DOUBLE))
             |           * 1e9 + 0.5) / 1e9) AS a
             |  FROM train t CROSS JOIN sl GROUP BY sl.b
             |), test AS (
             |  SELECT wb.y, wb.i, ic.a, ic.b
             |  FROM wb CROSS JOIN ic WHERE wb.i > wb.n_train
             |), nt AS (
             |  SELECT CAST(SUM(abs(y - y_prev)) AS BIGINT) AS snt,
             |         CAST(COUNT(*) AS BIGINT) AS nnt
             |  FROM wb WHERE i > 1 AND i <= n_train
             |), err AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             |         CAST(SUM(CAST(floor(abs(CAST(y AS DOUBLE)
             |           - (a + b * CAST(i AS DOUBLE))) * 1e9 + 0.5) AS BIGINT))
             |           AS BIGINT) AS sm_fp
             |  FROM test
             |)
             |SELECT n_test,
             |       round(CAST(sm_fp AS DOUBLE) / 1e9
             |         / CAST(n_test AS DOUBLE), 6) AS mae_model,
             |       round(CAST(snt AS DOUBLE) / CAST(nnt AS DOUBLE), 6)
             |         AS mae_naive_train,
             |       CASE WHEN snt > 0
             |            THEN round((CAST(sm_fp AS DOUBLE) / 1e9
             |              / CAST(n_test AS DOUBLE))
             |              / (CAST(snt AS DOUBLE) / CAST(nnt AS DOUBLE)), 6)
             |            END AS mase
             |FROM err CROSS JOIN nt""".stripMargin)),

    // Spearman rank correlation between the view and purchase daily
    // series: exact average-ranks on the x2 integer grid.
    QueryDef(
      "x207_spearman_daily",
      (s, dir) => Curation.spearmanDaily(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS ya,
             |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS yb
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |  GROUP BY 1
             |), rn AS (
             |  SELECT day, ya, yb,
             |         CAST(ROW_NUMBER() OVER (ORDER BY ya, day) AS BIGINT) AS rn_ya,
             |         CAST(ROW_NUMBER() OVER (ORDER BY yb, day) AS BIGINT) AS rn_yb
             |  FROM daily
             |), rk AS (
             |  SELECT day,
             |         MIN(rn_ya) OVER (PARTITION BY ya)
             |           + MAX(rn_ya) OVER (PARTITION BY ya) AS ra2,
             |         MIN(rn_yb) OVER (PARTITION BY yb)
             |           + MAX(rn_yb) OVER (PARTITION BY yb) AS rb2
             |  FROM rn
             |), st AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(ra2) AS BIGINT) AS sa, CAST(SUM(rb2) AS BIGINT) AS sb,
             |         CAST(SUM(ra2 * ra2) AS BIGINT) AS saa,
             |         CAST(SUM(ra2 * rb2) AS BIGINT) AS sab,
             |         CAST(SUM(rb2 * rb2) AS BIGINT) AS sbb
             |  FROM rk
             |)
             |SELECT n AS n_days,
             |       CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
             |            THEN round(CAST(n * sab - sa * sb AS DOUBLE)
             |              / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
             |                * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
             |       END AS spearman_rho
             |FROM st""".stripMargin)),

    // STL-lite seasonal anomaly screen: day-of-week medians removed,
    // robust z on the remainder.
    QueryDef(
      "x208_seasonal_anomaly",
      (s, dir) => Curation.seasonalAnomaly(Tables(s, dir).events),
      Some(
        raw"""WITH daily AS (
             |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |         CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1
             |), dw AS (
             |  SELECT day, y, CAST(dayofweek(day) + 1 AS INT) AS dow FROM daily
             |), dmed AS (
             |  SELECT dow, median(y) AS med_dow FROM dw GROUP BY 1
             |), resid AS (
             |  SELECT dw.day, dw.dow, dw.y, dmed.med_dow,
             |         CAST(dw.y AS DOUBLE) - dmed.med_dow AS r
             |  FROM dw JOIN dmed USING (dow)
             |), c AS (
             |  SELECT median(r) AS med_r FROM resid
             |), m AS (
             |  SELECT median(abs(r - c.med_r)) AS mad_r FROM resid CROSS JOIN c
             |)
             |SELECT strftime(day, '%Y-%m-%d') AS day, dow, y,
             |       round(med_dow, 6) AS dow_median,
             |       round((r - c.med_r) / (1.4826 * m.mad_r), 6) AS z,
             |       abs(round((r - c.med_r) / (1.4826 * m.mad_r), 6)) > 3.5
             |         AS is_anomaly
             |FROM resid CROSS JOIN c CROSS JOIN m
             |WHERE m.mad_r > 0
             |ORDER BY day""".stripMargin))
  )
}
