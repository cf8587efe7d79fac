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
    */
  private lazy val BucketSql: String =
    (0 until Similarity.NumPlanes).map { p =>
      s"CASE WHEN list_dot_product(emb, ${Similarity.planesSqlLiteral(p)}) > 0" +
        s" THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  private val K = Dedup.MinHashK

  def defs: Seq[QueryDef] = Seq(

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
             |), drp AS (
             |  SELECT DISTINCT a.bucket, b.vec_id
             |  FROM bk a JOIN bk b
             |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.emb, b.emb) >= 0.4
             |), nv AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM bk GROUP BY 1
             |), nd AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_dropped FROM drp GROUP BY 1
             |)
             |SELECT nv.bucket, nv.n_vecs,
             |       CAST(COALESCE(nd.n_dropped, 0) AS BIGINT) AS n_dropped,
             |       round(CAST(nv.n_vecs - COALESCE(nd.n_dropped, 0) AS DOUBLE)
             |         / CAST(nv.n_vecs AS DOUBLE), 6) AS retention
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
             |FROM z QUALIFY rank <= 20 ORDER BY rank""".stripMargin))
  )
}
