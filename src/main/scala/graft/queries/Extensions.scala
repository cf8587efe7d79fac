package graft.queries

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.io.Tables
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (BASELINE.json north star) bound
  * to the driver contract: dedup (exact / MinHash+LSH / SimHash / n-gram
  * Jaccard / embedding cosine), similarity search (brute-force kNN +
  * hyperplane-LSH buckets), text analysis (token stats, quality, lang-ID,
  * fingerprint), multimodal metadata, and the events-table time ops.
  *
  * Implementations live in graft.ext.*; these bindings pin parameters,
  * add deterministic output ordering, and carry the DuckDB oracle twins.
  */
object Extensions {

  /** Shared oracle CTE: distinct word-bigram shingles per document
    * (mirrors Dedup.shingles). `private[queries]`: Batch13's KMV oracle
    * replays the same shingle kernel — one definition, as always. */
  private[queries] val ShingleCtes =
    raw"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(generate_series(1, greatest(length(ts)-1, 1)),
         |                i -> array_to_string(ts[i:i+1], ' '))) AS shingle
         |  FROM tok
         |)""".stripMargin

  /** Oracle CTE for MinHash signatures (mirrors Dedup.minhashSignatures:
    * Kirsch-Mitzenmacher h_j = (h1 + j*h2) mod 2^32 from one md5).
    * `private[queries]`: Batch17's incremental-dedup oracle replays the
    * same signature kernel — one definition. */
  private[queries] val SigCte = {
    val mins = (0 until Dedup.MinHashK)
      .map(j => s"min((h1 + $j * h2) % 4294967296) AS mh$j").mkString(",\n         ")
    s""", hashed AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h1,
       |         CAST(('0x' || substring(md5(shingle), 9, 8)) AS BIGINT) AS h2
       |  FROM sh
       |), sig AS (
       |  SELECT doc_id, $mins
       |  FROM hashed GROUP BY 1
       |)""".stripMargin
  }

  private def bandExpr(b: Int) =
    s"md5(CAST(mh${2 * b} AS VARCHAR) || '|' || CAST(mh${2 * b + 1} AS VARCHAR))"

  /** The LSH candidate+verify CTE chain appended after
    * `$ShingleCtes $SigCte`: bands → (kept →) cand → sizes → inter.
    * `cap = Some(n)` inserts the hot-bucket QUALIFY guard (x66's scale
    * path). ONE definition for the seven LSH dedup oracles — any change
    * to the band scheme or the verify join previously had to be
    * replicated by hand per oracle, the drift class the x213/x188
    * multi-site fixes showed is real. */
  /** The MinHash band-key union over `sig` — one SELECT per band.
    * `private[queries]`: shared with Batch17's incremental-dedup oracle. */
  private[queries] lazy val MinHashBandUnionSql: String = (0 until Dedup.NumBands)
    .map(b => s"SELECT doc_id, $b AS band_idx, ${bandExpr(b)} AS band_key FROM sig")
    .mkString("\n  UNION ALL ")

  private def lshCandCtes(cap: Option[Int] = None): String = {
    val bandUnion = MinHashBandUnionSql
    val keptCte = cap.fold("") { n =>
      s""", kept AS (
         |  SELECT doc_id, band_idx, band_key FROM bands
         |  QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_key) <= $n
         |)""".stripMargin
    }
    val candSrc = if (cap.isDefined) "kept" else "bands"
    s""", bands AS (
       |  $bandUnion
       |)$keptCte, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM $candSrc a JOIN $candSrc b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2
       |)""".stripMargin
  }

  /** Verified-pairs tail over inter/sizes: the thresholded Jaccard
    * select shared by x07/x66. */
  private val JaccardPairsSql: String =
    """SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT doc_a, doc_b,
      |         CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
      |  FROM inter
      |  JOIN sizes na ON na.doc_id = doc_a
      |  JOIN sizes nb ON nb.doc_id = doc_b) j
      |WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""".stripMargin

  /** dup_pairs: the verified near-dup pair set over inter/sizes —
    * shared head of [[ClusterCtes]] and the x117 source matrix. */
  private val DupPairsCte: String =
    """, dup_pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
      |    FROM inter
      |    JOIN sizes na ON na.doc_id = doc_a
      |    JOIN sizes nb ON nb.doc_id = doc_b) j
      |  WHERE jaccard >= 0.3
      |)""".stripMargin

  /** dup_pairs → sym → reach: the recursive transitive-closure block
    * shared by the four cluster-consuming oracles (x22/x96/x144/x115).
    * The caller swaps the leading WITH for WITH RECURSIVE. */
  private val ClusterCtes: String =
    DupPairsCte +
      """, sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM dup_pairs
        |), reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
        |)""".stripMargin

  /** Shared oracle CTE chain tok → h → s → sim: the SQL replay of
    * Dedup.simhash's ±1 per-bit votes from md5 hex nibbles. ONE
    * definition for the x08/x23 oracles — two copies of the
    * bit-extraction expressions would have to track Dedup.simhash in
    * lockstep independently. */
  private lazy val SimhashCtes: String = {
    val sums = (0 until 16).map { bit =>
      val d = bit / 4 + 1
      val k = bit % 4
      s"SUM((((strpos('0123456789abcdef', substring(hx, $d, 1)) - 1) >> $k) & 1) * 2 - 1) AS s$bit"
    }.mkString(",\n    ")
    val sim = (0 until 16).map(bit => s"CASE WHEN s$bit > 0 THEN ${1L << bit} ELSE 0 END")
      .mkString(" + ")
    raw"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk FROM documents
         |), h AS (
         |  SELECT doc_id, md5(tk) AS hx FROM tok
         |), s AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM h GROUP BY 1
         |), sim AS (
         |  SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM s
         |)""".stripMargin
  }

  private val stopList = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")

  /** Hot-bucket cap for the registered capped LSH dedup variant (x66).
    * 16 keeps measured recall complete on this corpus at sf0.01 and sf0.1
    * while dropping the skew-driving buckets (widest sf0.1 bucket: 176).
    * Declared before `defs` — oracle strings interpolate it at init.
    */
  val LshBucketCap = 16

  val defs: Seq[QueryDef] = Seq(

    // ---- text analysis -------------------------------------------------
    QueryDef(
      "x01_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables(s, dir).documents).orderBy("doc_id"),
      Some(raw"""SELECT doc_id,
                |  length(string_split_regex(trim(text), '\s+')) AS n_tokens,
                |  length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
                |  length(text) AS n_chars,
                |  CAST(length(text) AS DOUBLE) / length(string_split_regex(trim(text), '\s+')) AS avg_token_len
                |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "x02_quality_score",
      (s, dir) => TextAnalysis.qualityScore(Tables(s, dir).documents).orderBy("doc_id"),
      Some(raw"""WITH t AS (
                |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ts FROM documents
                |), m AS (
                |  SELECT doc_id, length(ts) AS n_tokens,
                |    CAST(length(list_filter(ts, x -> x IN ($stopList))) AS DOUBLE) / length(ts) AS stopword_ratio,
                |    CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / greatest(length(text), 1) AS special_ratio
                |  FROM t
                |)
                |SELECT doc_id, n_tokens, stopword_ratio, special_ratio,
                |  0.4 * stopword_ratio + 0.3 * (1.0 - special_ratio) +
                |  0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality_score
                |FROM m ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "x03_lang_id",
      (s, dir) => TextAnalysis.languageId(Tables(s, dir).documents).orderBy("doc_id"),
      Some {
        val markers = TextAnalysis.LangMarkers
        val scoreExprs = markers.map { case (l, words) =>
          if (l == "zh") raw"length(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS score_$l"
          else s"length(list_filter(ts, x -> x IN (${words.map(w => s"'$w'").mkString(", ")}))) AS score_$l"
        }.mkString(",\n    ")
        val maxExpr = markers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
        val caseExpr = markers.map { case (l, _) =>
          s"WHEN score_$l = m AND m > 0 THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        raw"""WITH t AS (
             |  SELECT doc_id, lang AS labeled_lang, text,
             |         string_split_regex(trim(text), '\s+') AS ts
             |  FROM documents
             |), sc AS (
             |  SELECT doc_id, labeled_lang,
             |    $scoreExprs
             |  FROM t
             |), mx AS (
             |  SELECT *, $maxExpr AS m FROM sc
             |)
             |SELECT doc_id, labeled_lang, score_en, score_fr, score_es, score_de, score_zh,
             |       $caseExpr AS predicted_lang,
             |       ($caseExpr) = labeled_lang AS is_match
             |FROM mx ORDER BY doc_id""".stripMargin
      }),

    QueryDef(
      "x04_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(Tables(s, dir).documents).orderBy("doc_id"),
      Some(raw"""WITH tok AS (
                |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
                |)
                |SELECT doc_id,
                |  list_min(list_transform(generate_series(1, greatest(length(ts)-4, 1)),
                |           i -> md5(array_to_string(ts[i:i+4], ' ')))) AS fingerprint
                |FROM tok ORDER BY doc_id""".stripMargin)),

    // ---- dedup ---------------------------------------------------------
    QueryDef(
      "x05_dedup_exact",
      (s, dir) => Dedup.exact(Tables(s, dir).documents).orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS content_hash,
             |  COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
             |  doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "x06_minhash_signatures",
      (s, dir) => Dedup.minhashSignatures(Tables(s, dir).documents).orderBy("doc_id"),
      Some {
        val bands = (0 until Dedup.NumBands).map(b => s"${bandExpr(b)} AS band$b").mkString(", ")
        s"$ShingleCtes $SigCte SELECT doc_id, $bands FROM sig ORDER BY doc_id"
      }),

    QueryDef(
      "x07_lsh_dedup_pairs",
      (s, dir) => Dedup.lshDedupPairs(Tables(s, dir).documents, 0.3).orderBy("doc_a", "doc_b"),
      Some(s"$ShingleCtes $SigCte${lshCandCtes()}\n$JaccardPairsSql"),
      bench = false),

    // The SCALE path for text dedup: same LSH→verify two-phase as x07 but
    // with the hot-bucket guard on (16 members per band bucket — measured
    // full recall at sf0.01 AND sf0.1 on this corpus, while the widest
    // sf0.1 bucket alone is 176 docs = 15,400 candidate pairs without the
    // cap). x07 stays registered (diag) as the uncapped reference; this
    // variant carries the headline bench number.
    QueryDef(
      "x66_lsh_dedup_pairs_capped",
      (s, dir) => Dedup.lshDedupPairs(Tables(s, dir).documents, 0.3, bucketCap = LshBucketCap)
        .orderBy("doc_a", "doc_b"),
      Some(s"$ShingleCtes $SigCte${lshCandCtes(Some(LshBucketCap))}\n$JaccardPairsSql")),

    QueryDef(
      "x08_simhash",
      (s, dir) => Dedup.simhash(Tables(s, dir).documents).orderBy("doc_id"),
      Some {
        raw"""$SimhashCtes
             |SELECT doc_id, simhash,
             |       simhash % 16 AS block0, (simhash // 16) % 16 AS block1,
             |       (simhash // 256) % 16 AS block2, (simhash // 4096) % 16 AS block3
             |FROM sim ORDER BY doc_id""".stripMargin
      }),

    QueryDef(
      "x23_simhash_neardup_pairs",
      (s, dir) => Dedup.simhashNearDupPairs(Tables(s, dir).documents, 3)
        .orderBy("doc_a", "doc_b"),
      Some {
        // The shared simhash CTE (SimhashCtes, same as x08), then
        // 4x4-bit band equi-join (full recall for hamming<=3 by
        // pigeonhole) + verify.
        val bandUnion = (0 until graft.ext.Dedup.NumSimBands)
          .map(b => s"SELECT doc_id, simhash, $b AS band_idx, (simhash // ${1 << (4 * b)}) % 16 AS band_key FROM sim")
          .mkString("\n  UNION ALL ")
        raw"""$SimhashCtes, bands AS (
             |  $bandUnion
             |), cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
             |                  b.doc_id AS doc_b, b.simhash AS sim_b
             |  FROM bands a JOIN bands b
             |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
             |)
             |SELECT doc_a, doc_b,
             |       bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) AS hamming
             |FROM cand
             |WHERE bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin
      },
      bench = false),

    QueryDef(
      "x09_ngram_jaccard_pairs",
      (s, dir) => Dedup.ngramJaccardPairs(Tables(s, dir).documents, 0.3).orderBy("doc_a", "doc_b"),
      Some(s"""$ShingleCtes, sizes AS (
              |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
              |), inter AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2
              |)
              |SELECT doc_a, doc_b, jaccard FROM (
              |  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
              |  FROM inter
              |  JOIN sizes na ON na.doc_id = doc_a
              |  JOIN sizes nb ON nb.doc_id = doc_b) j
              |WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""".stripMargin),
      bench = false),

    // Duplicate clusters: distributed min-label propagation on the Spark
    // side vs a recursive-CTE transitive closure in DuckDB — both resolve
    // every document to its component's minimum doc_id, so the iterative
    // distributed algorithm is oracle-checkable against set-based SQL.
    QueryDef(
      "x22_duplicate_clusters",
      (s, dir) => Dedup.duplicateClusters(Tables(s, dir).documents, 0.3).orderBy("doc_id"),
      Some {
        val base = s"""$ShingleCtes $SigCte${lshCandCtes()}$ClusterCtes
           |SELECT a AS doc_id, MIN(b) AS cluster, MIN(b) = a AS is_canonical
           |FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
        "WITH RECURSIVE" + base.stripPrefix("WITH")
      },
      bench = false), // iterative driver-synced loop; correctness-gated at sf0.01

    // Dedup RETENTION POLICY (Dedup.keepBestPerCluster): x22's clusters
    // joined with the x02 quality score, the best-scored document of
    // each cluster kept (ties to the smaller doc_id) — "which copy
    // survives", the decision a curation pipeline actually executes.
    // The oracle extends x22's recursive-CTE components with the x02
    // quality CTE and one window.
    QueryDef(
      "x96_dedup_keep_best",
      (s, dir) => Dedup.keepBestPerCluster(Tables(s, dir).documents, 0.3)
        .orderBy("doc_id"),
      Some {
        val base = raw"""$ShingleCtes $SigCte${lshCandCtes()}$ClusterCtes, clusters AS (
           |  SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1
           |), q AS (
           |  SELECT doc_id,
           |    0.4 * (CAST(length(list_filter(ts, x -> x IN ($stopList))) AS DOUBLE) / length(ts)) +
           |    0.3 * (1.0 - CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / greatest(length(text), 1)) +
           |    0.3 * least(1.0, CAST(length(ts) AS DOUBLE) / 100.0) AS quality_score
           |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ts FROM documents)
           |)
           |SELECT c.doc_id, c.cluster, q.quality_score,
           |       (ROW_NUMBER() OVER (PARTITION BY c.cluster
           |          ORDER BY q.quality_score DESC, c.doc_id ASC)) = 1 AS kept
           |FROM clusters c JOIN q USING (doc_id)
           |ORDER BY doc_id""".stripMargin
        "WITH RECURSIVE" + base.stripPrefix("WITH")
      },
      bench = false), // shares x22's iterative cluster loop; gated at sf0.01

    // Effective token mass (Dedup.effectiveTokens): x22's clusters turned
    // into the honest per-source dataset size — each doc's tokens count
    // 1/cluster_size on a 1e-6 integer grid. raw vs effective is the
    // dedup-discount a data buyer actually cares about.
    QueryDef(
      "x144_effective_tokens",
      (s, dir) => Dedup.effectiveTokens(Tables(s, dir).documents, 0.3)
        .orderBy("source"),
      Some {
        val base = raw"""$ShingleCtes $SigCte${lshCandCtes()}$ClusterCtes, clusters AS (
           |  SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1
           |), csize AS (
           |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS csz FROM clusters GROUP BY 1
           |), toks AS (
           |  SELECT doc_id, source,
           |         CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
           |  FROM documents
           |)
           |SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(SUM(t.n_tokens) AS BIGINT) AS raw_tokens,
           |       CAST(SUM(t.n_tokens * 1000000 // cs.csz) AS BIGINT) AS eff_tokens_fp,
           |       CAST(SUM(t.n_tokens * 1000000 // cs.csz) AS DOUBLE) / 1000000.0 AS effective_tokens
           |FROM toks t JOIN clusters c USING (doc_id) JOIN csize cs USING (cluster)
           |GROUP BY 1 ORDER BY 1""".stripMargin
        "WITH RECURSIVE" + base.stripPrefix("WITH")
      },
      bench = false), // shares x22's iterative cluster loop; gated at sf0.01

    // UniMax over EFFECTIVE token mass (Pipeline.unimaxFromCounts ∘
    // Dedup.effectiveTokens): the allocation a real mixing pipeline
    // wants — budget water-fills over x144's dedup-discounted per-source
    // mass (1e-6 fp-grid BIGINTs; units cancel in epochs), with epoch
    // cap 1: never allocate more than a source's DEDUPLICATED data.
    // Duplicated sources hit their (shrunken) cap and the surplus flows
    // to genuinely-novel sources — composing x22's clusters, x144's
    // discount, and x215's closed-form water-filling in one oracle-gated
    // query (the allocation CTE chain is Batch13.unimaxSql, single-
    // sourced with x215's).
    QueryDef(
      "x220_unimax_effective",
      (s, dir) => graft.ext.Pipeline.unimaxFromCounts(
          Dedup.effectiveTokens(Tables(s, dir).documents, 0.3)
            .select(col("source").as("grp"), col("n_docs"),
              col("eff_tokens_fp").as("n_tokens")),
          "source", 1, 9, 10)
        .orderBy("source"),
      Some {
        val base = raw"""$ShingleCtes $SigCte${lshCandCtes()}$ClusterCtes, clusters AS (
           |  SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1
           |), csize AS (
           |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS csz FROM clusters GROUP BY 1
           |), toks AS (
           |  SELECT doc_id, source,
           |         CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
           |  FROM documents
           |), effc AS (
           |  SELECT t.source AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |         CAST(SUM(t.n_tokens * 1000000 // cs.csz) AS BIGINT) AS n_tokens
           |  FROM toks t JOIN clusters c USING (doc_id) JOIN csize cs USING (cluster)
           |  GROUP BY 1
           |)""".stripMargin + Batch13.unimaxSql("effc", 1, 9, 10, "source")
        "WITH RECURSIVE" + base.stripPrefix("WITH")
      },
      bench = false), // shares x22's iterative cluster loop; gated at sf0.01

    // ---- embedding similarity -----------------------------------------
    QueryDef(
      "x10_embedding_knn",
      (s, dir) => Similarity.bruteKnn(Tables(s, dir).embeddings, 0L until 10L, 5)
        .orderBy("qid", "rank"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), q AS (
             |  SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10
             |), scored AS (
             |  SELECT q.qid, e.vec_id AS neighbor_id,
             |         list_dot_product(q.qemb, e.emb) AS score
             |  FROM q, e WHERE e.vec_id <> q.qid
             |)
             |SELECT qid, rank, neighbor_id FROM (
             |  SELECT qid, neighbor_id,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id ASC) AS rank
             |  FROM scored) r
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // Banded hyperplane-LSH candidates + exact cosine verification — the
    // scale path IS the registered query (the brute all-pairs loop is a
    // test-suite recall baseline only). The oracle replays the identical
    // banding with the planes as list literals, so the ~97%-recall
    // candidate set is deterministic and hash-matched, and every emitted
    // cosine is exact.
    QueryDef(
      "x11_embedding_neardup_pairs",
      (s, dir) => Similarity.annPairs(Tables(s, dir).embeddings, 0.4)
        .orderBy("vec_a", "vec_b"),
      Some {
        val bandSelects = (0 until Similarity.AnnBands).map { b =>
          val key = (0 until Similarity.AnnBandBits).map { j =>
            val lit = Similarity.planesSqlLiteral(b * Similarity.AnnBandBits + j)
            s"CASE WHEN list_dot_product(emb, $lit) > 0 THEN ${1 << j} ELSE 0 END"
          }.mkString(" + ")
          s"SELECT vec_id, emb, $b AS band_idx, $key AS band_key FROM e"
        }.mkString("\n  UNION ALL ")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
           |), bands AS (
           |  $bandSelects
           |), cand AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id
           |)
           |SELECT vec_a, vec_b, cosine FROM (
           |  SELECT c.vec_a, c.vec_b, list_dot_product(ea.emb, eb.emb) AS cosine
           |  FROM cand c
           |  JOIN e ea ON ea.vec_id = c.vec_a
           |  JOIN e eb ON eb.vec_id = c.vec_b) p
           |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin
      }),

    QueryDef(
      "x12_hyperplane_lsh_buckets",
      (s, dir) => Similarity.lshBuckets(Tables(s, dir).embeddings).orderBy("vec_id"),
      Some {
        val bucket = (0 until Similarity.NumPlanes).map { p =>
          s"CASE WHEN list_dot_product(emb, ${Similarity.planesSqlLiteral(p)}) > 0 THEN ${1L << p} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
           |)
           |SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM e ORDER BY vec_id""".stripMargin
      }),

    QueryDef(
      "x17_ivf_assignment",
      (s, dir) => Similarity.ivfAssign(Tables(s, dir).embeddings, 16).orderBy("vec_id"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), c AS (
             |  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16
             |), scored AS (
             |  SELECT e.vec_id, c.cid, list_dot_product(e.emb, c.cemb) AS s FROM e, c
             |)
             |SELECT vec_id, cluster FROM (
             |  SELECT vec_id, cid AS cluster,
             |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
             |  FROM scored) r
             |WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // IVF index balance report (Similarity.ivfCellStats): per-cell
    // population + the imbalance factor (max/mean) — the "retrain the
    // coarse quantizer" signal a production ANN index watches.
    QueryDef(
      "x145_ivf_cell_stats",
      (s, dir) => Similarity.ivfCellStats(Tables(s, dir).embeddings, 16)
        .orderBy("cluster"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), c AS (
             |  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16
             |), scored AS (
             |  SELECT e.vec_id, c.cid, list_dot_product(e.emb, c.cemb) AS s FROM e, c
             |), assign AS (
             |  SELECT vec_id, cluster FROM (
             |    SELECT vec_id, cid AS cluster,
             |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
             |    FROM scored) r
             |  WHERE rn = 1
             |), cells AS (
             |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cell_size FROM assign GROUP BY 1
             |), roll AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             |         CAST(SUM(cell_size) AS BIGINT) AS n_vectors,
             |         CAST(MIN(cell_size) AS BIGINT) AS min_cell,
             |         CAST(MAX(cell_size) AS BIGINT) AS max_cell
             |  FROM cells
             |)
             |SELECT cells.cluster, cells.cell_size, roll.n_cells, roll.n_vectors,
             |       roll.min_cell, roll.max_cell,
             |       CAST(roll.max_cell AS DOUBLE)
             |         / (CAST(roll.n_vectors AS DOUBLE) / CAST(roll.n_cells AS DOUBLE)) AS imbalance
             |FROM cells CROSS JOIN roll
             |ORDER BY cluster""".stripMargin)),

    // The IVF *search* path (the scale dial of the family: probe the
    // nprobe best cells per query, brute-force only inside them). Fully
    // deterministic given the pinned centroids, so the oracle replays
    // assignment, probe ranking, and in-cell ranking as window CTEs.
    QueryDef(
      "x18_ivf_search",
      (s, dir) => Similarity.ivfSearch(Tables(s, dir).embeddings, 0L until 10L, 5, 16, 4)
        .orderBy("qid", "rank"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), c AS (
             |  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16
             |), scored AS (
             |  SELECT e.vec_id, c.cid, list_dot_product(e.emb, c.cemb) AS s FROM e, c
             |), assigned AS (
             |  SELECT vec_id, cluster FROM (
             |    SELECT vec_id, cid AS cluster,
             |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
             |    FROM scored) r
             |  WHERE rn = 1
             |), q AS (
             |  SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10
             |), probe AS (
             |  SELECT qid, qemb, cluster FROM (
             |    SELECT q.qid, q.qemb, c.cid AS cluster,
             |           ROW_NUMBER() OVER (PARTITION BY q.qid
             |             ORDER BY list_dot_product(q.qemb, c.cemb) DESC, c.cid ASC) AS rn
             |    FROM q, c) r
             |  WHERE rn <= 4
             |), cand AS (
             |  SELECT p.qid, e.vec_id AS neighbor_id, list_dot_product(p.qemb, e.emb) AS score
             |  FROM probe p
             |  JOIN assigned a ON a.cluster = p.cluster
             |  JOIN e ON e.vec_id = a.vec_id
             |  WHERE e.vec_id <> p.qid
             |)
             |SELECT qid, rank, neighbor_id FROM (
             |  SELECT qid, neighbor_id,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id ASC) AS rank
             |  FROM cand) r
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // A6's documented scale option: sketch-based distinct counting next to
    // the exact value. HLL internals differ between engines, so the sketch
    // estimate itself cannot be hash-compared — instead the query emits an
    // accuracy boolean the oracle pins to TRUE. The default rsd 0.05 is
    // one STANDARD DEVIATION, not a bound, so the pinned threshold is
    // three rsd (15%) — an estimate outside 3 sigma means the sketch is
    // broken, not unlucky. The exact column is oracle-checked bit-for-bit.
    QueryDef(
      "x19_approx_distinct",
      (s, dir) => Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.15).as("sketch_within_3rsd"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS sketch_within_3rsd
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered-set aggregates: exact interpolated percentiles (Spark's
    // sort-based percentile() matches DuckDB's quantile_cont bit-for-bit —
    // verified; the approx_percentile sketch is the documented scale
    // option, like x19 for distinct counts).
    QueryDef(
      "x20_percentiles",
      (s, dir) => Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.75)").as("p75"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
             |  quantile_cont(o_totalprice, 0.25) AS p25,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.75) AS p75,
             |  quantile_cont(o_totalprice, 0.9) AS p90
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Decile segmentation of customers by lifetime revenue (the "VIP
    // tiers" cut). Scale shape: a global NTILE window would move every
    // customer row through ONE partition (WindowExec with no
    // partitionBy); instead compute the 9 exact percentile boundaries
    // (one partial-aggregate pass), broadcast the single boundary row,
    // and assign deciles by comparison — embarrassingly parallel, no
    // global sort. Decile 1 is the top tier: revenue above the 90th
    // percentile. percentile() is bit-identical to DuckDB quantile_cont
    // (proven by x20), so boundary comparisons match exactly.
    QueryDef(
      "x21_revenue_deciles",
      (s, dir) => {
        val taus = (1 to 9).map(_ / 10.0)
        val bounds = graft.warehouse.View.dw(s, dir)
          .agg(expr(s"percentile(total_revenue, array(${taus.mkString(",")}))").as("bs"))
        val above = (0 until 9)
          .map(i => when(col("total_revenue") > col("bs").getItem(i), 1).otherwise(0))
          .reduce(_ + _)
        graft.warehouse.View.dw(s, dir)
          .select(col("customer_id"), col("total_revenue"))
          .crossJoin(broadcast(bounds))
          .withColumn("decile", (lit(10) - above).cast("long"))
          .groupBy("decile")
          .agg(
            count(lit(1)).as("n_customers"),
            max(col("total_revenue")).as("max_revenue"),
            min(col("total_revenue")).as("min_revenue"))
          .orderBy("decile")
      },
      Some {
        val above = (1 to 9)
          .map(i => s"CASE WHEN total_revenue > bs[$i] THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""${graft.warehouse.RevenueSummary.oracleCtes},
           |bounds AS (
           |  SELECT quantile_cont(total_revenue, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
           |  FROM dw
           |)
           |SELECT decile, COUNT(*) AS n_customers,
           |       MAX(total_revenue) AS max_revenue, MIN(total_revenue) AS min_revenue
           |FROM (
           |  SELECT customer_id, total_revenue,
           |         CAST(10 - ($above) AS BIGINT) AS decile
           |  FROM dw, bounds) t
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Generator/explode surface: corpus vocabulary statistics — every
    // dedup shingle pipeline starts with exactly this explode; here it is
    // the user-facing top-k token frequency table.
    QueryDef(
      "x24_vocabulary",
      (s, dir) => Tables(s, dir).documents
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("occurrences"))
        .orderBy(col("occurrences").desc, col("token").asc)
        .limit(20),
      Some(raw"""SELECT token, COUNT(*) AS occurrences FROM (
                |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
                |  FROM documents) t
                |GROUP BY 1 ORDER BY occurrences DESC, token ASC LIMIT 20""".stripMargin)),

    // UNION ALL across heterogeneous sources: one activity timeline from
    // orders + events, tagged by kind and bucketed by month — the
    // "combine feeds" shape of a multi-source pipeline.
    QueryDef(
      "x25_activity_feed",
      (s, dir) => {
        val t = Tables(s, dir)
        val orderFeed = t.orders.select(lit("order").as("kind"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        val eventFeed = t.events.select(lit("event").as("kind"),
          date_format(col("ts"), "yyyy-MM").as("month"))
        orderFeed.unionAll(eventFeed)
          .groupBy("kind", "month")
          .agg(count(lit(1)).as("n"))
          .orderBy("kind", "month")
      },
      Some("""SELECT kind, month, COUNT(*) AS n FROM (
             |  SELECT 'order' AS kind, strftime(o_orderdate, '%Y-%m') AS month FROM orders
             |  UNION ALL
             |  SELECT 'event' AS kind, strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month FROM events) t
             |GROUP BY 1, 2 ORDER BY kind, month""".stripMargin)),

    // Deterministic train/val/test split: content-stable md5 uniform +
    // threshold comparison — reproducible across runs/engines, stable
    // under corpus growth (randomSplit is neither). The uniform is
    // h/2^32 (exact in double), so the oracle's comparisons agree bitwise.
    QueryDef(
      "x26_train_split",
      (s, dir) => graft.ext.Pipeline.trainSplit(Tables(s, dir).documents, 0.8, 0.1)
        .select("doc_id", "u", "split")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, u,
             |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
             |FROM (
             |  SELECT doc_id,
             |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |           / 4294967296.0 AS u
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ANN top-k similarity join over the whole corpus (every vector gets
    // its k best banded candidates, exactly scored) — same banding as
    // x11, both directions, per-vector ranking.
    QueryDef(
      "x27_ann_topk",
      (s, dir) => Similarity.annTopK(Tables(s, dir).embeddings, 3)
        .orderBy("vec_id", "rank"),
      Some {
        val bandSelects = (0 until Similarity.AnnBands).map { b =>
          val key = (0 until Similarity.AnnBandBits).map { j =>
            val lit = Similarity.planesSqlLiteral(b * Similarity.AnnBandBits + j)
            s"CASE WHEN list_dot_product(emb, $lit) > 0 THEN ${1 << j} ELSE 0 END"
          }.mkString(" + ")
          s"SELECT vec_id, $b AS band_idx, $key AS band_key FROM e"
        }.mkString("\n  UNION ALL ")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
           |), bands AS (
           |  $bandSelects
           |), cand AS (
           |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id <> b.vec_id
           |), scored AS (
           |  SELECT c.vec_id, c.neighbor_id, list_dot_product(ea.emb, eb.emb) AS score
           |  FROM cand c
           |  JOIN e ea ON ea.vec_id = c.vec_id
           |  JOIN e eb ON eb.vec_id = c.neighbor_id
           |)
           |SELECT vec_id, rank, neighbor_id, score FROM (
           |  SELECT vec_id, neighbor_id, score,
           |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |  FROM scored) r
           |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
      }),

    // Text normalization — the cleanse-front transform (lowercase, strip
    // non-alphanumerics, collapse whitespace) plus the dropped-fraction
    // stat a quality filter keys on.
    QueryDef(
      "x28_normalize",
      (s, dir) => TextAnalysis.normalize(Tables(s, dir).documents).orderBy("doc_id"),
      Some(raw"""WITH n AS (
                |  SELECT doc_id, length(text) AS raw_chars,
                |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                |         '\s+', ' ', 'g')) AS norm_text
                |  FROM documents)
                |SELECT doc_id, norm_text, raw_chars, length(norm_text) AS norm_chars,
                |  1.0 - CAST(length(norm_text) AS DOUBLE) / greatest(raw_chars, 1) AS dropped_frac
                |FROM n ORDER BY doc_id""".stripMargin)),

    // CUBE over (lang, length-bucket): the full subtotal lattice in one
    // pass (r08 covers ROLLUP; this is the remaining grouping-set shape).
    QueryDef(
      "x29_doc_stats_cube",
      (s, dir) => Tables(s, dir).documents
        .select(col("lang"), expr("length(text) div 200").cast("long").as("len_bucket"),
          length(col("text")).as("n_chars"))
        .cube("lang", "len_bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy(col("lang").asc_nulls_first, col("len_bucket").asc_nulls_first),
      Some("""WITH d AS (
             |  SELECT lang, length(text) // 200 AS len_bucket, length(text) AS n_chars
             |  FROM documents)
             |SELECT lang, len_bucket, COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
             |FROM d GROUP BY CUBE(lang, len_bucket)
             |ORDER BY lang ASC NULLS FIRST, len_bucket ASC NULLS FIRST""".stripMargin)),

    // Per-document top-3 tf-idf terms (ratio idf — see TextAnalysis
    // scaladoc for the determinism argument).
    QueryDef(
      "x30_tfidf",
      (s, dir) => TextAnalysis.tfidfTopK(Tables(s, dir).documents, 3)
        .orderBy("doc_id", "rank"),
      Some(raw"""WITH tok AS (
                |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents
                |), tf AS (
                |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
                |), df AS (
                |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
                |), n AS (
                |  SELECT COUNT(*) AS n_docs FROM documents
                |), scored AS (
                |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
                |         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
                |  FROM tf JOIN df USING (token), n
                |)
                |SELECT doc_id, rank, token, tf, df, score FROM (
                |  SELECT doc_id, token, tf, df, score,
                |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
                |  FROM scored) r
                |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // As-of join (purchase -> latest preceding click per user): the
    // operator Spark lacks natively, in its linear union+window shape
    // (ops/AsOf). The oracle is DuckDB's NATIVE ASOF LEFT JOIN — a
    // genuinely independent implementation of the semantics.
    QueryDef(
      "x31_asof_attribution",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"))
        graft.ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
          .select(col("event_id"), col("user_id"), col("ts"), col("asof_click_ts"),
            (unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events WHERE event_type = 'purchase'
             |), c AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts
             |  FROM events WHERE event_type = 'click'
             |)
             |SELECT p.event_id, p.user_id, p.ts, c.click_ts AS asof_click_ts,
             |       epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
             |ORDER BY event_id""".stripMargin)),

    // Skew-safe salted join as a GATED query (not just a tested utility):
    // the salted plan must produce byte-identical results to the plain
    // join the oracle runs — the exact semantics-preservation contract
    // ops/Skew promises. numSalts=8 splits any hot custkey across 8
    // reducers; the aggregate re-merges.
    QueryDef(
      "x32_salted_segment_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.orders.select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val small = t.customer.select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        graft.ops.Skew.saltedJoin(big, small, Seq("custkey"), numSalts = 8)
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(
            count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("total_value"))
          .orderBy("segment")
      },
      Some(s"""SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders,
              |       ${sqlMoneySum("o.o_totalprice")} AS total_value
              |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Symmetric int8 embedding quantization + exact reconstruction-error
    // stat (see Similarity.quantize for the bit-determinism argument).
    QueryDef(
      "x33_quantize",
      (s, dir) => Similarity.quantize(Tables(s, dir).embeddings).orderBy("vec_id"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
             |), m AS (
             |  SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS mx FROM e
             |), q AS (
             |  SELECT vec_id, emb, mx, mx / 127.0 AS scale,
             |         list_transform(emb, x -> CASE WHEN mx = 0 THEN 0
             |           ELSE CAST(floor(x * 127.0 / mx + 0.5) AS INTEGER) END) AS qv
             |  FROM m
             |)
             |SELECT vec_id, scale,
             |       array_to_string(qv, ',') AS q_csv,
             |       list_max(list_transform(generate_series(1, length(emb)),
             |                i -> abs(emb[i] - qv[i] * scale))) AS max_abs_err
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Gopher-style repetition filters: duplicated-trigram fraction + top-
    // token share (degenerate/templated text detectors). Ratios of exact
    // counts — bit-deterministic cross-engine.
    QueryDef(
      "x34_repetition",
      (s, dir) => TextAnalysis.repetitionStats(Tables(s, dir).documents).orderBy("doc_id"),
      Some(raw"""WITH t AS (
                |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
                |), tri AS (
                |  SELECT doc_id,
                |         CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                |         CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
                |  FROM (
                |    SELECT doc_id,
                |           unnest(list_transform(generate_series(1, greatest(length(ts)-2, 1)),
                |                  i -> array_to_string(ts[i:i+2], ' '))) AS g
                |    FROM t) x
                |  GROUP BY 1
                |), tok AS (
                |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_count,
                |         CAST(SUM(c) AS BIGINT) AS n_tokens
                |  FROM (
                |    SELECT doc_id, tok, COUNT(*) AS c FROM (
                |      SELECT doc_id, unnest(ts) AS tok FROM t) u
                |    GROUP BY 1, 2) cc
                |  GROUP BY 1
                |)
                |SELECT tri.doc_id AS doc_id, n_trigrams, n_distinct_trigrams,
                |       1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams AS dup_trigram_frac,
                |       n_tokens, top_token_count,
                |       CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac
                |FROM tri JOIN tok ON tri.doc_id = tok.doc_id
                |ORDER BY 1""".stripMargin)),

    // SCD type-1 MERGE gated end-to-end: apply an update set (segment
    // promotions) plus an insert set (new keys) to the customer dimension
    // via ops/Upsert, then aggregate the merged table. The oracle builds
    // the identical merged relation with UNION ALL + NOT EXISTS — update
    // wins, non-updated rows retained, new keys present.
    QueryDef(
      "x35_upsert_segments",
      (s, dir) => {
        val c = Tables(s, dir).customer
        val promos = c.filter(col("c_acctbal") > 9000)
          .withColumn("c_mktsegment", lit("PLATINUM"))
        val inserts = c.filter(col("c_custkey") <= 5)
          .withColumn("c_custkey", col("c_custkey") + 10000000L)
          .withColumn("c_mktsegment", lit("SYNTH"))
        graft.ops.Upsert.upsert(c, promos.unionByName(inserts), Seq("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_customers"), moneySum(col("c_acctbal")).as("total_balance"))
          .orderBy("segment")
      },
      Some(s"""WITH updates AS (
              |  SELECT * REPLACE ('PLATINUM' AS c_mktsegment) FROM customer WHERE c_acctbal > 9000
              |  UNION ALL
              |  SELECT * REPLACE (c_custkey + 10000000 AS c_custkey, 'SYNTH' AS c_mktsegment)
              |  FROM customer WHERE c_custkey <= 5
              |), merged AS (
              |  SELECT * FROM updates
              |  UNION ALL
              |  SELECT * FROM customer c
              |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
              |)
              |SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
              |       ${sqlMoneySum("c_acctbal")} AS total_balance
              |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- multimodal ----------------------------------------------------
    QueryDef(
      "x13_multimodal_metadata",
      (s, dir) => Multimodal.metadata(Multimodal.asMedia(Tables(s, dir).documents))
        .orderBy("doc_id"),
      // DuckDB's sha256 takes VARCHAR and hashes its UTF-8 bytes — the
      // same bytes Spark's sha2(encode(text,'UTF-8'), 256) digests.
      Some("""SELECT doc_id, 'text/plain' AS media_type,
             |  octet_length(encode(text)) AS byte_len,
             |  sha256(text) AS content_sha256
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- event-stream batch analogs -----------------------------------
    QueryDef(
      "x14_events_hourly",
      (s, dir) => Tables(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          moneySum(col("value")).as("total_value"))
        .orderBy("hour"),
      Some(s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
              |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
              |  ${sqlMoneySum("value")} AS total_value
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Semi-structured props: JSON extraction over the events payload via
    // from_json with an explicit schema — ONE parse per row feeding every
    // downstream field (get_json_object re-parses per path; with a known
    // shape the schema'd parse is the 100 TB form, and Catalyst prunes
    // unreferenced fields from it).
    QueryDef(
      "x16_json_props",
      (s, dir) => Tables(s, dir).events
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             |    / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered-sequence funnel (signup -> first click AFTER signup ->
    // first purchase AFTER that click): the MATCH_RECOGNIZE-family shape
    // every product-analytics stack needs, decomposed into three
    // stage-anchored min-aggregates chained by time-bound joins — each
    // stage is one groupBy + one key join, no per-user iteration.
    QueryDef(
      "x36_funnel",
      (s, dir) => {
        val e = Tables(s, dir).events.select("user_id", "event_type", "ts")
        def firstAfter(kind: String, anchor: org.apache.spark.sql.DataFrame,
            anchorCol: String, out: String) =
          e.filter(col("event_type") === kind)
            .join(anchor, Seq("user_id"))
            .filter(col("ts") >= col(anchorCol))
            .groupBy("user_id").agg(min(col("ts")).as(out))
        val signup = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
        val click = firstAfter("click", signup, "signup_ts", "click_ts")
        val purchase = firstAfter("purchase", click, "click_ts", "purchase_ts")
        e.select("user_id").distinct()
          .join(signup, Seq("user_id"), "left")
          .join(click, Seq("user_id"), "left")
          .join(purchase, Seq("user_id"), "left")
          .withColumn("funnel_stage",
            when(col("purchase_ts").isNotNull, 3)
              .when(col("click_ts").isNotNull, 2)
              .when(col("signup_ts").isNotNull, 1)
              .otherwise(0))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
             |), s AS (
             |  SELECT user_id, MIN(ts) AS signup_ts FROM e WHERE event_type = 'signup' GROUP BY 1
             |), c AS (
             |  SELECT e.user_id, MIN(e.ts) AS click_ts
             |  FROM e JOIN s ON s.user_id = e.user_id AND e.ts >= s.signup_ts
             |  WHERE e.event_type = 'click' GROUP BY 1
             |), p AS (
             |  SELECT e.user_id, MIN(e.ts) AS purchase_ts
             |  FROM e JOIN c ON c.user_id = e.user_id AND e.ts >= c.click_ts
             |  WHERE e.event_type = 'purchase' GROUP BY 1
             |)
             |SELECT u.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
             |       CASE WHEN p.purchase_ts IS NOT NULL THEN 3
             |            WHEN c.click_ts IS NOT NULL THEN 2
             |            WHEN s.signup_ts IS NOT NULL THEN 1
             |            ELSE 0 END AS funnel_stage
             |FROM (SELECT DISTINCT user_id FROM e) u
             |LEFT JOIN s USING (user_id)
             |LEFT JOIN c USING (user_id)
             |LEFT JOIN p USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    QueryDef(
      "x15_sessionization",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        Tables(s, dir).events
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
          .withColumn("new_session",
            when(col("tus") - lag(col("tus"), 1).over(w) > 1800L * 1000000L, 1).otherwise(0))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            (sum(col("new_session")) + 1).as("n_sessions"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
             |), flg AS (
             |  SELECT user_id,
             |         CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) > 1800000000
             |              THEN 1 ELSE 0 END AS f
             |  FROM ev
             |)
             |SELECT user_id, COUNT(*) AS n_events, CAST(SUM(f) + 1 AS BIGINT) AS n_sessions
             |FROM flg GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Rank-normalized quality (the x02 composite pushed through a
    // per-source PERCENT_RANK): sources score on different absolute
    // scales, so cross-source mixing compares percentile positions, not
    // raw scores — the rank transform a curation mixer applies before
    // a global quality floor. Ties share a rank in both engines because
    // the underlying score is the bit-identical x02 expression.
    QueryDef(
      "x113_quality_rank_normalized",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("quality_score"))
        Tables(s, dir).documents
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScoreExpr.as("quality_score"))
          .withColumn("pct_rank", percent_rank().over(w))
          .orderBy("doc_id")
      },
      Some(raw"""WITH t AS (
                |  SELECT doc_id, source, text,
                |         string_split_regex(trim(text), '\s+') AS ts
                |  FROM documents
                |), q AS (
                |  SELECT doc_id, source,
                |    0.4 * (CAST(length(list_filter(ts, x -> x IN ($stopList))) AS DOUBLE) / length(ts)) +
                |    0.3 * (1.0 - CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / greatest(length(text), 1)) +
                |    0.3 * least(1.0, CAST(length(ts) AS DOUBLE) / 100.0) AS quality_score
                |  FROM t
                |)
                |SELECT doc_id, source, quality_score,
                |       PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality_score) AS pct_rank
                |FROM q ORDER BY doc_id""".stripMargin)),

    // MinHash calibration curve (Dedup.minhashCalibration): mean EXACT
    // Jaccard per estimated-match count over every banded candidate —
    // the x89-style sketch-quality evaluation for the MinHash family,
    // under the same oracle gate as the sketch itself.
    QueryDef(
      "x114_minhash_calibration",
      (s, dir) => Dedup.minhashCalibration(Tables(s, dir).documents)
        .orderBy("est_matches"),
      Some {
        val estExpr = (0 until Dedup.MinHashK)
          .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""$ShingleCtes $SigCte, bands AS (
           |  $MinHashBandUnionSql
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
           |), sizes AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1
           |), inter AS (
           |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
           |  FROM cand c
           |  JOIN sh ha ON ha.doc_id = c.doc_a
           |  JOIN sh hb ON hb.doc_id = c.doc_b AND hb.shingle = ha.shingle
           |  GROUP BY 1, 2
           |), pairs AS (
           |  SELECT CAST($estExpr AS BIGINT) AS est_matches,
           |         (1000000000 * COALESCE(it.i, 0))
           |           // (na.n + nb.n - COALESCE(it.i, 0)) AS jaccard_fp
           |  FROM cand c
           |  LEFT JOIN inter it ON it.doc_a = c.doc_a AND it.doc_b = c.doc_b
           |  JOIN sizes na ON na.doc_id = c.doc_a
           |  JOIN sizes nb ON nb.doc_id = c.doc_b
           |  JOIN sig sa ON sa.doc_id = c.doc_a
           |  JOIN sig sb ON sb.doc_id = c.doc_b
           |)
           |SELECT est_matches, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |       CAST(SUM(jaccard_fp) AS BIGINT) AS sum_jaccard_fp,
           |       CAST(SUM(jaccard_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1.0E9
           |         AS mean_jaccard
           |FROM pairs GROUP BY 1 ORDER BY est_matches""".stripMargin
      }),

    // Blocking-quality evaluation (Dedup.blockingQuality): pairs
    // completeness + reduction ratio of the LSH band scheme against
    // exact-Jaccard ground truth at 1/2 — x114 judges the estimator on
    // surfaced candidates, this judges what the blocking never surfaces.
    // bench=false (round-10 directive): its cost IS the uncapped exact
    // common-shingle truth, which made it the chronic contention-noise
    // source of every round's mover list (adjudicated band 8-30 s at
    // sf0.1). The benched path is now x211's sampled-truth estimate;
    // this exact evaluator stays oracle-gated and timed in
    // bench_diag.json with the other ground-truth diagnostics.
    QueryDef(
      "x162_blocking_quality",
      (s, dir) => Dedup.blockingQuality(Tables(s, dir).documents),
      Some {
        s"""$ShingleCtes $SigCte, bands AS (
           |  $MinHashBandUnionSql
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
           |), sizes AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1
           |), tp AS (
           |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
           |  FROM sh sa JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
           |  GROUP BY 1, 2
           |), truep AS (
           |  SELECT t.doc_a, t.doc_b
           |  FROM tp t JOIN sizes na ON na.doc_id = t.doc_a
           |            JOIN sizes nb ON nb.doc_id = t.doc_b
           |  WHERE t.inter * 2 >= (na.n + nb.n - t.inter) * 1
           |), caught AS (
           |  SELECT doc_a, doc_b FROM truep
           |  INTERSECT SELECT doc_a, doc_b FROM cand
           |), stats AS (
           |  SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents) AS n_docs,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM truep) AS n_true,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM caught) AS n_caught
           |)
           |SELECT n_docs, n_true, n_cand, n_caught,
           |       CASE WHEN n_true > 0
           |            THEN CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE) END
           |         AS pairs_completeness,
           |       1.0 - (CAST(n_cand AS DOUBLE) * 2.0)
           |         / (CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE))
           |         AS reduction_ratio
           |FROM stats""".stripMargin
      },
      bench = false),

    // Sampled-truth blocking quality (Dedup.blockingQualitySampled) —
    // the BENCHED sibling of x162: exact ground truth AND the banded
    // candidate set both restricted to a deterministic stratified md5
    // sample with a FIXED budget (64 docs/source — a fixed-RATE sample
    // still grew quadratically under the 10x duplication probe,
    // exponent 1.22; the fixed budget pins evaluation cost regardless
    // of corpus size), with a 95% CI on the completeness estimate so
    // the sampling error is part of the output contract. Candidate
    // membership of a sampled pair depends only on the two docs' own
    // signatures, so the caught/missed judgment is bit-identical to the
    // full evaluator's — only the judged-pair population is sampled.
    // SketchGovernanceSpec pins the degenerate-sample law (budget >=
    // corpus -> estimator == exact) and CI containment at a small cap.
    QueryDef(
      "x211_blocking_quality_sampled",
      (s, dir) => Dedup.blockingQualitySampled(Tables(s, dir).documents),
      Some {
        val bandUnion = (0 until Dedup.NumBands)
          .map(b => s"SELECT doc_id, $b AS band_idx, ${bandExpr(b)} AS band_key FROM sigs_s")
          .mkString("\n  UNION ALL ")
        s"""$ShingleCtes $SigCte, samp AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id,
           |           ROW_NUMBER() OVER (PARTITION BY source
           |             ORDER BY CAST(('0x' || substring(md5('bqs_' || doc_id), 1, 8)) AS BIGINT),
           |                      doc_id) AS srn
           |    FROM documents) t
           |  WHERE srn <= 64
           |), sigs_s AS (
           |  SELECT sig.* FROM sig JOIN samp USING (doc_id)
           |), bands AS (
           |  $bandUnion
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
           |), shs AS (
           |  SELECT sh.doc_id, sh.shingle FROM sh JOIN samp USING (doc_id)
           |), sizes AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shs GROUP BY 1
           |), tp AS (
           |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
           |  FROM shs sa JOIN shs sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
           |  GROUP BY 1, 2
           |), truep AS (
           |  SELECT t.doc_a, t.doc_b
           |  FROM tp t JOIN sizes na ON na.doc_id = t.doc_a
           |            JOIN sizes nb ON nb.doc_id = t.doc_b
           |  WHERE t.inter * 2 >= (na.n + nb.n - t.inter) * 1
           |), caught AS (
           |  SELECT doc_a, doc_b FROM truep
           |  INTERSECT SELECT doc_a, doc_b FROM cand
           |), stats AS (
           |  SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents) AS n_docs,
           |         (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM samp) AS n_docs_sampled,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM truep) AS n_true_s,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand_s,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM caught) AS n_caught_s
           |), est AS (
           |  SELECT *,
           |         CAST(n_caught_s AS DOUBLE) / CAST(n_true_s AS DOUBLE) AS p,
           |         CAST(n_true_s AS DOUBLE) AS nd
           |  FROM stats
           |), wil AS (
           |  SELECT *,
           |         (p + 3.8416 / (2.0 * nd)) / (1.0 + 3.8416 / nd) AS center,
           |         1.96 * sqrt(p * (1.0 - p) / nd + 3.8416 / (4.0 * nd * nd))
           |           / (1.0 + 3.8416 / nd) AS hw
           |  FROM est
           |)
           |SELECT n_docs, n_docs_sampled, n_true_s, n_cand_s, n_caught_s,
           |       CASE WHEN n_true_s > 0 THEN p END AS completeness_est,
           |       CASE WHEN n_true_s > 0 THEN greatest(least(center - hw, p), 0.0) END AS ci95_low,
           |       CASE WHEN n_true_s > 0 THEN least(greatest(center + hw, p), 1.0) END AS ci95_high,
           |       1.0 - (CAST(n_cand_s AS DOUBLE) * 2.0)
           |         / (CAST(n_docs_sampled AS DOUBLE) * CAST(n_docs_sampled - 1 AS DOUBLE))
           |         AS reduction_ratio_est
           |FROM wil""".stripMargin
      }),

    // Exact-substring removal (Dedup.exactSubstringRemoval — Lee et al.
    // 2022's ExactSubstr dedup): every duplicated 8-token span is
    // REMOVED from all but its globally-first occurrence; x72 measures
    // this duplication, x213 performs the edit. Merged removal spans +
    // a per-doc sweep line (never a token x span containment join);
    // the oracle replays grams -> first-occurrence keys -> marked spans
    // -> island merge -> sweep -> the md5 of the surviving tokens.
    // Giant docs (>= 2^20 tokens, the per-doc-window boundedness cap)
    // PASS THROUGH unedited with skipped=true (round-12 fix: they used
    // to vanish from the output; every input doc now appears exactly
    // once — ExtSpec pins it with a tiny-cap planted giant), but their
    // content still COUNTS as duplication evidence: the gram scan runs
    // over all docs, only the sort-window edit is capped.
    QueryDef(
      "x213_exact_substring_removal",
      (s, dir) => Dedup.exactSubstringRemoval(Tables(s, dir).documents)
        .orderBy("doc_id"),
      Some(
        raw"""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
             |), tl0 AS (
             |  SELECT doc_id, ts, len(ts) AS n FROM tok
             |), tl AS (
             |  SELECT * FROM tl0 WHERE n < 1048576
             |), g AS (
             |  SELECT doc_id, t.i AS pos,
             |         md5(array_to_string(ts[t.i:t.i+7], ' ')) AS g, n
             |  FROM tl0, unnest(generate_series(1, tl0.n - 7)) AS t(i)
             |  WHERE n >= 8
             |), own AS (
             |  SELECT g, MIN(doc_id) AS fdoc, COUNT(*) AS occ
             |  FROM g GROUP BY 1
             |), fpos AS (
             |  SELECT g.g, MIN(g.pos) AS fpos
             |  FROM g JOIN own USING (g) WHERE g.doc_id = own.fdoc
             |  GROUP BY 1
             |), mark AS (
             |  SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e
             |  FROM g JOIN own USING (g) JOIN fpos USING (g)
             |  WHERE occ >= 2 AND g.n < 1048576
             |    AND NOT (g.doc_id = own.fdoc AND g.pos = fpos.fpos)
             |), isl0 AS (
             |  SELECT doc_id, s, e,
             |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
             |  FROM mark
             |), isl1 AS (
             |  SELECT doc_id, s, e,
             |         CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END AS ni
             |  FROM isl0
             |), isl2 AS (
             |  SELECT doc_id, s, e,
             |         SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e
             |           ROWS UNBOUNDED PRECEDING) AS island
             |  FROM isl1
             |), isl AS (
             |  SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
             |  FROM isl2 GROUP BY 1, 2
             |), bounds AS (
             |  SELECT doc_id, s AS pos, 0 AS typ, 1 AS delta, NULL AS tok FROM isl
             |  UNION ALL
             |  SELECT doc_id, e + 1, 0, -1, NULL FROM isl
             |), tokr AS (
             |  SELECT doc_id, t.i AS pos, 1 AS typ, 0 AS delta, ts[t.i] AS tok
             |  FROM tl, unnest(generate_series(1, tl.n)) AS t(i)
             |), sw AS (
             |  SELECT doc_id, pos, typ, tok,
             |         SUM(delta) OVER (PARTITION BY doc_id ORDER BY pos, typ
             |           ROWS UNBOUNDED PRECEDING) AS cov
             |  FROM (SELECT * FROM bounds UNION ALL SELECT * FROM tokr) u
             |), keptt AS (
             |  SELECT doc_id, pos, tok FROM sw WHERE typ = 1 AND cov = 0
             |), k AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |         md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_hash
             |  FROM keptt GROUP BY 1
             |), spans AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM isl GROUP BY 1
             |)
             |SELECT * FROM (
             |  SELECT tl.doc_id, CAST(tl.n AS BIGINT) AS n_tokens,
             |         CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
             |         CAST(tl.n - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
             |         CAST(COALESCE(spans.n_spans, 0) AS BIGINT) AS n_spans,
             |         k.cleaned_hash, FALSE AS skipped
             |  FROM tl
             |  LEFT JOIN k ON k.doc_id = tl.doc_id
             |  LEFT JOIN spans ON spans.doc_id = tl.doc_id
             |  UNION ALL
             |  SELECT doc_id, CAST(n AS BIGINT), CAST(n AS BIGINT),
             |         CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |         CAST(NULL AS VARCHAR), TRUE
             |  FROM tl0 WHERE n >= 1048576
             |) ORDER BY doc_id""".stripMargin)),

    // Winnowing fingerprint pairs (Dedup.winnowedPairs — Schleimer et al.
    // 2003): document pairs electing >= 2 common windowed-min gram hashes.
    // The (min hash, rightmost tie) election rides one BIGINT min over
    // the encoded key h*2^20 + (2^20-1-pos), so both engines replay the
    // window identically.
    QueryDef(
      "x167_winnowing_pairs",
      (s, dir) => Dedup.winnowedPairs(Tables(s, dir).documents)
        .orderBy("doc_a", "doc_b"),
      Some(
        raw"""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
             |), base AS (
             |  SELECT doc_id, ts, least(len(ts) - 4, 1048575) AS g FROM tok
             |  WHERE len(ts) - 4 >= 4
             |), grams AS (
             |  SELECT doc_id, g, t.i AS pos,
             |         CAST(('0x' || substring(md5(array_to_string(ts[t.i:t.i+4], ' ')), 1, 8))
             |           AS BIGINT) AS h
             |  FROM base, unnest(generate_series(1, base.g)) AS t(i)
             |), win AS (
             |  SELECT doc_id, g, pos,
             |         MIN(h * 1048576 + (1048575 - pos)) OVER (
             |           PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
             |  FROM grams
             |), fps AS (
             |  SELECT DISTINCT doc_id, sel // 1048576 AS h
             |  FROM win WHERE pos <= g - 3
             |)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(COUNT(*) AS BIGINT) AS n_shared
             |FROM fps a JOIN fps b ON b.h = a.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Zipf fit per source (TextAnalysis.zipfSlopeBySource): log-log OLS
    // slope + r² of the top-100 token frequencies — exact counts, ln on a
    // 1e-6 fixed-point grid, BIGINT sums, one double expression each.
    QueryDef(
      "x169_zipf_slope",
      (s, dir) => TextAnalysis.zipfSlopeBySource(Tables(s, dir).documents)
        .orderBy("source"),
      Some(
        raw"""WITH tok AS (
             |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
             |  FROM documents
             |), counts AS (
             |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM tok GROUP BY 1, 2
             |), ranked AS (
             |  SELECT source, c,
             |         ROW_NUMBER() OVER (PARTITION BY source
             |                            ORDER BY c DESC, token ASC) AS rank
             |  FROM counts QUALIFY rank <= 100
             |), fp AS (
             |  SELECT source,
             |         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS xf,
             |         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS yf
             |  FROM ranked
             |), s AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(xf) AS BIGINT) AS sx, CAST(SUM(yf) AS BIGINT) AS sy,
             |         CAST(SUM(xf * xf) AS BIGINT) AS sxx,
             |         CAST(SUM(xf * yf) AS BIGINT) AS sxy,
             |         CAST(SUM(yf * yf) AS BIGINT) AS syy
             |  FROM fp GROUP BY 1
             |)
             |SELECT source, n AS n_ranks,
             |       CAST(n * sxy - sx * sy AS DOUBLE)
             |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             |       CASE WHEN n * syy - sy * sy <> 0 THEN
             |         CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
             |           / (CAST(n * sxx - sx * sx AS DOUBLE)
             |              * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
             |FROM s WHERE n >= 2 ORDER BY source""".stripMargin)),

    // Leakage-safe split (Pipeline.leakageSafeSplit): the split draw
    // hashes the near-dup CLUSTER id, so template families never
    // straddle train and test — contamination prevented at split time
    // rather than audited after (x67). The oracle extends x22's
    // recursive-CTE components with the salted-uniform threshold CASE.
    QueryDef(
      "x115_leakage_safe_split",
      (s, dir) => graft.ext.Pipeline.leakageSafeSplit(Tables(s, dir).documents, 0.3, 0.8, 0.1)
        .orderBy("doc_id"),
      Some {
        val base = s"""$ShingleCtes $SigCte${lshCandCtes()}$ClusterCtes, clusters AS (
           |  SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1
           |), uni AS (
           |  SELECT doc_id, cluster,
           |         CAST(('0x' || substring(md5('leak|' || CAST(cluster AS VARCHAR)), 1, 8)) AS BIGINT)
           |           / 4294967296.0 AS u
           |  FROM clusters
           |)
           |SELECT doc_id, cluster, u,
           |       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
           |FROM uni ORDER BY doc_id""".stripMargin
        "WITH RECURSIVE" + base.stripPrefix("WITH")
      },
      bench = false), // shares x22's iterative cluster loop; gated at sf0.01

    // Cross-source duplication matrix: the capped-LSH near-dup pairs
    // (x66's scale path) rolled up by canonical source pair — which
    // corpus slices copy from each other, the provenance diagnostic
    // that decides who gets deduped against whom at ingest. Two hash
    // joins onto a pair set the banding already bounded, one small
    // aggregate.
    QueryDef(
      "x117_source_dedup_matrix",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val src = docs.select(col("doc_id"), col("source"))
        Dedup.lshDedupPairs(docs, 0.3, bucketCap = LshBucketCap)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some {
        s"""$ShingleCtes $SigCte, bands AS (
           |  $MinHashBandUnionSql
           |), kept AS (
           |  SELECT doc_id, band_idx, band_key FROM bands
           |  QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_key) <= $LshBucketCap
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM kept a JOIN kept b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
           |), sizes AS (
           |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
           |), inter AS (
           |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
           |  FROM cand c
           |  JOIN sh sa ON sa.doc_id = c.doc_a
           |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
           |  GROUP BY 1, 2
           |), dup AS (
           |  SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
           |    FROM inter
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b) j
           |  WHERE jaccard >= 0.3
           |)
           |SELECT least(da.source, db.source) AS source_a,
           |       greatest(da.source, db.source) AS source_b,
           |       CAST(COUNT(*) AS BIGINT) AS n_pairs
           |FROM dup p
           |JOIN documents da ON da.doc_id = p.doc_a
           |JOIN documents db ON db.doc_id = p.doc_b
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // Ingest-time dedup screening — the production flow every corpus
    // update runs: an INCOMING batch (doc_id >= 250 here) is screened
    // against the EXISTING corpus (doc_id < 250), first by exact
    // content hash (one semi-join on the hash), then by shingle-set
    // Jaccard >= 3/10 through the incoming×existing inverted index
    // (integer cross-multiplied, never a double compare). Each incoming
    // doc reports both flags and the admit decision. bench=false: the
    // inverted-index screen shares x09's degeneracy on this templated
    // corpus (at scale the LSH-banded variant replaces it, same
    // decision contract).
    QueryDef(
      "x120_ingest_dedup",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val inDocs = docs.filter(col("doc_id") >= 250).select(col("doc_id"), col("text"))
        val exHash = docs.filter(col("doc_id") < 250)
          .select(md5(col("text").cast("binary")).as("chash")).distinct()
        val exact = inDocs
          .select(col("doc_id"), md5(col("text").cast("binary")).as("chash"))
          .join(exHash, Seq("chash"), "left_semi")
          .select(col("doc_id")).withColumn("is_exact_dup", lit(true))
        val sh = Dedup.shingles(docs)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val near = sh.filter(col("doc_id") >= 250).withColumnRenamed("doc_id", "in_id")
          .join(sh.filter(col("doc_id") < 250).withColumnRenamed("doc_id", "ex_id"), Seq("shingle"))
          .groupBy(col("in_id"), col("ex_id")).agg(count(lit(1)).as("i"))
          .join(sizes.select(col("doc_id").as("in_id"), col("n").as("na")), Seq("in_id"))
          .join(sizes.select(col("doc_id").as("ex_id"), col("n").as("nb")), Seq("ex_id"))
          .filter(col("i") * lit(10L) >= (col("na") + col("nb") - col("i")) * lit(3L))
          .select(col("in_id").as("doc_id")).distinct()
          .withColumn("is_near_dup", lit(true))
        inDocs.select(col("doc_id"))
          .join(exact, Seq("doc_id"), "left")
          .join(near, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("is_exact_dup"), lit(false)).as("is_exact_dup"),
            coalesce(col("is_near_dup"), lit(false)).as("is_near_dup"),
            (!coalesce(col("is_exact_dup"), lit(false)) &&
              !coalesce(col("is_near_dup"), lit(false))).as("admitted"))
          .orderBy("doc_id")
      },
      Some(s"""$ShingleCtes, sizes AS (
              |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
              |), exact AS (
              |  SELECT DISTINCT i.doc_id
              |  FROM documents i JOIN documents e
              |    ON i.doc_id >= 250 AND e.doc_id < 250 AND md5(i.text) = md5(e.text)
              |), near AS (
              |  SELECT DISTINCT t.in_id AS doc_id FROM (
              |    SELECT a.doc_id AS in_id, b.doc_id AS ex_id, COUNT(*) AS i
              |    FROM sh a JOIN sh b ON a.shingle = b.shingle
              |      AND a.doc_id >= 250 AND b.doc_id < 250
              |    GROUP BY 1, 2) t
              |  JOIN sizes na ON na.doc_id = t.in_id
              |  JOIN sizes nb ON nb.doc_id = t.ex_id
              |  WHERE t.i * 10 >= (na.n + nb.n - t.i) * 3
              |)
              |SELECT d.doc_id,
              |       (e.doc_id IS NOT NULL) AS is_exact_dup,
              |       (n.doc_id IS NOT NULL) AS is_near_dup,
              |       (e.doc_id IS NULL AND n.doc_id IS NULL) AS admitted
              |FROM documents d
              |LEFT JOIN exact e ON e.doc_id = d.doc_id
              |LEFT JOIN near n ON n.doc_id = d.doc_id
              |WHERE d.doc_id >= 250
              |ORDER BY d.doc_id""".stripMargin),
      bench = false)
  )
}
