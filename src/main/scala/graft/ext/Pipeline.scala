package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators: deterministic splitting and sampling — the
  * bookkeeping half of a training-data pipeline. Everything is a pure
  * projection of a content-stable hash, so assignments are reproducible
  * run-to-run, survive repartitioning, and never reshuffle existing rows
  * when new data arrives (the property `randomSplit`'s seed-per-partition
  * sampling does NOT have).
  */
object Pipeline {

  /** Uniform in [0,1): the first 8 hex digits of md5(id) as a 32-bit
    * integer over 2^32. Division by a power of two is exact in IEEE
    * double, so the value — and every threshold comparison on it — is
    * bit-identical in any engine that can md5 a string.
    */
  private def hashUniform(id: Column): Column = saltedUniform(id, "")

  /** [[hashUniform]] with a salt prefix, so independent sampling decisions
    * (split vs subsample vs stratified sample) draw from independent
    * hash streams over the same ids.
    */
  def saltedUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic train/val/test split by id hash: train < trainFrac <=
    * val < trainFrac+valFrac <= test. Stable under corpus growth —
    * adding documents never moves an existing one between splits. All
    * input columns ride along (this ANNOTATES the corpus; filtering on
    * `split` is the select-a-partition action, symmetric with
    * [[sampleByHash]]).
    */
  def trainSplit(docs: DataFrame, trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      "fractions must leave room for a test split")
    require(!docs.columns.contains("u") && !docs.columns.contains("split"),
      "columns 'u'/'split' are reserved by trainSplit (withColumn would clobber them)")
    docs.withColumn("u", hashUniform(col("doc_id")))
      .withColumn("split",
        when(col("u") < trainFrac, "train")
          .when(col("u") < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: the split uniform is drawn from
    * the near-duplicate CLUSTER id (the component's min doc_id, from
    * [[Dedup.duplicateClusters]]), so every member of a near-dup family
    * lands in the SAME split — [[trainSplit]]'s per-document draw lets a
    * template's variants straddle train and test, which inflates eval
    * (the train/test contamination x67 detects, prevented at split time
    * instead of audited after). Salted independently of every other
    * sampling decision; stable under corpus growth as long as cluster
    * membership is.
    */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.3,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      "fractions must leave room for a test split")
    Dedup.duplicateClusters(docs, threshold)
      .select(col("doc_id"), col("cluster"))
      .withColumn("u", saltedUniform(col("cluster"), "leak|"))
      .withColumn("split",
        when(col("u") < trainFrac, "train")
          .when(col("u") < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  /** Deterministic Bernoulli sample: keep rows whose id-hash uniform
    * falls below `fraction` — the same primitive as [[trainSplit]] with
    * one threshold, usable as a reproducible corpus subsample.
    */
  def sampleByHash(docs: DataFrame, fraction: Double): DataFrame =
    docs.filter(hashUniform(col("doc_id")) < fraction)

  /** Stratified deterministic sampling: keep a row iff its salted id-hash
    * uniform falls below the row's per-stratum rate (any Column
    * expression — typically a CASE over the stratum). The LLM-data use is
    * source/language rebalancing: downsample over-represented strata at
    * fixed, reproducible rates instead of `sampleBy`'s seed-dependent
    * draw. One codegen'd filter over the scan — no shuffle, no state.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, rate: Column,
      salt: String = "strat|"): DataFrame = {
    require(!docs.columns.contains("u"),
      "column 'u' is reserved by stratifiedSample (withColumn would clobber it)")
    docs.withColumn("u", saltedUniform(col(idCol), salt)).filter(col("u") < rate)
  }

  /** Temperature-based source mixing (the multilingual/source-rebalance
    * move of LLM corpus assembly, temperature α = 0.5 via sqrt — chosen
    * over pow() because sqrt is exactly-rounded IEEE in every engine):
    * sampling weight w_s = sqrt(count_s), a target sample size T
    * distributed ∝ w, per-source keep rate min(1, T·w_s / (wsum·c_s)).
    * The rate snaps to a 1e-9 grid (floor(x·1e9 + 0.5)/1e9) so the ±ulp
    * summation-order noise in wsum vanishes cross-engine; kept rows are
    * chosen by the salted id-hash uniform, so the sample is reproducible
    * and stable under reshuffling. Relative to proportional sampling the
    * sqrt temperature upsamples rare sources — the point of the op.
    *
    * Plan shape: one small aggregate (source cardinality), broadcast of
    * the rate table, one codegen'd filter over the corpus scan — no
    * corpus shuffle.
    */
  def temperatureMix(docs: DataFrame, targetSize: Long,
      salt: String = "mix|"): DataFrame = {
    require(targetSize > 0, "targetSize must be positive")
    def snap9(x: Column): Column = floor(x * lit(1e9) + lit(0.5)) / lit(1e9)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("c"))
    val weighted = counts.withColumn("w", sqrt(col("c")))
    val wsum = weighted.agg(sum(col("w")).as("wsum"))
    val rates = weighted.crossJoin(broadcast(wsum))
      .withColumn("rate", snap9(least(lit(1.0),
        lit(targetSize.toDouble) * col("w") / (col("wsum") * col("c")))))
      .select("source", "rate")
    // Annotate-and-keep like trainSplit/sampleByHash: every input column
    // rides along plus the stratum's rate — no re-join needed to recover
    // the text of the sampled corpus.
    docs.join(broadcast(rates), "source")
      .filter(saltedUniform(col("doc_id"), salt) < col("rate"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis 2006
    * (the A-ES scheme, exponential-race form): each row draws the key
    * −ln(u)/w from its deterministic id-hash uniform u and weight w, and
    * the k SMALLEST keys win. Each row's inclusion probability is
    * proportional to its weight at every prefix, which is what
    * quality-weighted corpus selection needs: sample hard toward
    * high-quality documents while keeping a reproducible, seed-free draw
    * (same contract as every sampler here — no RNG state, stable under
    * file order and repartitioning).
    *
    * Determinism: u = (hash + 0.5)/2^32 is strictly inside (0,1) (the
    * +0.5 keeps ln finite even on an all-zero hash prefix) and exact in
    * IEEE doubles; the key snaps to the 1e-9 grid as a fixed-point
    * BIGINT, ties break on doc_id, so the selection replays bit-exactly
    * in any engine that can md5. Zero/negative weights are excluded
    * (limit of w→0 is never-sampled, the A-ES convention).
    *
    * Scale shape: one codegen'd projection + a global top-k, which Spark
    * executes as TakeOrderedAndProject — per-partition heaps of k rows
    * merged on the driver, no global sort, no shuffle of the corpus.
    */
  def weightedSample(docs: DataFrame, weight: Column, k: Int,
      salt: String = "wsamp|"): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    docs.select(col("doc_id"), weight.as("w"))
      .filter(col("w") > 0)
      .withColumn("es_key_fp",
        floor((-log(u) / col("w")) * lit(1e9) + lit(0.5)).cast("long"))
      .orderBy(col("es_key_fp").asc, col("doc_id").asc)
      .limit(k)
  }

  /** [[weightedSample]] per group — the quality-weighted version of
    * [[sourceQuota]]: keep the k best-drawn documents of EACH source,
    * where the draw is the same A-ES exponential race (so within a
    * source, inclusion probability is weight-proportional) instead of
    * the quota's uniform hash rank. One window per group, parallel
    * across groups — the global-top-k heap becomes a per-source
    * rank, everything else (key snapping, tie-breaks, zero-weight
    * exclusion, seed-free determinism) is [[weightedSample]]'s
    * contract unchanged.
    */
  def weightedSamplePerGroup(docs: DataFrame, groupCol: String, weight: Column,
      k: Int, salt: String = "wsamp|"): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("es_key_fp").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col(groupCol), weight.as("w"))
      .filter(col("w") > 0)
      .withColumn("es_key_fp",
        floor((-log(u) / col("w")) * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= k)
  }

  /** Per-source quota cap — the third mixing primitive beside
    * [[stratifiedSample]] (rate per stratum) and [[temperatureMix]]
    * (rate from counts): keep AT MOST `quota` documents per source,
    * chosen by salted id-hash rank so the kept subset is uniform,
    * reproducible, and stable under file order and repartitioning
    * (ingestion-order rank would bias toward old data). Emits
    * `quota_rank` (1-based within source) for auditability.
    *
    * Scale shape: one window per source — parallel across sources. A
    * mega-source that dwarfs its siblings makes that source's sort wide;
    * at that scale flip to the O(1)-state spelling: keep rows with
    * saltedUniform < quota/count_s (a broadcast rate join like
    * [[temperatureMix]]), which holds the quota in expectation instead
    * of exactly. Exact rank is the right default: training mixtures are
    * usually specified as hard caps.
    */
  def sourceQuota(docs: DataFrame, quota: Int, salt: String = "quota|"): DataFrame = {
    require(quota > 0, "quota must be positive")
    require(!docs.columns.contains("quota_rank"),
      "column 'quota_rank' is reserved by sourceQuota")
    val w = Window.partitionBy(col("source"))
      .orderBy(saltedUniform(col("doc_id"), salt), col("doc_id"))
    docs.withColumn("quota_rank", row_number().over(w).cast("long"))
      .filter(col("quota_rank") <= quota)
  }

  /** End-to-end corpus curation — the composition the pipeline operators
    * exist for, as ONE declarative plan a 100 TB run submits whole:
    *
    *   1. score quality inline ([[TextAnalysis.qualityScoreExpr]]);
    *   2. exact-dedup to the min-id canonical per content hash;
    *   3. drop documents below `minQuality`;
    *   4. cap every source at `quota` ([[sourceQuota]]'s hash rank);
    *   5. annotate the deterministic train/val/test split.
    *
    * Shape: two windows (content hash, then source — each hash-
    * partitioned and parallel) plus codegen'd projections/filters. No
    * self-joins: every document's fate is decided from its own row and
    * two windowed aggregates, so the plan is two shuffles of the
    * surviving rows end to end. Filters run in dependency order (dedup
    * before quota, quota before split) so each stage sees only
    * survivors; everything downstream of the scan is reproducible
    * row-for-row (hash ranks, hash splits — no seeds, no time).
    */
  def curate(docs: DataFrame, minQuality: Double = 0.5, quota: Int = 15,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(!docs.columns.contains("quality_score") && !docs.columns.contains("is_canonical"),
      "columns 'quality_score'/'is_canonical' are reserved by curate")
    val w = Window.partitionBy(md5(col("text").cast("binary")))
    val survivors = docs
      .withColumn("quality_score", TextAnalysis.qualityScoreExpr)
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
      .filter(col("is_canonical") && col("quality_score") >= minQuality)
      // Shed the text (and every other wide ride-along) BEFORE the quota
      // window: the second shuffle moves only the three narrow columns
      // the output needs, not multi-KB payloads.
      .select("doc_id", "source", "quality_score")
    trainSplit(sourceQuota(survivors, quota), trainFrac, valFrac)
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("quota_rank"), col("split"))
  }

  /** Split each document into token windows of `chunkSize` tokens every
    * `stride` tokens (overlapping when stride < chunkSize) — the
    * context-window chunking step of a RAG / training pipeline. Start
    * positions are 1, 1+stride, ... while <= token count, so trailing
    * windows may be short; every token is covered iff stride <=
    * chunkSize (stride > chunkSize is the spaced-sample-windows mode and
    * deliberately skips the tokens between windows). Pure explode +
    * array-slice projection: linear, no shuffle.
    */
  def chunk(docs: DataFrame, chunkSize: Int = 40, stride: Int = 30): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), greatest(size(col("ts")), lit(1)), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        expr(s"CAST((start - 1) DIV $stride AS BIGINT)").as("chunk_idx"),
        array_join(slice(col("ts"), col("start"), lit(chunkSize)), " ").as("chunk_text"),
        size(slice(col("ts"), col("start"), lit(chunkSize))).cast("long").as("n_tokens"))
  }

  /** Passage-level exact dedup with REASSEMBLY — the C4/Dolma-style
    * cleaning step that removes repeated spans while keeping the rest of
    * each document: split every document into consecutive non-overlapping
    * `chunkSize`-token chunks ([[chunk]] with stride = size), keep only
    * the globally-FIRST occurrence of each distinct chunk text (first =
    * minimum (doc_id, chunk_idx), so the decision is deterministic and
    * position-stable under reruns), and rebuild each document from its
    * surviving chunks in order. Returns per document the chunk counts
    * and the cleaned text ("" when everything was a repeat).
    *
    * This is the REMOVAL twin of the x72 duplicate-gram COVERAGE metric:
    * x72 measures how much of a corpus is duplicated span-wise; this op
    * produces the corpus with those spans deduplicated.
    *
    * Scale shape: one window keyed by chunk text (hash-partitioned on
    * the chunk — the dedup shuffle), one per-document aggregate to
    * reassemble; no doc×doc comparison anywhere. The reassembly list is
    * bounded by the document's own length.
    */
  def dedupChunks(docs: DataFrame, chunkSize: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("chunk_text"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
    chunk(docs, chunkSize, chunkSize)
      .withColumn("is_first", row_number().over(w) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("is_first"),
              struct(col("chunk_idx"), col("chunk_text"))))),
            x => x.getField("chunk_text")),
          " ").as("cleaned_text"))
  }

  /** Distribution-matching resampler: acceptance-sample every source so
    * its length histogram matches a REFERENCE source's — the curation
    * move of reshaping bulk scrape toward a high-quality corpus's shape
    * (importance resampling with acceptance rate min(1, p_ref/p_src) per
    * bucket; Rubin 1987's SIR scheme on a histogram grid).
    *
    * Determinism: the acceptance uniform is the salted md5 hash of
    * doc_id ([[saltedUniform]] — reproducible across runs, engines, and
    * corpus growth); the rate is a ratio of exact BIGINT bucket counts
    * evaluated in double, identical IEEE in both engines.
    *
    * Scale shape: two histogram aggregates (source×bucket and the
    * broadcast-size reference histogram — buckets are bounded, sources
    * are bounded), one broadcast join of rates back onto the corpus, one
    * codegen'd threshold comparison per row. No shuffle of the corpus
    * beyond the histogram's map-side-combinable counts.
    */
  def distributionMatch(docs: DataFrame, refSource: String,
      bucketChars: Int = 100): DataFrame = {
    require(bucketChars > 0, "bucketChars must be positive")
    val bucket = expr(s"length(text) DIV $bucketChars").cast("long").as("len_bucket")
    val bucketed = docs.select(col("doc_id"), col("source"), bucket)
    val srcHist = bucketed.groupBy("source", "len_bucket")
      .agg(count(lit(1)).as("n_docs"))
    val srcTot = bucketed.groupBy("source").agg(count(lit(1)).as("n_src"))
    val refHist = bucketed.filter(col("source") === refSource)
      .groupBy("len_bucket").agg(count(lit(1)).as("n_ref"))
    val refTot = bucketed.filter(col("source") === refSource)
      .agg(count(lit(1)).as("n_ref_tot"))
    val rates = srcHist
      .join(broadcast(srcTot), Seq("source"))
      .join(broadcast(refHist), Seq("len_bucket"), "left")
      .crossJoin(broadcast(refTot))
      .select(col("source"), col("len_bucket"), col("n_docs"),
        // A missing/misnamed reference must FAIL, not silently keep
        // everything: with n_ref_tot = 0 the ratio is 0/0 = NaN and
        // least(1.0, NaN) = 1.0 (Spark orders NaN greatest), so every
        // bucket would report a clean-looking accept_rate of 1.0.
        when(col("n_ref_tot") > 0,
          least(lit(1.0),
            (coalesce(col("n_ref"), lit(0L)).cast("double") / col("n_ref_tot")) /
              (col("n_docs").cast("double") / col("n_src"))))
          .otherwise(raise_error(lit(
            s"distributionMatch: reference source '$refSource' matched no rows")))
          .as("accept_rate"))
    bucketed
      .join(broadcast(rates), Seq("source", "len_bucket"))
      .withColumn("u", saltedUniform(col("doc_id"), "distmatch|"))
      .groupBy("source", "len_bucket")
      .agg(count(lit(1)).as("n_docs"),
        first(col("accept_rate")).as("accept_rate"),
        sum(when(col("u") < col("accept_rate"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Stratified k-fold assignment: within every source, rows are ranked
    * by their salted id-hash uniform and dealt round-robin into k folds
    * — so each (source, fold) cell holds ⌈n_s/k⌉ or ⌊n_s/k⌋ rows
    * EXACTLY (the balance guarantee plain hash-mod `u*k` only has in
    * expectation), while the within-source order is still the
    * reproducible hash shuffle. The cross-validation counterpart of
    * [[trainSplit]].
    *
    * One window per source (parallel across sources, the x95/x68
    * convention); no corpus shuffle beyond it.
    */
  def stratifiedKFold(docs: DataFrame, k: Int = 5,
      salt: String = "fold|"): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2,1000], got $k")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__u").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"))
      .withColumn("__u", saltedUniform(col("doc_id"), salt))
      .withColumn("fold", ((row_number().over(w) - 1) % k).cast("long"))
      .drop("__u")
  }

  /** Token-budget selection per source — "the best `budget` tokens of
    * each source": documents rank by quality (the shared x02 expression
    * on its 1e-9 fixed-point grid, ties to the smaller doc_id) and the
    * kept set is the longest quality-ranked PREFIX whose running token
    * total fits the budget. Prefix semantics (a doc that overflows the
    * budget also blocks everything ranked below it) keep the cut
    * deterministic and oracle-replayable — no knapsack backtracking.
    *
    * One window per source — parallel across sources, never global
    * (the x68/x95 convention).
    */
  def budgetSelect(docs: DataFrame, budget: Long = 5000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val qfp = floor(TextAnalysis.qualityScoreExpr * lit(1e9) + lit(0.5)).cast("long")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q_fp").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        qfp.as("q_fp"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("kept", col("cum_tokens") <= budget)
  }

  /** Greedy context-window packing: within each `source` partition, docs
    * (in doc_id order) are assigned to consecutive bins of `budget`
    * tokens — bin = tokens-before-this-doc DIV budget, so a doc starts in
    * the bin its running offset falls into (documents are not split; a
    * doc may run past the boundary, the standard "pack then truncate at
    * the consumer" contract). The sequence-packing step that turns a
    * corpus into fixed-budget training batches.
    *
    * Scale shape: the running sum is a window per source — parallel
    * across sources, never a global single-partition window. At 100 TB
    * the partition key is whatever unit packing must respect (shard,
    * source, language); a finer pre-bucketing (hash of doc ranges) keeps
    * any one source from skewing.
    */
  def packBudget(docs: DataFrame, budget: Int = 2000): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before DIV $budget"))
  }

  /** k-anonymity audit over a pair of quasi-identifier columns (Sweeney
    * 2002) — the privacy screen a training-data release runs before
    * shipping: for each generalization level of the QI lattice
    * ({both}, {a}, {b}), every row falls into the equivalence class of
    * rows sharing its QI values, and a class smaller than `k` makes its
    * members re-identifiable. Reported per level: class count, smallest
    * class, how many rows sit in sub-k classes, and the fraction that
    * would need suppression to reach k-anonymity at that level — so the
    * release picks the cheapest level that meets policy.
    *
    * Spark shape: ONE grouping-sets aggregate computes every lattice
    * level's classes in a single shuffle (the x46 machinery pointed at
    * privacy semantics), then a second m-row aggregate folds classes to
    * levels. All counts exact BIGINTs; the suppression rate is one double
    * division from them. Assumes non-null QI columns (nulls would merge
    * into a fake class; the x52 constraint audit screens that upstream).
    */
  def kAnonymityAudit(rows: DataFrame, qiA: String, qiB: String,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val classes = rows
      .groupingSets(
        Seq(Seq(col(qiA), col(qiB)), Seq(col(qiA)), Seq(col(qiB))),
        col(qiA), col(qiB))
      .agg(count(lit(1)).as("class_size"), grouping_id().cast("int").as("gid"))
      .select(col("gid"), col("class_size"))
    classes.groupBy("gid").agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_below_k"),
        sum(col("class_size")).as("n_rows"))
      .select(
        when(col("gid") === 0, s"$qiA+$qiB")
          .when(col("gid") === 1, qiA).otherwise(qiB).as("qi_level"),
        col("n_classes"), col("min_class_size"), col("rows_below_k"),
        col("n_rows"),
        (col("rows_below_k").cast("double") / col("n_rows").cast("double"))
          .as("suppression_rate"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — [[kAnonymityAudit]]'s
    * companion: a class can be k-anonymous yet leak its members' sensitive
    * attribute when every member SHARES it (the homogeneity attack). Per
    * QI equivalence class: size, the number of distinct sensitive values,
    * and whether the class meets distinct-l-diversity. One exact
    * aggregate, partitioned on the QI pair — the same scale shape as any
    * two-key groupBy.
    */
  def lDiversityAudit(rows: DataFrame, qiA: String, qiB: String,
      sensitive: Column, l: Int = 2): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    rows.groupBy(col(qiA), col(qiB))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("diverse_ok", (col("n_sensitive") >= l).cast("int"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy-audit ladder after [[kAnonymityAudit]] and
    * [[lDiversityAudit]]: a class can be k-anonymous AND l-diverse yet
    * still leak when its sensitive-value DISTRIBUTION differs from the
    * table's (the skewness/similarity attacks). Per QI class, the
    * ordered earth-mover's distance between the class's and the global
    * sensitive distribution: EMD = (1/(v−1))·Σᵢ |Σ_{j≤i}(p_j − q_j)| —
    * the paper's closed form for ordered attributes with unit adjacent
    * ground distance.
    *
    * Exactness discipline: `sensitiveCents` must be an exact BIGINT
    * (money through the DECIMAL cast, ×100); levels are integral
    * division after a positive shift (so Spark `div` and DuckDB `//`
    * agree — they differ on negatives); cumulative class and global
    * counts are exact BIGINTs; each |cumdiff| term is two exact-integer
    * divisions snapped onto the 1e-9 fixed-point grid, so the per-class
    * sum is an order-free integer and the distributed aggregation
    * cannot perturb a double. The final EMD is one shared IEEE tree,
    * rounded to 6. The last level's term is exactly 0 (both CDFs reach
    * 1), so summing all v terms equals the paper's v−1-term sum.
    *
    * Scale shape: ONE corpus aggregate to (class, level) counts; the
    * grid fill (every class × every occupied level, absent cells 0 —
    * without them a class missing a level would silently skip that
    * cumdiff term) and the cumulative windows run over the tiny
    * classes×levels frame. A single-level table (v = 1) has identical
    * distributions by construction: EMD 0, never 0/0.
    */
  def tClosenessAudit(rows: DataFrame, qi: String, sensitiveCents: Column,
      bucketCents: Long = 100000L, shiftCents: Long = 100000000L,
      t: Double = 0.2): DataFrame = {
    require(bucketCents > 0, "bucketCents must be positive")
    val base = rows.select(col(qi).as("cls"),
      (sensitiveCents + lit(shiftCents)).cast("long").as("cents"))
      .withColumn("lvl", expr(s"cents div ${bucketCents}L"))
    val cb = base.groupBy("cls", "lvl").agg(count(lit(1)).as("n_cl"))
    val gb = cb.groupBy("lvl").agg(sum(col("n_cl")).as("n_l"))
    val cls = cb.groupBy("cls").agg(sum(col("n_cl")).as("n_c"))
    val grid = cls.crossJoin(gb)
      .join(cb, Seq("cls", "lvl"), "left")
      .withColumn("n_cl", coalesce(col("n_cl"), lit(0L)))
    val wl = Window.partitionBy("cls").orderBy("lvl")
    val wc = Window.partitionBy("cls")
    val cum = grid
      .withColumn("p_cum", sum(col("n_cl")).over(wl))
      .withColumn("q_cum", sum(col("n_l")).over(wl))
      .withColumn("n_total", sum(col("n_l")).over(wc))
      .withColumn("term_fp",
        floor(abs(col("p_cum").cast("double") / col("n_c").cast("double")
          - col("q_cum").cast("double") / col("n_total").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
    cum.groupBy("cls").agg(
        max(col("n_c")).as("class_size"),
        count(lit(1)).as("n_levels"),
        sum(col("term_fp")).as("sum_fp"))
      .withColumn("emd",
        when(col("n_levels") > 1,
          round(col("sum_fp").cast("double") / lit(1e9)
            / (col("n_levels") - 1L).cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("t_ok", col("emd") <= t)
      .select(col("cls").as(qi), col("class_size"), col("n_levels"),
        col("emd"), col("t_ok"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining") — the mixing rule that replaced temperature sampling
    * for multilingual corpora: spend a token budget B as EQUALLY across
    * groups (languages) as possible, but never take more than `epochCap`
    * passes over any group's data. Low-resource groups get their full
    * epoch cap; the surplus water-fills into the high-resource groups —
    * temperatureMix's sqrt softening replaced by a hard repetition bound,
    * which is the knob that actually matters at 100 TB (a 4-epoch cap on
    * a 100 GB language is a real overfitting guard; a temperature is not).
    *
    * Closed form instead of the paper's iterative loop: sort groups by
    * capacity c_i = epochCap·n_i ascending and note that
    * f(i) = Σ_{j<i} c_j + c_i·(m−i+1) is NON-DECREASING in i (adjacent
    * difference (c_i − c_{i−1})·(m−i+1) ≥ 0), so the capped set — groups
    * whose capacity fits under an equal split of what remains — is
    * exactly the prefix where f(i) ≤ B, found with one window scan, no
    * iteration. Every f(i), prefix sum, and budget is an exact
    * DECIMAL(38,0) integer (capacities stay BIGINT; see
    * [[unimaxFromCounts]] for the overflow envelope),
    * so the capped/uncapped partition is bit-identical in any engine;
    * the only doubles are the final share division and epochs ratio,
    * one shared IEEE tree, rounded to 6.
    *
    * Scale shape: ONE corpus aggregate (groupBy over a 2-column
    * projection) to per-group token counts; the allocation itself is
    * window arithmetic over m rows. Degenerate law (pinned in
    * Batch13Spec): B ≥ Σc_i caps every group at epochCap and leaves
    * budget unspent — allocation never invents tokens.
    */
  def unimaxAllocate(docs: DataFrame, groupCol: String = "lang",
      epochCap: Int = 2, budgetNum: Int = 16, budgetDen: Int = 10): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("grp"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    unimaxFromCounts(counts, groupCol, epochCap, budgetNum, budgetDen)
  }

  /** The allocation core of [[unimaxAllocate]], over a precomputed
    * per-group counts frame (columns grp, n_docs, n_tokens) — the
    * composable form: any token-mass notion (raw counts, x144's
    * dedup-discounted effective mass, a priced byte budget) water-fills
    * the same way. `n_tokens` only needs to be an exact BIGINT in a
    * consistent unit; ratios (epochs) are unit-free.
    */
  def unimaxFromCounts(counts: DataFrame, groupOut: String,
      epochCap: Int, budgetNum: Int, budgetDen: Int): DataFrame = {
    require(epochCap >= 1, s"epochCap must be >= 1, got $epochCap")
    require(budgetNum > 0 && budgetDen > 0, "budget ratio must be positive")
    // The prefix/f/budget chain runs in DECIMAL(38,0), not LongType:
    // non-ANSI Spark wraps silently once sum(n_tokens)*budgetNum or
    // capacity*(m-rank+1) exceeds 2^63 — with x220 feeding 1e6-scaled
    // eff_tokens_fp that long envelope shrinks to ~5.7e11 effective
    // tokens, below the 100 TB target, and DuckDB (HUGEINT) would
    // diverge instead of wrapping (round-13 advice). The capped set is
    // therefore decided overflow-free; the residual envelope is the
    // OUTPUT columns, where budget_tokens casts back to BIGINT (exact to
    // 9.2e18 budget tokens; the budget division itself is exact for
    // budgetDen < ~2e6 — floor of a scale-11 HALF_UP quotient can only
    // disagree with integer division when the remainder/den lands
    // within 1e-11 of 1, impossible for den below that bound).
    require(budgetDen < 2000000, s"budgetDen must stay below 2e6 for the exact floor, got $budgetDen")
    val withCap = counts.withColumn("capacity_tokens", col("n_tokens") * epochCap)
      .withColumn("cap_dec", col("capacity_tokens").cast("decimal(38,0)"))
    val byCap = Window.orderBy(col("capacity_tokens"), col("grp"))
    val all = Window.partitionBy()
    val budgetDec = floor(sum(col("n_tokens")).over(all).cast("decimal(38,0)")
      * lit(budgetNum) / lit(budgetDen))
    val ranked = withCap
      .withColumn("rank", row_number().over(byCap).cast("long"))
      .withColumn("prefix",
        coalesce(sum(col("cap_dec"))
          .over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L).cast("decimal(38,0)")))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("budget_dec", budgetDec)
      .withColumn("budget_tokens", budgetDec.cast("long"))
      .withColumn("f",
        col("prefix") + col("cap_dec") * (col("m") - col("rank") + 1))
      .withColumn("capped", col("f") <= col("budget_dec"))
    val sized = ranked
      .withColumn("k_capped",
        sum(col("capped").cast("long")).over(all))
      .withColumn("capped_sum",
        coalesce(sum(when(col("capped"), col("cap_dec"))).over(all),
          lit(0L).cast("decimal(38,0)")))
    val alloc = when(col("capped"), col("capacity_tokens").cast("double"))
      .otherwise((col("budget_dec") - col("capped_sum")).cast("double")
        / (col("m") - col("k_capped")).cast("double"))
    sized
      .withColumn("alloc_tokens", round(alloc, 6))
      .withColumn("epochs", round(alloc / col("n_tokens").cast("double"), 6))
      .select(col("grp").as(groupOut), col("n_docs"), col("n_tokens"),
        col("capacity_tokens"), col("rank"), col("budget_tokens"),
        col("capped"), col("alloc_tokens"), col("epochs"))
  }
}
