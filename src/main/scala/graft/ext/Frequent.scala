package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy-hitter mining over unbounded key domains, two-phase:
  * a per-partition Misra–Gries summary proposes candidates, an exact
  * recount restricted to those candidates applies the threshold.
  *
  * Scale rationale: the naive plan shuffles EVERY distinct token to its
  * reducer — at 100 TB the token domain is billions of keys and the
  * shuffle is the corpus. Misra–Gries with k counters per partition
  * guarantees (pigeonhole over the summed local streams) that every
  * token with global count > N/(k+1) survives in at least one
  * partition's summary, so the union of P summaries — at most P·k
  * tokens, a few MB — is a provable superset of the heavy hitters.
  * The recount then shuffles only rows matching a candidate (hashed
  * semi-join against the tiny candidate set), and the final counts are
  * exact, not estimates: the sketch only prunes, never answers.
  *
  * Mirrors the reference's top-rented-categories reporting shape
  * (queries_shan.sql revenue-by-category rollups) generalized to an
  * open key domain. Misra & Gries 1982; the merge-guarantee form is
  * Berinde et al. 2010.
  */
object Frequent {

  /** Tokens whose corpus frequency strictly exceeds total/denom, with
    * their EXACT counts. `denom` doubles as the Misra–Gries counter
    * budget (k = denom ≥ denom guarantees the superset property for
    * the > N/denom threshold, since N/denom > N/(denom+1)).
    */
  def frequentTokens(docs: DataFrame, denom: Int = 200): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))

    // Phase 1: per-partition Misra–Gries. Genuine per-partition
    // imperative state (k counters with decrement-all eviction) — the
    // one shape mapPartitions exists for. Amortized O(1) per token:
    // each decrement is paid for by a prior increment.
    val k = denom
    val candidates = toks
      .select(col("tok"))
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        val counters = new java.util.HashMap[String, Long](k * 2)
        it.foreach { t =>
          if (counters.containsKey(t)) counters.put(t, counters.get(t) + 1L)
          else if (counters.size < k) counters.put(t, 1L)
          else {
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1L)
            }
          }
        }
        scala.jdk.CollectionConverters.SetHasAsScala(counters.keySet()).asScala.iterator
      }(Encoders.STRING)
      .toDF("tok")
      .distinct()

    // Phase 2: exact recount of candidate tokens only. The candidate
    // set is ≤ partitions·k rows — broadcast it so the probe never
    // shuffles non-candidates; the total is one scalar broadcast.
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(denom.toLong) > col("n_total"))
      .select(col("tok"), col("cnt"), col("n_total"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** AMS/tug-of-war F₂ sketch (Alon, Matias & Szegedy 1996) — the
    * second frequency moment Σc² of the token stream from d = 96
    * ±1-projection counters instead of a full frequency table. F₂ IS
    * the self-join size of the stream keyed on the token, which makes
    * this the classical sketch behind join-size/skew estimation: x135
    * computes Σ cnt_l·cnt_r exactly from key histograms; this answers
    * the same class of question in d counters of mergeable state —
    * each S_j = Σ_t sign_j(t)·c_t is a plain distributed SUM, so
    * partitions sketch independently and merge by addition, and
    * E[S²] = F₂ with variance tamed by median-of-means (3 groups × 32 —
    * relative spread √(2/32) ≈ 25% per group mean; the exact-F₂ audit
    * column prices the realized draw).
    *
    * Cross-engine exactness: sign_j(t) is the parity of the first hex
    * digit of md5(t·'|ams|'·j) (the family hash convention), so every
    * S_j is an exact BIGINT; squares and the 32-estimator group sums
    * stay BIGINT; the 3-way median is the branch-free
    * greatest(least(a,b), least(greatest(a,b), c)) — one shared integer
    * expression tree, then ONE division by 32 into a double. The exact
    * F₂ and relative error ride along gate-only (the audit cost the
    * sketch exists to avoid — at 100 TB you keep the 96 counters, not
    * the frequency table).
    *
    * Scale shape: one token aggregate to the Heaps-bounded count table,
    * one 96-way projection over it, a 96-row reduce. (Direct streaming
    * form — skip the count table, update counters per token — is the
    * same SUM; the count-table route shares the scan with the exact
    * audit here.)
    */
  def amsF2(docs: DataFrame): DataFrame = {
    val d = 96
    val counts = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val est = counts
      .select(col("tok"), col("c"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .select(col("j"), col("c"),
        (conv(substring(md5(concat(col("tok"), lit("|ams|"), col("j"))), 1, 1),
          16, 10).cast("long") % 2L * 2L - 1L).as("sign"))
      .groupBy("j").agg(sum(col("sign") * col("c")).as("s"))
      .groupBy((col("j") / lit(32)).cast("int").as("g"))
      .agg(sum(col("s") * col("s")).as("grp_fp"))
      .agg(max(when(col("g") === 0, col("grp_fp"))).as("g0"),
        max(when(col("g") === 1, col("grp_fp"))).as("g1"),
        max(when(col("g") === 2, col("grp_fp"))).as("g2"))
      .select((greatest(least(col("g0"), col("g1")),
        least(greatest(col("g0"), col("g1")), col("g2")))
        .cast("double") / lit(32.0)).as("f2_est"))
    val exact = counts.agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(col("c") * col("c")).as("f2_exact"))
    exact.crossJoin(broadcast(est))
      .select(col("n_tokens"), col("n_distinct"), lit(d).as("d"),
        col("f2_exact"), round(col("f2_est"), 6).as("f2_est"),
        when(col("f2_exact") > 0,
          round(abs(round(col("f2_est"), 6) - col("f2_exact").cast("double"))
            / col("f2_exact").cast("double"), 6)).as("rel_error"))
  }
}
