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
}
