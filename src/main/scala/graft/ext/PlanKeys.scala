package graft.ext

import org.apache.spark.sql.DataFrame

/** Source-plan fingerprint for the library's memo caches.
  *
  * The caches memoize correctness-bearing frames (shingles, signatures,
  * verified pair sets, trained models) per (session, source plan,
  * hyperparameters). A bare 32-bit `semanticHash()` key means a
  * collision between two different source plans in one session —
  * ~2⁻³² per pair — silently serves one query's cached frame as
  * another query's answer, with no error and no gate signal unless that
  * exact query is oracle-checked in that session. Combining the
  * semantic hash with the canonicalized plan's string hash makes the
  * two 32-bit fingerprints independent (~2⁻⁶⁴ joint collision), which
  * is the "never" a correctness-bearing key needs, at zero structural
  * cost (the canonicalized form normalizes expression ids, so the
  * fingerprint is stable across re-analysis of the same query).
  */
private[graft] object PlanKeys {
  def fingerprint(df: DataFrame): Long = {
    val a = df.queryExecution.analyzed
    (a.semanticHash().toLong << 32) |
      (a.canonicalized.toString.hashCode.toLong & 0xffffffffL)
  }
}
