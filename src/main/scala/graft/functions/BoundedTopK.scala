package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Top-k per group as a typed Aggregator with a k-BOUNDED buffer —
  * the map-side-combine alternative to the window formulation
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`).
  *
  * Why it matters at 100 TB: the window plan shuffles EVERY row to its
  * group's partition and sorts the whole partition before discarding all
  * but k rows. This aggregator's partial-aggregation buffer never holds
  * more than k entries, so the map-side combine discards losers BEFORE
  * the exchange: the shuffle carries at most k rows per (group ×
  * input-partition) and no sort of the full data ever happens — the
  * per-group generalization of TakeOrderedAndProject.
  *
  * Ordering contract: score descending, payload ascending on ties,
  * with SPARK SQL's double semantics — NaN sorts as the LARGEST value
  * and -0.0 equals 0.0 (java.lang.Double.compare would put them apart;
  * Spark's `ORDER BY score DESC` does not) — so a ROW_NUMBER window
  * oracle reproduces the result exactly (x51 vs r04), NaNs and signed
  * zeros included. NULL scores are not part of the contract (the typed
  * input is a primitive double); filter them upstream or coalesce to a
  * sentinel — the window form defaults to NULLS LAST under DESC, which
  * no double sentinel can imitate next to real -Infinity scores.
  * NULL PAYLOADS are likewise excluded: `reduce` DROPS any row whose
  * payload is null (a window formulation would rank it — NULLS FIRST
  * under payload ASC — so the two forms diverge on null payloads; the
  * window-oracle equivalence claim holds only for non-null payloads).
  * Filter or coalesce null payloads upstream if they must rank.
  *
  * The buffer is a sorted Seq (insertion into ≤ k elements): for ranking
  * k's (top-3, top-100) linear insertion beats heap constant factors;
  * the encoder is the native array-of-struct codec, giving the partial
  * exchange a real schema.
  */
final case class BoundedTopK(k: Int)
    extends Aggregator[(Double, String), Seq[(Double, String)], Seq[(Double, String)]] {
  require(k > 0, "k must be positive")

  /** Rank order: score desc (NaN largest, -0.0 == 0.0 — Spark SQL
    * semantics), payload asc. `lt(a, b)` == "a ranks strictly higher".
    */
  private object RankOrdering extends Ordering[(Double, String)] {
    override def compare(x: (Double, String), y: (Double, String)): Int = {
      // Normalize -0.0 to 0.0 so the zeros tie (Double.compare splits
      // them); Double.compare already puts NaN above +Infinity, matching
      // Spark's sort order for DESC-largest-first.
      val xs = if (x._1 == 0.0) 0.0 else x._1
      val ys = if (y._1 == 0.0) 0.0 else y._1
      val c = java.lang.Double.compare(ys, xs) // descending
      if (c != 0) c else x._2.compareTo(y._2)
    }
  }

  override def zero: Seq[(Double, String)] = Vector.empty

  override def reduce(b: Seq[(Double, String)], a: (Double, String)): Seq[(Double, String)] =
    if (a._2 == null) b
    else {
      // Fast reject: full buffer and `a` ranks at-or-below the cutoff.
      if (b.length == k && RankOrdering.gteq(a, b.last)) b
      else {
        val i = b.indexWhere(e => RankOrdering.lt(a, e))
        val at = if (i < 0) b.length else i
        (b.take(at) :+ a) ++ b.drop(at).take(k - at - 1)
      }
    }

  override def merge(b1: Seq[(Double, String)], b2: Seq[(Double, String)]): Seq[(Double, String)] =
    (b1 ++ b2).sorted(RankOrdering).take(k)

  override def finish(b: Seq[(Double, String)]): Seq[(Double, String)] = b

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()
  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()

  /** Column form: topK(score, payload) → array<struct<score,payload>>
    * sorted best-first; posexplode for (rank, payload, score) rows.
    */
  def apply(score: Column, payload: Column): Column = udaf(this).apply(score, payload)
}
