package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic mode (most frequent value, ties broken by smallest
  * value) as a typed Aggregator — SURVEY.md §2.11 U6: the reference's
  * correlated `ORDER BY COUNT(*) DESC LIMIT 1` subquery
  * (queries_shan.sql:15-23) as ONE aggregation instead of a count
  * group-by plus a window rank (two shuffles → one, and no per-partition
  * sort). Spark's built-in mode() (3.4+) breaks ties nondeterministically;
  * dedup pipelines and oracle checks need the pinned tie-break.
  *
  * Scale contract: the buffer is a value→count map per group. That is
  * bounded by the per-group distinct cardinality (categories per
  * customer ≈ dozens), NOT the group size — safe at 100 TB for
  * category-like domains; for unbounded domains use the window-rank
  * formulation instead (kept in sakila.Sakila.revenueView as W1).
  */
object DeterministicMode extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  }

  override def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (k, v) => (-v, k) }._1

  // Catalyst map encoder, not Kryo: the buffer serializes per partial-agg
  // row exchange, and the native MapType codec is both faster and gives
  // the shuffle a real schema.
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: modeDet($"category"). */
  def apply(c: Column): Column = udaf(DeterministicMode).apply(c)
}
