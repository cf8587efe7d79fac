package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling — the per-column health report a pipeline
  * runs before trusting a new drop of data (the observability sibling of
  * [[Validate]]'s constraint audit): row count, null count, exact
  * distinct count, and lexicographic min/max of the string rendering,
  * melted to one row per column.
  *
  * Scale shape: ONE aggregate over one scan (the multi-count-distinct
  * expands the input — k distinct columns read the scan once but
  * aggregate k streams, Spark's standard Expand plan), then a literal
  * k-element explode to long form; nothing shuffles more than the
  * aggregate's single exchange. min/max are taken over the STRING
  * rendering (display semantics, engine-portable for integers, dates,
  * and strings — callers keep float columns out of min/max profiling
  * because float-to-string rendering is not cross-engine canonical).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"unknown profile columns in ${cols.mkString(",")}")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      count_distinct(col(c)).as(s"__dist_$c"),
      min(col(c).cast("string")).as(s"__min_$c"),
      max(col(c).cast("string")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val melted = cols.map(c => struct(
      lit(c).as("column"),
      col("__total").as("n_rows"),
      (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value")))
    row.select(explode(array(melted: _*)).as("p")).select("p.*")
  }

  /** Functional-dependency check lhs → rhs (the single-attribute slice of
    * TANE, Huhtala et al. 1999) — schema archaeology for data someone
    * else produced: does every lhs value map to exactly one rhs value?
    * Returns one row: distinct lhs groups, distinct (lhs, rhs) pairs,
    * groups carrying >1 rhs (the violators), and the verdict
    * (holds ⇔ pairs == groups ⇔ zero violators).
    *
    * Scale shape: one grouped count-distinct (shuffle on lhs) folded to
    * a single row — the FD never materializes pair lists. NULLs count as
    * a value ON BOTH SIDES (two NULL-lhs rows with different rhs DO
    * violate, and a group mapping to both NULL and 'a' DOES violate: a
    * loader that keys on lhs would collapse either). The rhs wraps in a
    * struct because a bare countDistinct skips NULLs — which would both
    * hide NULL-vs-value violations and break the declared
    * pairs == groups ⇔ holds equivalence on an all-NULL-rhs group.
    */
  def fdCheck(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs))
      .agg(countDistinct(struct(col(rhs))).as("__k"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__k")).as("n_pairs"),
        sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating_groups"))
      .select(col("n_groups"), col("n_pairs"), col("n_violating_groups"),
        (col("n_violating_groups") === 0L).as("holds"))
}
