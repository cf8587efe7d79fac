package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §7.4.5): when a join key's value
  * distribution is heavy-tailed (one nation holds half the customers, one
  * document id dominates a shingle bucket), the hash partition owning the
  * hot key becomes the straggler. AQE's skew-join handles sort-merge
  * cases at runtime; this helper is the explicit salting form for when
  * the planner must be forced — e.g. a broadcast-ineligible dimension
  * with a known hot key.
  *
  * Shape: the big side gets a round-robin salt in [0, n) from its
  * physical row position (NOT a hash of the row's content: exact
  * duplicate rows of a hot key — the shape of a constant-payload fact
  * table — would all hash to ONE salt, leaving the join exactly as
  * skewed while still paying the replication; correctness never depends
  * on which salt a row gets, so position is the right spread); the
  * small side is replicated n times (one copy per salt). The join key
  * becomes (key, salt), splitting each hot key's rows across n
  * reducers. Cost: small side inflates n× — pick n ≈
  * (hot-key rows / target partition rows), not a blanket large value.
  */
object Skew {

  /** Join types where replicating the small side is semantics-preserving:
    * the big side carries exactly one salt per row, so inner/left/semi/
    * anti behave identically to the unsalted join. Right/full outer are
    * NOT — an unmatched small-side row would surface once per replica.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")) ||
      SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports ${SafeJoinTypes.mkString("/")}; '$joinType' would " +
        "duplicate unmatched replicated-side rows")
    val saltCol = "__graft_salt"
    // monotonically_increasing_id = (partition << 33) | row-index, so
    // mod n round-robins WITHIN every partition — an even split of each
    // hot key's rows even when they are byte-identical. Stable under
    // task retry (same partition, same row order).
    val saltedBig = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int"))
    val saltedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(saltedSmall, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Differentiated (two-path) skew join: keys whose big-side frequency
    * exceeds `hotThreshold` are joined via a BROADCAST of the small
    * side's hot slice (no shuffle ever sees the hot keys), while the
    * long tail takes the ordinary shuffled equi-join; the union is
    * row-identical to the plain join. This is the explicit form of the
    * classic hot-key/cold-key split (what AQE's OptimizeSkewedJoin does
    * for sort-merge partitions at runtime, done at the semantic level so
    * it also covers hash joins and survives a 100× scale-up of one key).
    *
    * Scale shape: hot-key detection is one map-side-combinable count on
    * the big side; by construction at most |big| / hotThreshold keys can
    * exceed the threshold, so the hot-key list and the small side's hot
    * slice (for a dimension: one row per hot key) are broadcast-bounded
    * REGARDLESS of the data — the caller picks the bound, not the skew.
    *
    * Join-type restriction matches [[saltedJoin]]'s table: the small
    * side is split (hot slice vs full table), so only joins where an
    * unmatched small row produces nothing are safe.
    */
  def twoPathJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      hotThreshold: Long, joinType: String = "inner"): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")) ||
      SafeJoinTypes.contains(joinType.toLowerCase),
      s"twoPathJoin supports ${SafeJoinTypes.mkString("/")}; '$joinType' would " +
        "duplicate unmatched small-side rows across the two paths")
    val keyCols = keys.map(col)
    val hot = broadcast(
      big.groupBy(keyCols: _*).agg(count(lit(1)).as("__graft_keyfreq"))
        .filter(col("__graft_keyfreq") > hotThreshold)
        .drop("__graft_keyfreq"))
    val hotPath = big.join(hot, keys, "left_semi")
      .join(broadcast(small.join(hot, keys, "left_semi")), keys, joinType)
    val tailPath = big.join(hot, keys, "left_anti")
      .join(small, keys, joinType)
    // Tail big rows carry no hot key, so small's hot rows can never match
    // them (and vice versa): the two paths partition the join output.
    hotPath.unionByName(tailPath)
  }

  /** Shared strategy rule: the CASE text is interpolated verbatim into
    * both the Spark plan and the DuckDB oracle so the decision is
    * engine-identical. Thresholds are parameters of [[joinStats]]. */
  def strategyCase(broadcastRowLimit: Long, skewFactor: Double): String =
    s"CASE WHEN n_right <= $broadcastRowLimit THEN 'broadcast' " +
      s"WHEN skew_ratio > $skewFactor THEN 'salt' ELSE 'shuffle' END"

  /** Join planning statistics WITHOUT executing the join — what a planner
    * (or an engineer staring at a 100 TB join) needs before paying for
    * it: per-side cardinalities, distinct key counts, max per-key fanout,
    * the EXACT output cardinality Σ_k cnt_left(k)·cnt_right(k) (computed
    * from the two key histograms, which cost two map-side-combinable
    * aggregates — orders of magnitude less than the join itself), the
    * left skew ratio (max fanout / mean fanout), and a recommended
    * strategy: broadcast when the right side is small, salt (or
    * [[twoPathJoin]]) when one key dominates, shuffle otherwise.
    *
    * Everything driver-free: three bounded aggregates cross-joined into
    * one row. The estimate is exact for equi-joins because the output
    * multiset is exactly the histogram product — no sampling error.
    */
  def joinStats(left: DataFrame, right: DataFrame, key: String,
      broadcastRowLimit: Long = 1000000L, skewFactor: Double = 8.0): DataFrame = {
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("ln"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("rn"))
    val ls = lc.agg(sum(col("ln")).as("n_left"),
      count(lit(1)).as("distinct_left"), max(col("ln")).as("max_fanout_left"))
    val rs = rc.agg(sum(col("rn")).as("n_right"),
      count(lit(1)).as("distinct_right"), max(col("rn")).as("max_fanout_right"))
    val js = lc.join(rc, Seq(key))
      .agg(coalesce(sum(col("ln") * col("rn")), lit(0L)).as("join_rows"))
    ls.crossJoin(rs).crossJoin(js)
      .selectExpr("n_left", "n_right", "distinct_left", "distinct_right",
        "max_fanout_left", "max_fanout_right", "join_rows",
        "CAST(max_fanout_left AS DOUBLE) / (CAST(n_left AS DOUBLE) / CAST(distinct_left AS DOUBLE)) AS skew_ratio")
      .selectExpr("*", s"${strategyCase(broadcastRowLimit, skewFactor)} AS strategy")
  }
}
