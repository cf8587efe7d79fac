package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the similarity/link graph of a corpus, beyond
  * [[PageRank]] and the connected-components dedup clusters: triangle
  * structure (how clique-ish a document's neighborhood is — near-dup
  * clusters are triangle-dense, topical neighborhoods are sparse) and
  * HITS hubs/authorities (Kleinberg 1999), the other classic
  * link-centrality fixed point.
  *
  * Everything here follows the repo's graph conventions: declarative
  * join/aggregate rounds keyed on vertex id (co-locatable at 100 TB by
  * pre-partitioning on that key), integer fixed-point arithmetic where a
  * float sum would be aggregation-order-dependent, and per-round
  * persistence only where a round references its predecessor more than
  * once (the Pregel convention [[PageRank.pagerankConserving]] set).
  */
object Graph {

  /** Per-vertex triangle census over an UNDIRECTED graph given as
    * canonical edges (src < dst, no duplicates — the shape
    * `Similarity.annPairs` emits): degree, triangle count, and the local
    * clustering coefficient 2·T / (d·(d−1)) (NULL when degree < 2 —
    * 3VL, not a fake zero).
    *
    * The join enumerates each triangle exactly once as the ordered wedge
    * a<b<c: edges (a,b)⋈(b,c) on the middle vertex, closed by (a,c).
    * Candidate volume is Σ_b deg_lo(b)·deg_hi(b), the standard bound; at
    * scale the wedge join hash-partitions on the pivot vertex and the
    * closing probe is another equi-join — no vertex ever sees more than
    * its own wedge set. (The deg-ordered orientation that bounds skew on
    * power-law graphs — orient edges low-degree→high-degree before the
    * wedge join — drops in here without changing the contract.)
    */
  def triangleStats(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .join(e.as("e3"),
        col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val perVertex = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    vertices
      .join(deg, Seq("id"), "left")
      .join(perVertex, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(coalesce(col("degree"), lit(0L)) >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double")
            / (col("degree").cast("double") * (col("degree").cast("double") - lit(1.0))))
          .as("clustering_coeff"))
  }

  /** HITS hubs/authorities (Kleinberg, "Authoritative Sources in a
    * Hyperlinked Environment", JACM 1999) in fixed-point integers: per
    * round, auth(v) = Σ hub over in-edges then renormalize so the max
    * auth is `base`; hub(v) = Σ auth over out-edges, renormalized the
    * same way. Renormalization is integer `x·base DIV max` with the max
    * as a broadcast scalar aggregate — the same shape as
    * [[PageRank.pagerankConserving]]'s dangling share, and like there the
    * per-round state is referenced twice (the sum and its max), so each
    * round persists (Pregel convention) instead of unrolling. All
    * arithmetic is BIGINT, so results are bit-deterministic under any
    * aggregation order and the DuckDB oracle replays every round.
    *
    * Overflow: a vertex's pre-normalization score is < n·base (each
    * neighbor contributes ≤ base after the previous normalization), and
    * the renormalization multiplies by base before dividing — so
    * n·base·base must fit a signed 64-bit long; with base=1e6 that admits
    * n up to ~9e6 per the guard, and larger graphs scale `base` down.
    */
  def hits(edges: DataFrame, vertices: DataFrame, iterations: Int = 2,
      base: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val n = vertices.count()
    require(n > 0 && n <= Long.MaxValue / base / base,
      s"hits: n_vertices($n) * base($base)^2 would overflow Long; " +
        "pass a smaller `base` (precision is 1/base)")
    val e = edges.select(col("src"), col("dst")).cache()
    var hub = vertices.select(col("id"), lit(base).as("hub"))
    var auth = vertices.select(col("id"), lit(base).as("auth"))
    // Per half-round the raw sums are referenced twice (the max and the
    // renormalization) and each round references the previous state —
    // left unchecked the LOGICAL plan quadruples per round, so each
    // state localCheckpoints (eager, lineage-truncating; cache alone
    // keeps the exponential plan tree alive in the analyzer).
    (0 until iterations).foreach { _ =>
      val aRaw = vertices
        .join(e.join(hub, col("id") === col("src"))
            .groupBy("dst").agg(sum(col("hub")).as("s")),
          col("id") === col("dst"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("raw"))
        .localCheckpoint()
      val aMax = aRaw.agg(greatest(max(col("raw")), lit(1L)).as("m"))
      auth = aRaw.crossJoin(broadcast(aMax))
        .select(col("id"), expr(s"(raw * ${base}L) DIV m").as("auth"))
        .localCheckpoint()
      val hRaw = vertices
        .join(e.join(auth, col("id") === col("dst"))
            .groupBy("src").agg(sum(col("auth")).as("s")),
          col("id") === col("src"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("raw"))
        .localCheckpoint()
      val hMax = hRaw.agg(greatest(max(col("raw")), lit(1L)).as("m"))
      hub = hRaw.crossJoin(broadcast(hMax))
        .select(col("id"), expr(s"(raw * ${base}L) DIV m").as("hub"))
        .localCheckpoint()
    }
    val out = hub.join(auth, Seq("id"))
      .select(col("id"), col("hub"), col("auth")).localCheckpoint()
    e.unpersist(blocking = false)
    out
  }
}
