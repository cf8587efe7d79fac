package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank contracts: determinism of the integer arithmetic
  * is gated by the x73/x77 oracles; these pin the conservation algebra —
  * the property that separates the two variants — and the overflow guard.
  */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private val Base = 1000000000L

  // 0→1→2→0 cycle, 3→0 feeder, 4 and 5 isolated (dangling: 3 has out-
  // edges; 4/5 have none, so their mass evaporates in `pagerank` and
  // redistributes in `pagerankConserving`).
  private def graph = (
    Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst"),
    (0L to 5L).toDF("id"))

  test("conserving variant keeps total mass within the truncation envelope") {
    val (edges, verts) = graph
    val iters = 3
    val n = 6L
    val nEdges = 4L
    val total = PageRank.pagerankConserving(edges, verts, iters)
      .agg(sum("rank")).head().getLong(0)
    // Exact conservation would give n·base; each round truncates < 1 unit
    // per division — per out-vertex contribution (≤ E total), per-vertex
    // damping DIV 100, and the dangling share DIV n (≤ 2N total).
    val envelope = iters * (nEdges + 2 * n)
    assert(total <= n * Base, s"mass created: $total > ${n * Base}")
    assert(total >= n * Base - envelope,
      s"mass lost beyond truncation: ${n * Base - total} > $envelope")
  }

  test("evaporating variant loses the dangling mass the conserving one keeps") {
    val (edges, verts) = graph
    val evap = PageRank.pagerank(edges, verts, 3)
      .agg(sum("rank")).head().getLong(0)
    val cons = PageRank.pagerankConserving(edges, verts, 3)
      .agg(sum("rank")).head().getLong(0)
    // Two isolated vertices sit at the teleport floor and leak
    // 0.85 · their rank every round; the conserving variant recycles it.
    assert(cons > evap + Base / 2,
      s"conserving ($cons) should hold well over half a base unit more than evaporating ($evap)")
  }

  test("ranks without dangling vertices agree between variants") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val verts = (0L to 2L).toDF("id")
    val a = PageRank.pagerank(edges, verts, 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = PageRank.pagerankConserving(edges, verts, 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("weighted variant splits rank by weight; uniform weights reduce to the unweighted ranks") {
    // 0 sends 90% of its mass to 1 and 10% to 2.
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val verts = (0L to 2L).toDF("id")
    val r = PageRank.pagerankWeighted(edges, verts, 2)
      .orderBy("id").as[(Long, Long)].collect().toMap
    // The 9:1 split applies to INCOMING mass — above the teleport floor
    // every vertex keeps regardless of links (up to DIV truncation).
    val teleport = Base * 15L / 100L
    assert(math.abs((r(1L) - teleport) - 9L * (r(2L) - teleport)) <= 20L,
      s"incoming mass should split 9:1: ${r(1L)} vs ${r(2L)}")
    // All-equal weights = the unweighted algorithm, bit for bit.
    val eq = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val eqW = eq.withColumn("w", lit(7L))
    val verts3 = (0L to 2L).toDF("id")
    val a = PageRank.pagerank(eq, verts3, 3).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    val b = PageRank.pagerankWeighted(eqW, verts3, 3).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("weighted guard rejects empty edges and non-positive weights; int weights accepted") {
    val verts = (0L to 2L).toDF("id")
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assertThrows[IllegalArgumentException] {
      PageRank.pagerankWeighted(empty, verts, 1)
    }
    // A single zero weight must fail fast — its src's Σw_out can hit 0
    // and the DIV's NULLs would be silently dropped by sum() otherwise.
    val zeroW = Seq((0L, 1L, 1L), (1L, 2L, 0L)).toDF("src", "dst", "w")
    assertThrows[IllegalArgumentException] {
      PageRank.pagerankWeighted(zeroW, verts, 1)
    }
    // IntegerType weights pass the (cast-based) guard and run.
    val intW = Seq((0L, 1L, 3), (1L, 2L, 4)).toDF("src", "dst", "w")
    assert(PageRank.pagerankWeighted(intW, verts, 1).count() === 3L)
  }

  test("overflow guard rejects a base the vertex count cannot carry") {
    val (edges, verts) = graph
    val huge = Long.MaxValue / 100L
    assertThrows[IllegalArgumentException] {
      PageRank.pagerank(edges, verts, 1, base = huge)
    }
    assertThrows[IllegalArgumentException] {
      PageRank.pagerankConserving(edges, verts, 1, base = huge)
    }
  }
}
