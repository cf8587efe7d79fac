package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Hand-built-graph contracts for the triangle census and HITS — the
  * real-data path is oracle-gated (x81/x82); these pin the algebra. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("triangle census: triangle + pendant + isolated vertex") {
    // 1-2-3 triangle, 4 pendant off 3, 5 isolated.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val verts = (1L to 5L).toDF("id")
    val r = Graph.triangleStats(edges, verts).orderBy("id")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Double])))
    assert(r(0) === ((1L, 2L, 1L, Some(1.0))))
    assert(r(1) === ((2L, 2L, 1L, Some(1.0))))
    // Vertex 3: degree 3, one triangle among its 3 possible neighbor
    // pairs → coefficient 1/3.
    assert(r(2)._1 === 3L && r(2)._2 === 3L && r(2)._3 === 1L)
    assert(math.abs(r(2)._4.get - 1.0 / 3.0) < 1e-15)
    // Pendant: degree 1 → NULL coefficient, not 0.
    assert(r(3) === ((4L, 1L, 0L, None)))
    // Isolated: degree 0, NULL coefficient.
    assert(r(4) === ((5L, 0L, 0L, None)))
  }

  test("triangle census counts each triangle once (K4 has 4 triangles, 3 per vertex)") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val verts = (1L to 4L).toDF("id")
    val r = Graph.triangleStats(edges, verts)
    assert(r.agg(sum("triangles")).head().getLong(0) === 12L) // 4 triangles × 3 vertices
    assert(r.select("clustering_coeff").as[Double].collect().forall(_ === 1.0))
  }

  test("degree orientation bounds per-pivot wedges on a hub graph; dirty edges normalize") {
    // Star: hub 100 joined to 1..50, plus edge (1,2) closing ONE triangle.
    // Dirty input: a reversed duplicate (100,1) and an exact duplicate
    // (1,100) — neither may inflate degrees or counts.
    val star = (1L to 50L).map(i => (i, 100L))
    val edges = (star ++ Seq((1L, 2L), (100L, 1L), (1L, 100L))).toDF("src", "dst")
    val verts = ((1L to 50L) :+ 100L).toDF("id")
    val r = Graph.triangleStats(edges, verts).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r.last === ((100L, 50L, 1L)), "hub: degree 50 despite duplicates, 1 triangle")
    assert(r.head === ((1L, 2L, 1L)) && r(1) === ((2L, 2L, 1L)))
    assert(r.map(_._3).sum === 3L, "exactly one triangle, counted at 3 vertices")
    // The orientation itself: the hub has the maximal (degree, id) rank,
    // so every incident edge points INTO it — the raw-degree-50 vertex
    // pivots ZERO wedges, and no pivot exceeds out-degree 2 (the O(√m)
    // bound that keeps the wedge join skew-safe on power-law graphs).
    val e = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val o = Graph.orientByDegree(e, deg)
    assert(o.filter(col("src") === 100L).count() === 0L, "hub must never pivot")
    val maxOut = o.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxOut <= 2L, s"oriented out-degree should be tiny, got $maxOut")
  }

  test("HITS: star authorities and hubs land where Kleinberg says") {
    // 1,2,3 all point at 4; 5 isolated.
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val verts = (1L to 5L).toDF("id")
    val r = Graph.hits(edges, verts, 2).orderBy("id")
      .as[(Long, Long, Long)].collect()
    val base = 1000000L
    // 4 is the unique authority (normalized to base), never a hub;
    // 1-3 are the (equal) hubs; 5 is nothing.
    assert(r(3) === ((4L, 0L, base)))
    assert(Seq(r(0), r(1), r(2)).forall { case (_, h, a) => h === base && a === 0L })
    assert(r(4) === ((5L, 0L, 0L)))
  }

  test("assortativity: star is perfectly disassortative, regular graph degenerates to NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val s = Graph.assortativity(star).head()
    assert(s.getLong(0) === 6L)           // 3 undirected edges, both directions
    assert(s.getDouble(4) === -1.0)       // hub-leaf only: r = -1 exactly
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Graph.assortativity(triangle).head()
    assert(t.isNullAt(4), "zero degree variance must be NULL, not NaN/0")
    // Dirty edges (duplicate + reversed) do not change the answer.
    val dirty = star.union(Seq((1L, 0L), (0L, 2L)).toDF("src", "dst"))
    assert(Graph.assortativity(dirty).head().getDouble(4) === -1.0)
    // Hub-heavy envelope: a 50k-leaf star puts m·sxx ≈ 2d⁴ ≈ 1.25e19
    // past Long.MaxValue — BIGINT products would die under ANSI
    // arithmetic right on the hub-spoke graphs the operator describes.
    // The decimal(38,0) product path must return the exact −1 instead.
    val bigStar = spark.range(1, 50001)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val b = Graph.assortativity(bigStar).head()
    assert(b.getLong(0) === 100000L)
    assert(b.getDouble(4) === -1.0,
      s"hub-heavy star must survive the product envelope, got ${b.getDouble(4)}")
  }

  test("label propagation: min id within r hops, isolated vertices keep their own label") {
    // Path 1-2-3-4-5-6-7 plus isolated 9: after 3 rounds each vertex
    // holds the minimum id within 3 hops.
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = ((1L to 7L) :+ 9L).toDF("id")
    val r = Graph.labelPropagation(edges, verts, 3).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 3L, 7L -> 4L, 9L -> 9L))
    // One round = direct neighbors only.
    val r1 = Graph.labelPropagation(edges, verts, 1).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(r1 === Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 5L, 7L -> 6L, 9L -> 9L))
  }

  test("HITS is deterministic and guards overflow") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val verts = (1L to 3L).toDF("id")
    val a = Graph.hits(edges, verts, 3).orderBy("id").as[(Long, Long, Long)].collect()
    val b = Graph.hits(edges, verts, 3).orderBy("id").as[(Long, Long, Long)].collect()
    assert(a.toSeq === b.toSeq)
    assertThrows[IllegalArgumentException] {
      Graph.hits(edges, verts, 1, base = Long.MaxValue / 2)
    }
  }

  test("kcorePeel: pendant chain peels off round by round, core survives") {
    // Triangle 1-2-3 with a chain 3-4-5: round 1 drops 5 (degree 1),
    // round 2 drops 4 (its degree fell to 1), round 3 is stable.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = Graph.kcorePeel(edges, k = 2, rounds = 3).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kcorePeel canonicalizes dirty edges and respects the round bound") {
    // Same graph with a reversed duplicate; 1 round only drops vertex 5
    // but keeps 4 (its degree was 2 when the round was measured), so the
    // bounded peel is an over-approximation that includes 4 at degree 1.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graph.kcorePeel(edges, k = 2, rounds = 1).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 1L)))
  }

  test("bfsDistances: exact hop counts, round bound, multi-source min") {
    // Path 1-2-3-4-5 (symmetric edges).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val d2 = Graph.bfsDistances(edges, Seq(1L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(d2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"got $d2")
    // Two seeds: every vertex takes the NEAREST seed's distance.
    val dm = Graph.bfsDistances(edges, Seq(1L, 5L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(dm === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L), s"got $dm")
    // Enough rounds reaches everything exactly once at true distance.
    val d4 = Graph.bfsDistances(edges, Seq(1L), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(d4 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("iterative ops exit early at the fixed point, bit-identical to the fixed-round run") {
    // Small-radius graph: triangle 1-2-3 + pendant 3-4, diameter 2 —
    // every op converges long before 12 requested rounds.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = und.toDF("src", "dst")
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val verts = (1L to 4L).toDF("id")

    val (lp, lpRounds) = Graph.labelPropagationWithRounds(edges, verts, 12)
    assert(lpRounds < 12, s"label propagation must exit early, ran $lpRounds")
    assert(lp.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Graph.labelPropagation(edges, verts, 2).orderBy("id")
        .as[(Long, Long)].collect().toSeq,
      "early-exit labels must equal the fixed-round fixed point")

    val (kc, kcRounds) = Graph.kcorePeelWithRounds(edges, 2, 12)
    assert(kcRounds < 12, s"k-core peel must exit early, ran $kcRounds")
    assert(kc.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Graph.kcorePeel(edges, 2, 3).orderBy("id").as[(Long, Long)].collect().toSeq)

    val (bfs, bfsRounds) = Graph.bfsDistancesWithRounds(sym, Seq(1L), 12)
    assert(bfsRounds < 12, s"BFS must exit early, ran $bfsRounds")
    assert(bfs.orderBy("v").as[(Long, Long)].collect().toSeq ===
      Graph.bfsDistances(sym, Seq(1L), 4).orderBy("v")
        .as[(Long, Long)].collect().toSeq)

    // A graph still changing at the bound must run ALL requested rounds:
    // a 6-path's min label needs 5 rounds to cover the diameter.
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val pverts = (1L to 6L).toDF("id")
    val (_, full) = Graph.labelPropagationWithRounds(path, pverts, 3)
    assert(full === 3, s"non-converged run must use every round, ran $full")
  }
}
