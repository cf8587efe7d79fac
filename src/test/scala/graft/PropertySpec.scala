package graft

import graft.functions.DeterministicMode
import graft.service.SqlCatalog
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based specs (SURVEY.md §5.3.3): algebraic laws the engine's
  * deterministic primitives must satisfy for distributed execution to be
  * order-independent — plus conservation on the real data.
  */
class PropertySpec extends SparkSuite {

  private def check(prop: Prop, minTests: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val values = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))

  test("DeterministicMode: any partitioning/merge order of the input yields the same mode") {
    check(Prop.forAll(values, Gen.choose(1, 5)) { (xs: List[String], cut: Int) =>
      xs.isEmpty || {
        val whole = xs.foldLeft(DeterministicMode.zero)(DeterministicMode.reduce)
        val chunks = xs.grouped(math.max(1, xs.length / cut)).toList
          .map(_.foldLeft(DeterministicMode.zero)(DeterministicMode.reduce))
        val merged = chunks.foldLeft(DeterministicMode.zero)(DeterministicMode.merge)
        val mergedRev = chunks.reverse.foldLeft(DeterministicMode.zero)(DeterministicMode.merge)
        DeterministicMode.finish(merged) == DeterministicMode.finish(whole) &&
          DeterministicMode.finish(mergedRev) == DeterministicMode.finish(whole)
      }
    })
  }

  test("DeterministicMode.finish: winner count is maximal; ties go to smallest value") {
    check(Prop.forAll(values) { xs: List[String] =>
      xs.isEmpty || {
        val counts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val winner = DeterministicMode.finish(
          xs.foldLeft(DeterministicMode.zero)(DeterministicMode.reduce))
        val maxCount = counts.values.max
        counts(winner) == maxCount &&
          winner == counts.filter(_._2 == maxCount).keys.min
      }
    })
  }

  test("money cast at scale 4 is exact for 2-decimal doubles (sum = integer cents)") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 10000000))) { cents: List[Int] =>
      val asDecimals = cents.map(c =>
        new java.math.BigDecimal(c / 100.0).setScale(4, java.math.RoundingMode.HALF_UP))
      val total = asDecimals.foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val expected = new java.math.BigDecimal(cents.map(_.toLong).sum)
        .movePointLeft(2).setScale(4)
      total.compareTo(expected) == 0
    })
  }

  test("SqlCatalog: parse recovers every generated block in order") {
    val title = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(20).mkString)
    val body = Gen.oneOf("SELECT 1", "SELECT *\nFROM t", "SELECT a, b FROM x WHERE c > 0")
    check(Prop.forAll(Gen.listOf(Gen.zip(title, body))) { blocks: List[(String, String)] =>
      val text = blocks.zipWithIndex.map { case ((t, b), i) =>
        s"-- Query ${i + 1}: $t\n$b;"
      }.mkString("\n")
      val parsed = SqlCatalog.parse(text)
      parsed.length == blocks.length &&
        parsed.zip(blocks).zipWithIndex.forall { case ((meta, (t, b)), i) =>
          meta.number == i + 1 && meta.title == t && meta.sql == b
        }
    })
  }

  test("asofJoin matches a brute-force per-key scan on random event sets") {
    import spark.implicits._
    // Small timestamp domain forces plenty of key and time collisions —
    // the cases where as-of semantics (inclusive <=, tie-break, NULL when
    // nothing precedes) actually bite.
    val leftGen = Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
    val rightGen = Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.choose(1L, 99L)))
    check(Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      ls.isEmpty || {
        val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("id", "k", "t")
        val right = rs.zipWithIndex.map { case ((k, rt, v), i) => (k, rt, v, i.toLong) }
          .toDF("k", "rt", "v", "seq")
        val got = graft.ops.AsOf.asofJoin(left, right, "k", "t", "rt",
            rightTieBreak = Some("seq"))
          .select("id", "asof_v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val expected = ls.zipWithIndex.map { case ((k, t), i) =>
          val candidates = rs.zipWithIndex
            .filter { case ((rk, rt, _), _) => rk == k && rt <= t }
          val best = candidates
            .sortBy { case ((_, rt, _), seq) => (rt, seq) } // max (rt, seq) wins
            .lastOption.map(_._1._3)
          i.toLong -> best
        }.toMap
        got == expected
      }
    }, minTests = 30)
  }

  test("conservation on real data: revenue total invariant across all regroupings") {
    import org.apache.spark.sql.functions._
    val dw = graft.warehouse.View.dw(spark, Sf)
    val total = dw.agg(sum(col("total_revenue").cast("decimal(18,4)"))).first().getDecimal(0)
    for (g <- Seq("nation", "region", "segment", "top_category")) {
      val regrouped = dw.groupBy(g)
        .agg(sum(col("total_revenue").cast("decimal(18,4)")).as("s"))
        .agg(sum("s")).first().getDecimal(0)
      assert(regrouped.compareTo(total) === 0, s"grouping by $g lost revenue")
    }
  }
}
