package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

/** MergePercentiles rule: plan shape (N percentiles → 1 buffer) and
  * bit-identical results vs the unmerged plan. Runs on a fresh session
  * with GraftExtensions installed (rules bind at session creation — same
  * juggling as ExtensionsInstallSpec).
  */
class MergePercentilesSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val previous = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      previous.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  private def percentileCount(plan: LogicalPlan): Int =
    plan.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
      a.aggregateExpressions.map(_.collect { case p: Percentile => p }.size).sum
    }.sum

  private val QuartileSql =
    """SELECT g, percentile(v, 0.25) AS p25, percentile(v, 0.5) AS p50,
      |       percentile(v, 0.75) AS p75, percentile(v, 0.9) AS p90
      |FROM t GROUP BY g ORDER BY g""".stripMargin

  test("four same-column percentiles collapse to one; results are bit-identical") {
    // Reference first: Spark's own UNMERGED evaluation on a plain session
    // (bit-level — a hand-rolled interpolation differs in the last ulp).
    val ref = {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import spark.implicits._
      (1 to 1000).map(i => (i % 7, i * 1.5)).toDF("g", "v").createOrReplaceTempView("t")
      val df = spark.sql(QuartileSql)
      assert(percentileCount(df.queryExecution.optimizedPlan) === 4)
      df.collect().map(_.toSeq).toSeq
    }
    withExtSession { spark =>
      import spark.implicits._
      (1 to 1000).map(i => (i % 7, i * 1.5)).toDF("g", "v").createOrReplaceTempView("t")
      val merged = spark.sql(QuartileSql)
      assert(percentileCount(merged.queryExecution.optimizedPlan) === 1,
        s"expected ONE merged percentile:\n${merged.queryExecution.optimizedPlan}")
      assert(merged.collect().map(_.toSeq).toSeq === ref)
    }
  }

  test("different columns, DISTINCT, and lone percentiles stay unmerged") {
    withExtSession { spark =>
      import spark.implicits._
      Seq((1, 2.0, 3.0), (2, 4.0, 5.0)).toDF("g", "a", "b").createOrReplaceTempView("u")
      val two = spark.sql(
        "SELECT percentile(a, 0.5) AS pa, percentile(b, 0.5) AS pb FROM u")
      assert(percentileCount(two.queryExecution.optimizedPlan) === 2)
      assert(two.collect().head.toSeq === Seq(3.0, 4.0))

      val lone = spark.sql("SELECT g, percentile(a, 0.5) AS pa FROM u GROUP BY g")
      assert(percentileCount(lone.queryExecution.optimizedPlan) === 1)
      assert(lone.collect().map(_.toSeq).toSet === Set(Seq(1, 2.0), Seq(2, 4.0)))

      val distinct = spark.sql(
        "SELECT percentile(DISTINCT a, 0.5) AS d, percentile(a, 0.5) AS p FROM u")
      assert(percentileCount(distinct.queryExecution.optimizedPlan) === 2)
      assert(distinct.collect().head.toSeq === Seq(3.0, 3.0))
    }
  }

  test("x20 and x47 produce identical rows with the rule active") {
    val Sf = "/root/testdata/sf0.001"
    // Plain suite-style session (no extensions) = the gate's historical
    // behavior; extension session = what Verify/Bench now run.
    val plainRows = {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      Seq("x20_percentiles", "x47_percentile_contract")
        .map(n => n -> queries.Registry.queryMap(n)(spark, Sf).collect().map(_.toSeq).toSeq)
        .toMap
    }
    withExtSession { spark =>
      for (n <- Seq("x20_percentiles", "x47_percentile_contract")) {
        val got = queries.Registry.queryMap(n)(spark, Sf).collect().map(_.toSeq).toSeq
        assert(got === plainRows(n), s"$n diverged under MergePercentiles")
      }
    }
  }
}
