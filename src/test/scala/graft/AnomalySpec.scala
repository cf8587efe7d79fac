package graft

import graft.ops.Anomaly
import org.apache.spark.sql.functions._

/** Hand-built-series contracts for the trailing-window anomaly flag (the
  * real-data path is oracle-gated by x97). */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  private def series(values: Seq[Long], key: String = "k") =
    values.zipWithIndex.map { case (v, i) => (key, i.toLong, v) }
      .toDF("k", "t", "v")

  test("a spike against a noisy trailing window flags; normal rows do not") {
    // 24 alternating 10/12 values (variance > 0), then a huge spike.
    val vals = (0 until 24).map(i => if (i % 2 == 0) 10L else 12L) :+ 100L
    val r = Anomaly.trailingAnomaly(series(vals), "k", "t", "v", 24, 3, 12)
      .orderBy("t").select("is_anomaly").as[Boolean].collect()
    assert(r.last, "the spike must flag")
    assert(!r.init.exists(identity), "no baseline row may flag")
  }

  test("constant trailing window: any deviation flags, equality never does") {
    val vals = Seq.fill(20)(5L) ++ Seq(5L, 6L)
    val r = Anomaly.trailingAnomaly(series(vals), "k", "t", "v", 24, 3, 12)
      .orderBy("t").select("v", "is_anomaly").as[(Long, Boolean)].collect()
    assert(!r(20)._2, "x == mean of a constant window is not an anomaly")
    assert(r(21)._2, "x != mean of a zero-variance window must flag")
  }

  test("rows with fewer than minWindow trailing observations report false, not NULL") {
    val r = Anomaly.trailingAnomaly(series(Seq(1L, 100L, 1L)), "k", "t", "v", 24, 3, 12)
      .orderBy("t").select("is_anomaly").as[Boolean].collect()
    assert(r.toSeq === Seq(false, false, false))
  }

  test("keys are independent: one series' spike never leaks into another") {
    val a = (0 until 24).map(i => ("a", i.toLong, if (i % 2 == 0) 10L else 12L)) :+ (("a", 24L, 100L))
    val b = (0 until 25).map(i => ("b", i.toLong, if (i % 2 == 0) 10L else 12L))
    val r = Anomaly.trailingAnomaly((a ++ b).toDF("k", "t", "v"), "k", "t", "v", 24, 3, 12)
      .filter(col("is_anomaly")).select("k", "t").as[(String, Long)].collect().toSeq
    assert(r === Seq(("a", 24L)))
  }
}
