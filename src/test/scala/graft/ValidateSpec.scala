package graft

import graft.io.Tables
import graft.model.{Profile, Schemas, Validate}
import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Constraint validation + streaming dedup/enrich additions. */
class ValidateSpec extends SparkSuite {
  import spark.implicits._

  test("the synthetic star data satisfies every declared constraint") {
    val violations = Validate.validateStar(Tables(spark, Sf))
    assert(violations.isEmpty, violations.mkString("; "))
  }

  test("injected violations are counted, not silently passed") {
    val bad = Seq((1L, "x"), (1L, "y"), (3L, null)).toDF("c_custkey", "c_name")
    assert(Validate.unique(bad, "t", Seq("c_custkey")).head.count === 1)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("c_name", StringType, nullable = false)))
    assert(Validate.notNull(bad, "t", schema).head.count === 1)
    val parent = Seq(1L).toDF("c_custkey")
    val child = Seq(1L, 2L, 2L).toDF("o_custkey")
    assert(Validate.foreignKey(child, "c", "o_custkey", parent, "c_custkey").head.count === 2)
    // SQL FK semantics: a NULL child key references nothing and is NOT
    // an orphan — a nullable optional reference must not fail the audit.
    val withNull = Seq[Option[Long]](Some(1L), Some(2L), Some(2L), None)
      .toDF("o_custkey")
    assert(Validate.foreignKey(withNull, "c", "o_custkey", parent, "c_custkey")
      .head.count === 2)
    val onlyNull = Seq[Option[Long]](None, None).toDF("o_custkey")
    assert(Validate.foreignKey(onlyNull, "c", "o_custkey", parent, "c_custkey")
      .isEmpty)
  }

  test("typed Dataset surface: compile-checked fields, same rows as the frames") {
    val o = graft.model.Typed.orders(spark, Sf)
    // o_totalprice is Option[Double] — the schema declares it nullable,
    // and the typed mirror must not be stricter than the declaration.
    assert(o.filter(_.o_totalprice.exists(_ > 0)).count() === o.count())
    val byStatus = o.groupByKey(_.o_orderstatus).count().collect().toMap
    assert(byStatus.values.sum === Tables(spark, Sf).orders.count())
  }

  private def ev(id: Long, t: String, user: Long, v: Double) =
    Event(id, java.sql.Timestamp.valueOf(t), user, "click", v)

  test("streaming dedup drops within-watermark duplicates") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[Event]
    src.addData(
      ev(1, "2024-01-01 00:00:00", 1, 5.0),
      ev(1, "2024-01-01 00:00:01", 1, 5.0), // duplicate event_id
      ev(2, "2024-01-01 00:01:00", 2, 7.0))
    val out = Streams.runToMemory(spark,
      Streams.dedupStream(src.toDF(), Seq("event_id")), "dedup_test", "append")
    assert(out.count() === 2)
  }

  test("stream-static enrichment attaches dimension rows per micro-batch") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_key", "tier")
    val src = MemoryStream[Event]
    src.addData(ev(1, "2024-01-01 00:00:00", 1, 5.0), ev(2, "2024-01-01 00:00:30", 9, 1.0))
    val out = Streams.runToMemory(spark,
      Streams.enrich(src.toDF(), dim, "user_id", "user_key"), "enrich_test", "append")
    val rows = out.select("event_id", "tier").as[(Long, Option[String])].collect().toMap
    assert(rows(1L) === Some("GOLD"))
    assert(rows(2L) === None) // unmatched user preserved by the left join
  }

  test("fdCheck: key FDs hold, non-FDs count violating groups, NULL lhs is a group") {
    val df = Seq(
      (Some(1), "a"), (Some(1), "a"),      // key 1 -> a (consistent)
      (Some(2), "a"), (Some(2), "b"),      // key 2 -> {a,b}: violates
      (None, "x"), (None, "y")             // NULL lhs with 2 rhs: violates
    ).toDF("k", "v")
    val r = Profile.fdCheck(df, "k", "v").collect()(0)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Long]("n_violating_groups") === 2L)
    assert(!r.getAs[Boolean]("holds"))
    val ok = Profile.fdCheck(df.filter($"k" === 1), "k", "v").collect()(0)
    assert(ok.getAs[Boolean]("holds") && ok.getAs[Long]("n_violating_groups") === 0L)
    // NULL rhs counts as a value: {NULL, 'a'} under one key violates (a
    // bare countDistinct would skip the NULL and report holds), and an
    // all-NULL-rhs group contributes 1 pair, keeping the documented
    // pairs == groups ⇔ holds equivalence intact.
    val nullRhs = Seq((1, Option("a")), (1, None: Option[String]),
      (2, None: Option[String])).toDF("k", "v")
    val nr = Profile.fdCheck(nullRhs, "k", "v").collect()(0)
    assert(nr.getAs[Long]("n_groups") === 2L)
    assert(nr.getAs[Long]("n_pairs") === 3L)
    assert(nr.getAs[Long]("n_violating_groups") === 1L)
    assert(!nr.getAs[Boolean]("holds"))
  }
}
