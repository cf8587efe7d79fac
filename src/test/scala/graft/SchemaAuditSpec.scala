package graft

import graft.io.Tables
import org.apache.spark.sql.functions._

/** Schema-drift tripwire (round-9 directive, VERDICT r8 #2).
  *
  * Round 8 lost 19 queries because the driver re-encoded events.parquet
  * (TIMESTAMP(NANOS) → plain timestamp[us]) and the loader assumed the old
  * physical layout. This suite makes the next upstream re-encode fail in ONE
  * named test instead of 19 anonymous bench rows:
  *
  *  - pins the resolved Spark logical type of every column of every table
  *    (post-loader, i.e. what the 191 queries actually see), and
  *  - proves `Tables.events` dispatches correctly on all three `ts` eras it
  *    supports (nanos-as-long, micros NTZ, UTC micros), yielding identical
  *    TimestampType values.
  */
class SchemaAuditSpec extends SparkSuite {

  private def resolved(name: String): String = {
    val t = Tables(spark, Sf)
    val df = name match {
      case "region"     => t.region
      case "nation"     => t.nation
      case "customer"   => t.customer
      case "supplier"   => t.supplier
      case "part"       => t.part
      case "orders"     => t.orders
      case "lineitem"   => t.lineitem
      case "events"     => t.events
      case "documents"  => t.documents
      case "embeddings" => t.embeddings
    }
    df.schema.simpleString
  }

  // The contract every downstream query compiles against. `events.ts` is
  // TimestampType BY CONSTRUCTION (the loader normalizes whatever era the
  // file is in); the raw-parquet NTZ dates on orders/lineitem are pinned
  // as-read because the oracle comparison is proven against them.
  private val expected = Map(
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer" -> ("struct<c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"),
    "supplier" -> "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part" -> ("struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double>"),
    "orders" -> ("struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>"),
    "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>"),
    "events" -> ("struct<event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string>"),
    "documents" -> "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>"
  )

  test("every table resolves to the pinned logical schema (drift tripwire)") {
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = resolved(name)
      if (got == want) None else Some(s"$name:\n  want $want\n  got  $got")
    }
    assert(drift.isEmpty,
      s"\nSCHEMA DRIFT — upstream re-encoded parquet; fix graft.io.Tables dispatch:\n" +
        drift.mkString("\n"))
  }

  test("events loader dispatches on all three ts encodings, same values") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-schema-audit")
    // One reference instant: 2024-03-01T12:34:56.789012 UTC (micros precision).
    val micros = 1709296496789012L

    def write(era: String)(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
      val dir = base.resolve(era)
      val df = Seq((1L, micros, 7L, "click", 1.5, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      mk(df).select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
      dir.toString
    }
    // Era 1: nanos-as-long (what spark.sql.legacy.parquet.nanosAsLong yields).
    val nanosDir = write("nanos")(_.withColumn("ts", col("us") * lit(1000L)))
    // Era 2: plain micros, isAdjustedToUTC=false → TIMESTAMP_NTZ on read.
    val ntzDir = write("ntz")(
      _.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz")))
    // Era 3: UTC-adjusted micros → TimestampType on read.
    val tzDir = write("tz")(_.withColumn("ts", timestamp_micros(col("us"))))

    val rows = Seq(nanosDir, ntzDir, tzDir).map { d =>
      val ev = Tables(spark, d).events
      assert(ev.schema("ts").dataType.typeName == "timestamp",
        s"loader must normalize ts to TimestampType, got ${ev.schema("ts").dataType} for $d")
      ev.select(unix_micros(col("ts"))).as[Long].head()
    }
    assert(rows.distinct == Seq(micros),
      s"all eras must decode to the same instant; got $rows")
  }
}
