package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Typed access to the star-schema parquet tables under a scale-factor
  * directory (see /root/repo/TESTDATA.md). Each accessor is a plain
  * `spark.read.parquet` so Catalyst sees the scan directly — filters and
  * projections written downstream push into the parquet reader (verified
  * via `.explain`: `PushedFilters`/`ReadSchema`).
  *
  * Scale posture: at 100 TB these would be partitioned/bucketed parquet
  * directories; nothing here assumes single-file layout — the path is a
  * directory-or-file glob that Spark resolves to any number of splits.
  *
  * Data model mirrors the reference warehouse (Sakila star; see
  * /root/reference/sql/sakila-schema.sql:44-345 for the source DDL):
  * customer geo chain customer->nation->region plays address->city->country,
  * orders+lineitem play rental+payment, part.p_type plays category.name.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")
  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default. We read nanos as long (legacy flag) and truncate to
    * micros with integer division — `ts div 1000`, NOT `/1000` (double
    * division is lossy above 2^52; epoch-nanos ≈ 1.7e18). This matches
    * DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) truncation bit-for-bit, which
    * the oracles rely on.
    *
    * The legacy flag is session-wide SQLConf (no per-read option exists);
    * the engine's own entry points (Verify/Bench/demos/test suite) set it
    * in their builders, and this defensive set covers externally-built
    * sessions. Side effect on other NANOS tables: they read as longs
    * instead of erroring — acceptable for this engine, documented here.
    */
  def events: DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
