package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** The events table's `ts` column has shipped under several physical
    * parquet encodings across upstream regenerations — TIMESTAMP(NANOS)
    * (arrives as long under `spark.sql.legacy.parquet.nanosAsLong`), plain
    * `timestamp[us]` with isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ),
    * and UTC-adjusted micros (arrives as TimestampType). A 100 TB lake WILL
    * contain mixed encodings, so we dispatch on the OBSERVED resolved type
    * rather than assuming one era's layout; every branch normalizes to
    * session-zone TimestampType (the session runs UTC, so NTZ→TZ is a
    * value-preserving relabel).
    *
    * Nanos branch: truncate with integer division — `ts div 1000`, NOT
    * `/1000` (double division is lossy above 2^52; epoch-nanos ≈ 1.7e18).
    * Matches DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) bit-for-bit.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType        => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _               => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
