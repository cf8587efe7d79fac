package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto interchange format of LLM
  * training corpora (one JSON document per line, newline-delimited,
  * gzip-shardable). Spark's json datasource already IS line-delimited by
  * default; this wrapper pins the conventions that matter for a corpus
  * pipeline:
  *
  *   - explicit shard count on write (`repartition(shards)`) — training
  *     loaders want many same-sized shards, not one file per upstream
  *     partition; at scale, drop to the natural partitioning
  *   - timestamps in ISO-instant form at MICROSECOND precision — Spark's
  *     full timestamp resolution, so re-reads are lossless (millisecond
  *     formats silently truncate the low three digits)
  *   - reads take an EXPLICIT schema: schema inference over a 100 TB
  *     corpus is a full extra pass, and silently widens types (a doc_id
  *     that happens to look numeric in shard 1 must not change type when
  *     shard 2 disagrees); `readInferred` exists for ad-hoc exploration
  *   - malformed lines surface in a `_corrupt_record` column under
  *     PERMISSIVE mode rather than killing the job — the web-crawl
  *     reality where a bad line must quarantine, not abort
  */
object Jsonl {

  def write(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
  }

  /** Schema-pinned read (the production path). Note Spark's guard: a
    * query touching ONLY `_corrupt_record` over the raw scan is
    * disallowed — cache or persist the parsed frame before a
    * quarantine-count pass.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // No explicit timestampFormat on READ: Spark's default ISO-8601
      // parser accepts variable fraction lengths, so shards written with
      // millisecond precision (or by other producers) parse instead of
      // quarantining — a pinned .SSSSSS pattern here would disable the
      // lenient fallback and silently _corrupt_record every older shard.
      .json(path)

  /** Inference read for ad-hoc exploration only (extra full pass). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
