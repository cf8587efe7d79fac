package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, processed per-partition in bounded batches — the Scala
  * analog of a Pandas-UDF / mapInPandas pipeline stage.
  *
  * The actual byte decode (JPEG → pixels, PCM → samples) is STUBBED — the
  * container ships no image/audio codecs — behind [[decodeStub]], a
  * deterministic fake that derives features purely from the bytes. What is
  * REAL and load-bearing for 100 TB:
  *
  *   - the schema contract (binary payload + typed metadata columns)
  *   - the per-partition batch shape: media rows flow through
  *     mapPartitions one partition at a time, so peak memory is one
  *     partition's payloads, not the table; repartition governs
  *     decode parallelism independently of file layout
  *   - feature output as fixed-width ARRAY<DOUBLE>, joinable back by key
  *
  * Swapping decodeStub for a real codec changes zero plan shape.
  */
object Multimodal {

  /** One media row: payload + metadata. In production the payload column
    * is read straight from parquet BINARY (or binaryFile source). */
  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Fixed feature width the stub emits (stands in for an image/audio
    * embedding dimension). */
  val FeatureDim = 4

  /** STUB decode: deterministic features from raw bytes — byte length,
    * first/last byte, and a simple rolling checksum. Replace with a real
    * codec call; signature and batch shape are the contract.
    */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    if (content.isEmpty) Array.fill(FeatureDim)(0.0)
    else {
      var rolling = 0L
      var i = 0
      while (i < content.length) {
        rolling = (rolling * 31 + (content(i) & 0xff)) & 0xffffffffL
        i += 1
      }
      Array(content.length.toDouble, (content(0) & 0xff).toDouble,
        (content(content.length - 1) & 0xff).toDouble, rolling.toDouble)
    }
  }

  /** Wrap a text table as a media table (the testdata has no binary
    * column; UTF-8 bytes stand in for an encoded payload). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** The mapInPandas-shaped stage: decode every payload in a partition,
    * emit (doc_id, features). `parallelism` controls decode fan-out
    * independently of upstream file splits — at scale this is where you
    * match partition count to codec cost.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart
      .mapPartitions { it => it.map(r => (r.doc_id, decodeStub(r.content))) }
      .toDF("doc_id", "features")
  }

  /** SQL-visible metadata pass over the binary column (no decode): byte
    * length + content digest. This is the part the DuckDB oracle checks.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("content")).as("byte_len"),
      sha2(col("content"), 256).as("content_sha256"))
}
