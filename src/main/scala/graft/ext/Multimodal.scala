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

  /** Frame sampling: n evenly-spaced fixed-width byte windows per payload
    * — the video-frame / audio-clip extraction shape (1 row → n rows,
    * the cardinality-governing step of a media pipeline). Pure column
    * expressions (posexplode + binary substring), fully codegen'd; the
    * "frame" is a byte range because the container has no codecs — a
    * real build points the same windows at decoded frame offsets.
    * Payloads shorter than one frame yield their whole content as frame
    * 0. (Test-gated, not oracle-gated: DuckDB cannot slice or hash BLOBs,
    * so no SQL twin exists for binary windows.)
    */
  def frameSample(media: DataFrame, nFrames: Int, frameLen: Int): DataFrame = {
    require(nFrames > 0, "nFrames must be positive")
    require(frameLen > 0, "frameLen must be positive")
    val total = length(col("content"))
    // Even spacing over the slice-able range; 1-based substring offsets.
    val stride = greatest((total - frameLen).cast("double") /
      math.max(nFrames - 1, 1), lit(0.0))
    media
      .select(col("doc_id"), col("content"), total.as("byte_len"),
        posexplode(sequence(lit(0), lit(nFrames - 1))).as(Seq("frame_idx", "_f")))
      // Drop frames whose window start did not advance past the previous
      // frame's (short payloads): stride 0 keeps only frame 0, fractional
      // strides keep the distinct windows.
      .filter(col("frame_idx") === 0 ||
        floor(col("frame_idx") * stride) =!= floor((col("frame_idx") - 1) * stride))
      .select(col("doc_id"), col("frame_idx"),
        substring(col("content"),
          (floor(col("frame_idx") * stride) + 1).cast("int"), lit(frameLen)).as("frame"))
      .withColumn("frame_len", length(col("frame")))
  }

  /** "Resize" stage: deterministic byte-stride downsample of each payload
    * to at most targetBytes (every ceil(len/target)-th byte) — standing in
    * for image resize the way decodeStub stands in for decode. Runs in
    * the same mapPartitions batch shape as [[extractFeatures]] (resize is
    * a decode-adjacent CPU stage, not a column expression): peak memory
    * is one partition of payloads, parallelism set independently of file
    * splits.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, targetBytes: Int,
      parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        val step = math.max(1, (r.content.length + targetBytes - 1) / targetBytes)
        val out = Array.range(0, r.content.length, step).map(r.content)
        (r.doc_id, r.media_type, out, r.content.length, out.length)
      }
    }.toDF("doc_id", "media_type", "content", "orig_len", "resized_len")
  }
}
