package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, processed per-partition in bounded batches — the Scala
  * analog of a Pandas-UDF / mapInPandas pipeline stage.
  *
  * The decode step is REAL for uncompressed formats: [[decodePpm]] is a
  * complete binary PPM (P6) parser, [[decodeBmp]] a 24-bit uncompressed
  * BMP parser, and [[decodeWav]] a RIFF/WAVE chunk-walking 16-bit PCM
  * parser — pure JVM, no codec dependency, all exact integer sample
  * recovery (round-trip-proven in the test suite). Compressed formats
  * (JPEG/PNG/MP3) have no codec in this container; payloads of those
  * types fall back to [[byteFeatures]], an honest bytes-only
  * featurization. What is load-bearing for 100 TB:
  *
  *   - the schema contract (binary payload + typed metadata columns)
  *   - the per-partition batch shape: media rows flow through
  *     mapPartitions one partition at a time, so peak memory is one
  *     partition's payloads, not the table; repartition governs
  *     decode parallelism independently of file layout
  *   - feature output as fixed-width ARRAY<DOUBLE>, joinable back by key
  *
  * Swapping in another codec changes zero plan shape.
  */
object Multimodal {

  /** One media row: payload + metadata. In production the payload column
    * is read straight from parquet BINARY (or binaryFile source). */
  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Fixed feature width [[extractFeatures]] emits (stands in for an
    * image/audio embedding dimension). */
  val FeatureDim = 4

  val PpmType = "image/x-portable-pixmap"
  val BmpType = "image/bmp"

  /** A decoded raster: interleaved RGB bytes, row-major from the top-left
    * (BMP's bottom-up storage is normalized on decode). */
  final case class RasterImage(width: Int, height: Int, maxval: Int, rgb: Array[Byte]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * 3
      ((rgb(i) & 0xff), (rgb(i + 1) & 0xff), (rgb(i + 2) & 0xff))
    }
  }

  /** REAL binary-PPM (P6) decoder — netpbm's published format: ASCII
    * header (magic, width, height, maxval, each separated by whitespace,
    * '#' comments running to end-of-line allowed BETWEEN header tokens),
    * then a single whitespace byte, then width*height*3 raw sample bytes.
    * A comment cannot follow maxval: the byte after the single separator
    * is raster by definition ('#' is a valid pixel value), matching
    * netpbm's own one-terminating-character parse. maxval > 255
    * (two-byte samples) is rejected rather than half-read.
    */
  def decodePpm(content: Array[Byte]): RasterImage = {
    var pos = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"PPM: $msg at byte $pos")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    // Skip whitespace and '#' comments (comment runs to end of line).
    def skipWs(): Unit = {
      var go = true
      while (go && pos < content.length) {
        if (isWs(content(pos))) pos += 1
        else if (content(pos) == '#') {
          while (pos < content.length && content(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      if (pos >= content.length || content(pos) < '0' || content(pos) > '9') fail("expected integer")
      var v = 0
      while (pos < content.length && content(pos) >= '0' && content(pos) <= '9') {
        v = v * 10 + (content(pos) - '0')
        if (v > 0x7fffff) fail("integer overflow")
        pos += 1
      }
      v
    }
    if (content.length < 2 || content(0) != 'P' || content(1) != '6') fail("bad magic (want P6)")
    pos = 2
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // Exactly ONE whitespace byte separates header and raster. No
    // comment handling here, and none is possible: raster bytes are
    // arbitrary (0x23 '#' and 0x0a '\n' are valid pixel values), so
    // anything after that single byte is pixel data by definition —
    // netpbm's own pm_getuint consumes exactly one terminating
    // character the same way. Comments are only unambiguous BETWEEN
    // header tokens, where readInt's skipWs handles them.
    if (pos >= content.length || !isWs(content(pos))) fail("missing raster separator")
    pos += 1
    // Long arithmetic: readInt caps each dim at 2^23, so w*h*3 can still
    // overflow Int and wrap the truncation guard into accepting.
    val need = w.toLong * h * 3L
    if (need > content.length.toLong - pos) fail(s"truncated raster: need $need, have ${content.length - pos}")
    RasterImage(w, h, maxval, java.util.Arrays.copyOfRange(content, pos, pos + need.toInt))
  }

  /** REAL 24-bit uncompressed BMP (BITMAPINFOHEADER) decoder: little-
    * endian header fields, BGR pixel order, rows padded to 4 bytes and
    * stored bottom-up (top-down when biHeight < 0) — all normalized to
    * the same top-left row-major RGB as [[decodePpm]].
    */
  def decodeBmp(content: Array[Byte]): RasterImage = {
    def fail(msg: String) = throw new IllegalArgumentException(s"BMP: $msg")
    def u16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
      ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    if (content.length < 54) fail("too short for headers")
    if (content(0) != 'B' || content(1) != 'M') fail("bad magic (want BM)")
    val dataOffset = i32(10)
    val headerSize = i32(14)
    if (headerSize < 40) fail(s"unsupported DIB header size $headerSize")
    val w = i32(18)
    val rawH = i32(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    if (u16(26) != 1) fail("bad plane count")
    val bpp = u16(28)
    if (bpp != 24) fail(s"unsupported bit depth $bpp (want 24)")
    if (i32(30) != 0) fail("compressed BMP not supported")
    if (w <= 0 || h == 0) fail(s"bad dimensions ${w}x$rawH")
    // A crafted negative/huge dataOffset would pass a subtraction-based
    // truncation check and then index out of (or before) the buffer.
    if (dataOffset < 54 || dataOffset > content.length) fail(s"bad data offset $dataOffset")
    if (w.toLong * h * 3L > Int.MaxValue - 64) fail(s"image too large: ${w}x$h")
    // Long arithmetic: the size guard above bounds w*h*3, not w*3 itself —
    // at h=1 a near-Int.MaxValue/3 width must reach the named failure, not
    // wrap the padded row width negative.
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (rowSizeL > Int.MaxValue) fail(s"row too wide: $w")
    val rowSize = rowSizeL.toInt
    if (content.length.toLong - dataOffset < rowSize.toLong * h) fail("truncated raster")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = content(s + 2)     // R (BMP stores BGR)
        rgb(d + 1) = content(s + 1) // G
        rgb(d + 2) = content(s)     // B
        x += 1
      }
      y += 1
    }
    RasterImage(w, h, 255, rgb)
  }

  /** Encode a raster as binary PPM (P6), with a comment line so decoders
    * must handle the full header grammar. Exact inverse of [[decodePpm]]. */
  def encodePpm(img: RasterImage): Array[Byte] = {
    val header = s"P6\n# graft synthetic raster\n${img.width} ${img.height}\n${img.maxval}\n"
      .getBytes(StandardCharsets.US_ASCII)
    header ++ img.rgb
  }

  /** Encode a raster as 24-bit bottom-up BMP. Exact inverse of [[decodeBmp]]. */
  def encodeBmp(img: RasterImage): Array[Byte] = {
    val rowSize = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowSize * img.height
    val out = new Array[Byte](54 + dataSize)
    def p16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + dataSize); p32(10, 54); p32(14, 40)
    p32(18, img.width); p32(22, img.height)
    p16(26, 1); p16(28, 24); p32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowSize
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  val WavType = "audio/wav"

  /** Decoded PCM audio: signed 16-bit samples, channel-interleaved. */
  final case class PcmAudio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Short])

  /** REAL RIFF/WAVE decoder for uncompressed 16-bit PCM — the published
    * RIFF container grammar: 'RIFF' + size + 'WAVE', then a chunk walk
    * (4-byte id, little-endian 4-byte size, payload, ODD SIZES PADDED to
    * even — the RIFF rule naive parsers skip); 'fmt ' must declare
    * audioFormat=1 (PCM) and 16 bits; unknown chunks (LIST, cue, fact…)
    * are skipped, not errors. Samples decode little-endian signed.
    */
  def decodeWav(content: Array[Byte]): PcmAudio = {
    def fail(msg: String) = throw new IllegalArgumentException(s"WAV: $msg")
    def u16(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
      ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(content, o, 4, StandardCharsets.US_ASCII)
    if (content.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") fail("bad RIFF/WAVE magic")
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmtSeen = false
    var data: Array[Short] = null
    while (pos + 8 <= content.length) {
      val id = tag(pos)
      val size = i32(pos + 4)
      // Bound check in LONG: a crafted size near Int.MaxValue would wrap
      // pos + 8 + size negative and slip past an Int comparison, then
      // allocate ~2 GB or index out of bounds (an OOM escapes the
      // NonFatal quarantine upstream). Same hardening as decodePpm/
      // decodeBmp. After this guard size <= length − pos − 8, so the
      // Int chunk-walk advance below cannot overflow.
      if (size < 0 || pos.toLong + 8L + size.toLong > content.length)
        fail(s"chunk '$id' overruns payload")
      val body = pos + 8
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          if (u16(body) != 1) fail(s"not PCM (audioFormat=${u16(body)})")
          channels = u16(body + 2)
          sampleRate = i32(body + 4)
          bits = u16(body + 14)
          if (channels < 1) fail(s"bad channel count $channels")
          if (bits != 16) fail(s"unsupported bit depth $bits (want 16)")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt")
          if (size % 2 != 0) fail("odd data size for 16-bit samples")
          data = new Array[Short](size / 2)
          var i = 0
          while (i < data.length) {
            data(i) = ((content(body + 2 * i) & 0xff) |
              ((content(body + 2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
        case _ => // unknown chunk: skip
      }
      pos = body + size + (size & 1) // RIFF pads odd chunks to even
    }
    if (!fmtSeen) fail("missing fmt chunk")
    if (data == null) fail("missing data chunk")
    PcmAudio(sampleRate, channels, bits, data)
  }

  /** Encode mono signed-16 PCM as a RIFF/WAVE file, with a junk 'LIST'
    * chunk of ODD size before 'data' so decoders must implement the
    * RIFF even-padding rule. Exact inverse of [[decodeWav]]. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val junk = "graft".getBytes(StandardCharsets.US_ASCII) // odd length: 5
    val junkPadded = junk.length + (junk.length & 1)
    val dataSize = samples.length * 2
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putTag(t: String): Unit = {
      System.arraycopy(t.getBytes(StandardCharsets.US_ASCII), 0, out, pos, 4); pos += 4
    }
    def p16(v: Int): Unit = { out(pos) = v.toByte; out(pos + 1) = (v >> 8).toByte; pos += 2 }
    def p32(v: Int): Unit = {
      out(pos) = v.toByte; out(pos + 1) = (v >> 8).toByte
      out(pos + 2) = (v >> 16).toByte; out(pos + 3) = (v >> 24).toByte; pos += 4
    }
    putTag("RIFF"); p32(riffSize); putTag("WAVE")
    putTag("fmt "); p32(16); p16(1); p16(1); p32(sampleRate)
    p32(sampleRate * 2); p16(2); p16(16)
    putTag("LIST"); p32(junk.length)
    System.arraycopy(junk, 0, out, pos, junk.length); pos += junkPadded
    putTag("data"); p32(dataSize)
    var i = 0
    while (i < samples.length) {
      out(pos) = samples(i).toByte; out(pos + 1) = (samples(i) >> 8).toByte
      pos += 2; i += 1
    }
    out
  }

  /** Synthetic WAV per document: 8·`blocks` signed-16 samples where
    * sample 8b+j is the big-endian 16-bit value at hex offset 4j of
    * md5("wav_<doc_id>_<b>") (two's-complement signed) — the same
    * engine-neutral generator convention as [[syntheticImages]], so the
    * DuckDB oracle replays the encode → REAL RIFF decode → stats loop
    * from the digests alone.
    */
  def syntheticWavs(docs: DataFrame, blocks: Int = 32,
      sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val samples = new Array[Short](blocks * 8)
        var b = 0
        while (b < blocks) {
          val d = md.digest(s"wav_${id}_${b}".getBytes(StandardCharsets.US_ASCII))
          var j = 0
          while (j < 8) {
            samples(b * 8 + j) = (((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)).toShort
            j += 1
          }
          b += 1
        }
        (id, WavType, encodeWav(sampleRate, samples))
      }
    }.toDF("doc_id", "media_type", "content")
  }

  /** Deterministic integer audio statistics via REAL RIFF decode:
    * sample count/rate, amplitude sum, energy (sum of squares), and
    * peak |amplitude| — all BIGINT-exact, so the oracle replays the
    * generator arithmetic; only a correct walk of the chunk grammar
    * (including the odd-size LIST pad) reproduces the numbers.
    */
  def audioStats(spark: SparkSession, media: DataFrame, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        if (r.media_type != WavType)
          throw new IllegalArgumentException(s"no audio decoder for ${r.media_type}")
        val pcm = decodeWav(r.content)
        var sum = 0L; var sumSq = 0L; var peak = 0L
        var i = 0
        while (i < pcm.samples.length) {
          val v = pcm.samples(i).toLong
          sum += v; sumSq += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        (r.doc_id, pcm.samples.length.toLong, pcm.sampleRate.toLong,
          pcm.channels.toLong, sum, sumSq, peak)
      }
    }.toDF("doc_id", "n_samples", "sample_rate", "channels", "sum_amp", "sum_sq", "peak")
  }

  /** Frame-level audio activity segmentation — the VAD-style gate an
    * audio-curation pipeline runs before transcription (how much of the
    * clip is signal, in how many bursts, and how long is the longest
    * one). REAL RIFF decode → per-frame energy (Σv², exact BIGINT over
    * `frameSize`-sample frames) → a frame is ACTIVE iff its energy is at
    * least the clip mean (energy·n_frames ≥ total_energy — the integer
    * cross-multiplied compare, so the threshold needs no division and no
    * float ever enters the decision) → run-length segmentation via
    * per-clip lag windows.
    *
    * Scale: decode+energy is one mapPartitions pass emitting frame rows
    * (linear in audio length); everything after is per-clip partitioned
    * windows and keyed aggregates — no global window, no pair join.
    *
    * A clip shorter than `frameSize` has zero complete frames; it still
    * appears in the output (n_frames = n_active = n_segments =
    * longest_run = 0, active_ratio NULL) rather than silently vanishing
    * — the report is keyed by the INPUT docs via a left join, so every
    * submitted clip is accounted for (round-10 advice: the frame-derived
    * grain used to drop such clips, and the synthetic corpus's fixed
    * 256-sample clips could never expose it).
    */
  def audioActivity(spark: SparkSession, media: DataFrame, frameSize: Int = 8,
      parallelism: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    val frames = repart.flatMap { r =>
      if (r.media_type != WavType)
        throw new IllegalArgumentException(s"no audio decoder for ${r.media_type}")
      val pcm = decodeWav(r.content)
      val nF = pcm.samples.length / frameSize
      (0 until nF).map { f =>
        var e = 0L
        var j = 0
        while (j < frameSize) {
          val v = pcm.samples(f * frameSize + j).toLong
          e += v * v
          j += 1
        }
        (r.doc_id, f.toLong, e)
      }
    }.toDF("doc_id", "frame", "energy")
    val tot = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("energy")).as("tot_e"))
    val w = Window.partitionBy("doc_id").orderBy("frame")
    val marked = frames.join(tot, Seq("doc_id"))
      .withColumn("active", col("energy") * col("n_frames") >= col("tot_e"))
      .withColumn("seg_start",
        (col("active") && !coalesce(lag(col("active"), 1).over(w), lit(false)))
          .cast("long"))
      .withColumn("run_id", sum(col("seg_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val perDoc = marked.groupBy("doc_id")
      .agg(max(col("n_frames")).as("n_frames"),
        sum(col("active").cast("long")).as("n_active"),
        sum(col("seg_start")).as("n_segments"))
    val longest = marked.filter(col("active"))
      .groupBy("doc_id", "run_id").agg(count(lit(1)).as("len"))
      .groupBy("doc_id").agg(max(col("len")).as("longest_run"))
    val report = perDoc.join(longest, Seq("doc_id"), "left")
    media.select(col("doc_id")).join(report, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        round(col("n_active").cast("double") / col("n_frames").cast("double"), 6)
          .as("active_ratio"))
      .orderBy("doc_id")
  }

  /** Fallback featurization for payload types with no decoder in this
    * container (compressed images, audio): deterministic features from
    * raw bytes — byte length, first/last byte, and a rolling checksum.
    */
  def byteFeatures(content: Array[Byte]): Array[Double] = {
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

  /** Decode dispatch: real raster decode for the formats we parse, byte
    * features otherwise. Image features: width, height, mean luma
    * (integer Rec.601 in thousandths, exact), maxval.
    */
  def decode(mediaType: String, content: Array[Byte]): Array[Double] = mediaType match {
    case PpmType | BmpType =>
      val img = if (mediaType == PpmType) decodePpm(content) else decodeBmp(content)
      var lumaSum = 0L
      var i = 0
      while (i < img.rgb.length) {
        lumaSum += (299L * (img.rgb(i) & 0xff) + 587L * (img.rgb(i + 1) & 0xff) +
          114L * (img.rgb(i + 2) & 0xff)) / 1000L
        i += 3
      }
      Array(img.width.toDouble, img.height.toDouble,
        (lumaSum / (img.width.toLong * img.height)).toDouble, img.maxval.toDouble)
    case _ => byteFeatures(content)
  }

  /** Wrap a text table as a media table (the testdata has no binary
    * column; UTF-8 bytes stand in for an encoded payload). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** The mapInPandas-shaped stage: decode every payload in a partition,
    * emit (doc_id, features, decode_ok). `parallelism` controls decode
    * fan-out independently of upstream file splits — at scale this is
    * where you match partition count to codec cost. Raster payloads go
    * through the REAL decoders; everything else through [[byteFeatures]].
    *
    * Per-record quarantine: a MALFORMED payload of a known raster type
    * degrades to [[byteFeatures]] with decode_ok=false instead of
    * throwing — one corrupt record out of 100 TB must not fail its whole
    * stage (the same contract Jsonl.read keeps via _corrupt_record; the
    * flag is the filter for a quarantine sink).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart
      .mapPartitions { it =>
        it.map { r =>
          // NULL payloads and ANY per-record decoder escape (not just the
          // decoders' named IllegalArgumentException — a crafted payload
          // tripping an unguarded index must not kill the stage either)
          // degrade to the bytes-only fallback.
          val content = if (r.content == null) Array.emptyByteArray else r.content
          try (r.doc_id, decode(r.media_type, content), r.content != null)
          catch { case scala.util.control.NonFatal(_) =>
            (r.doc_id, byteFeatures(content), false)
          }
        }
      }
      .toDF("doc_id", "features", "decode_ok")
  }

  /** Synthetic raster per document: pixel (x,y)'s RGB is the first three
    * bytes of md5("img_<doc_id>_<y>_<x>") — an engine-neutral generator
    * the DuckDB oracle replays from the hex digest, so the encode → REAL
    * decode → pixel-stat loop is gated end to end. Encoded as PPM or BMP
    * per `fmt`; either way [[imageStats]] must actually parse the bytes
    * to get the pixels back.
    */
  def syntheticImages(docs: DataFrame, width: Int = 8, height: Int = 8,
      fmt: String = PpmType): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val rgb = new Array[Byte](width * height * 3)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val d = md.digest(s"img_${id}_${y}_${x}".getBytes(StandardCharsets.US_ASCII))
            val i = (y * width + x) * 3
            rgb(i) = d(0); rgb(i + 1) = d(1); rgb(i + 2) = d(2)
            x += 1
          }
          y += 1
        }
        val img = RasterImage(width, height, 255, rgb)
        (id, fmt, if (fmt == PpmType) encodePpm(img) else encodeBmp(img))
      }
    }.toDF("doc_id", "media_type", "content")
  }

  /** Deterministic integer pixel statistics via REAL decode: dimensions,
    * per-channel sums, and a 4-bucket luma histogram (Rec.601 integer
    * luma, buckets of 64). Exact integers end to end, so the DuckDB
    * oracle matches bit-for-bit by replaying the generator arithmetic —
    * the decode itself has no SQL twin, which is the point: only a
    * correct parse of the PPM/BMP bytes reproduces the numbers.
    */
  def imageStats(spark: SparkSession, media: DataFrame, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        val img = r.media_type match {
          case PpmType => decodePpm(r.content)
          case BmpType => decodeBmp(r.content)
          case t => throw new IllegalArgumentException(s"no raster decoder for $t")
        }
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](4)
        var i = 0
        while (i < img.rgb.length) {
          val pr = img.rgb(i) & 0xff
          val pg = img.rgb(i + 1) & 0xff
          val pb = img.rgb(i + 2) & 0xff
          sr += pr; sg += pg; sb += pb
          hist(((299L * pr + 587L * pg + 114L * pb) / 1000L).toInt / 64) += 1
          i += 3
        }
        (r.doc_id, img.width, img.height, img.maxval, sr, sg, sb,
          s"${hist(0)},${hist(1)},${hist(2)},${hist(3)}")
      }
    }.toDF("doc_id", "width", "height", "maxval", "sum_r", "sum_g", "sum_b", "luma_hist")
  }

  /** Nearest-neighbor raster resize — the standard thumbnail/normalize
    * step before batching images into a training pipeline, in exact
    * integer form: target pixel (ty, tx) copies source pixel
    * (ty·H div newH, tx·W div newW) (floor mapping, the canonical NN
    * convention). No interpolation means no float filter kernel to
    * disagree about across engines — an oracle can replay the index
    * arithmetic exactly, which is what makes a resize GATEABLE here.
    */
  def resizeNearest(img: RasterImage, newW: Int, newH: Int): RasterImage = {
    require(newW > 0 && newH > 0, s"target dims must be positive: ${newW}x$newH")
    val out = new Array[Byte](newW * newH * 3)
    var ty = 0
    while (ty < newH) {
      val sy = ty * img.height / newH
      var tx = 0
      while (tx < newW) {
        val sx = tx * img.width / newW
        val si = (sy * img.width + sx) * 3
        val di = (ty * newW + tx) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1)
        out(di + 2) = img.rgb(si + 2)
        tx += 1
      }
      ty += 1
    }
    RasterImage(newW, newH, img.maxval, out)
  }

  /** [[imageStats]] of the [[resizeNearest]]-ed raster: REAL decode →
    * integer NN resample → exact per-channel sums + luma histogram of
    * the TARGET raster, with the source dimensions carried for audit.
    * Non-divisor targets (8×8 → 5×3 in the x222 gate) exercise the
    * floor index mapping: a one-off in either axis shifts which source
    * pixels survive and flips the hash. Same scale shape as imageStats:
    * one mapPartitions decode pass, rows:images 1:1, no shuffle.
    */
  def resizeStats(spark: SparkSession, media: DataFrame,
      newW: Int = 5, newH: Int = 3, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        val src = r.media_type match {
          case PpmType => decodePpm(r.content)
          case BmpType => decodeBmp(r.content)
          case t => throw new IllegalArgumentException(s"no raster decoder for $t")
        }
        val img = resizeNearest(src, newW, newH)
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](4)
        var i = 0
        while (i < img.rgb.length) {
          val pr = img.rgb(i) & 0xff
          val pg = img.rgb(i + 1) & 0xff
          val pb = img.rgb(i + 2) & 0xff
          sr += pr; sg += pg; sb += pb
          hist(((299L * pr + 587L * pg + 114L * pb) / 1000L).toInt / 64) += 1
          i += 3
        }
        (r.doc_id, src.width, src.height, img.width, img.height, sr, sg, sb,
          s"${hist(0)},${hist(1)},${hist(2)},${hist(3)}")
      }
    }.toDF("doc_id", "src_width", "src_height", "width", "height",
      "sum_r", "sum_g", "sum_b", "luma_hist")
  }

  val FramesType = "video/x-graft-frames"

  /** Minimal multi-frame container ("video" for pipeline purposes):
    * magic "GVF1", big-endian frame count, then length-prefixed PPM
    * frames. Real container plumbing — magic check, bounds-checked
    * lengths (the WAV lesson: sizes validated in Long BEFORE any
    * allocation, so a crafted count/length fails loudly instead of
    * OOMing an executor), per-frame decode through the real PPM parser.
    */
  def encodeFrames(frames: Seq[RasterImage]): Array[Byte] = {
    require(frames.nonEmpty, "a frame container needs at least one frame")
    val encoded = frames.map(encodePpm)
    val bb = java.nio.ByteBuffer.allocate(8 + encoded.map(_.length + 4).sum)
    bb.put("GVF1".getBytes(StandardCharsets.US_ASCII)).putInt(frames.size)
    encoded.foreach { e => bb.putInt(e.length); bb.put(e) }
    bb.array()
  }

  /** Parse the container into raw frame byte slices (decode is the
    * caller's per-frame step — sampling wants to SKIP frames without
    * paying their decode, which is the point of frame sampling). */
  def decodeFrameSlices(content: Array[Byte]): Vector[Array[Byte]] = {
    require(content.length >= 8, "frame container truncated before header")
    val bb = java.nio.ByteBuffer.wrap(content)
    val magic = new Array[Byte](4); bb.get(magic)
    require(new String(magic, StandardCharsets.US_ASCII) == "GVF1",
      "not a GVF1 frame container")
    val n = bb.getInt
    require(n > 0 && n.toLong * 4L <= content.length.toLong,
      s"frame count $n impossible for ${content.length} bytes")
    (0 until n).map { _ =>
      require(bb.remaining >= 4, "frame container truncated at a length prefix")
      val len = bb.getInt
      require(len > 0 && len.toLong <= bb.remaining.toLong,
        s"frame length $len exceeds remaining ${bb.remaining} bytes")
      val slice = new Array[Byte](len); bb.get(slice); slice
    }.toVector
  }

  /** Synthetic frame-sequence corpus: `frames` rasters per document,
    * frame f's pixels md5-derived from (doc, f, y, x) — the same
    * generator-replay gating as [[syntheticImages]], one more dimension.
    */
  def syntheticVideos(docs: DataFrame, frames: Int = 6,
      width: Int = 4, height: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val fs = (0 until frames).map { f =>
          val rgb = new Array[Byte](width * height * 3)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val d = md.digest(
                s"vid_${id}_${f}_${y}_${x}".getBytes(StandardCharsets.US_ASCII))
              val i = (y * width + x) * 3
              rgb(i) = d(0); rgb(i + 1) = d(1); rgb(i + 2) = d(2)
              x += 1
            }
            y += 1
          }
          RasterImage(width, height, 255, rgb)
        }
        (id, FramesType, encodeFrames(fs))
      }
    }.toDF("doc_id", "media_type", "content")
  }

  /** Frame sampling + per-doc stats — the "don't decode every frame"
    * step a video-ingest pipeline runs before feature extraction: parse
    * the container, decode ONLY frames 0, stride, 2·stride, … through
    * the real PPM parser, and aggregate exact integer channel sums and
    * the luma histogram over the sampled frames. Skipped frames are
    * never decoded (slices stay raw bytes) — the I/O-shape claim frame
    * sampling exists to make. One mapPartitions pass, rows:videos 1:1.
    */
  def frameSampleStats(spark: SparkSession, media: DataFrame,
      stride: Int = 2, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        require(r.media_type == FramesType, s"not a frame container: ${r.media_type}")
        val slices = decodeFrameSlices(r.content)
        val sampled = slices.indices.by(stride).map(i => decodePpm(slices(i)))
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](4)
        sampled.foreach { img =>
          var i = 0
          while (i < img.rgb.length) {
            val pr = img.rgb(i) & 0xff
            val pg = img.rgb(i + 1) & 0xff
            val pb = img.rgb(i + 2) & 0xff
            sr += pr; sg += pg; sb += pb
            hist(((299L * pr + 587L * pg + 114L * pb) / 1000L).toInt / 64) += 1
            i += 3
          }
        }
        (r.doc_id, slices.size.toLong, sampled.size.toLong, sr, sg, sb,
          s"${hist(0)},${hist(1)},${hist(2)},${hist(3)}")
      }
    }.toDF("doc_id", "n_frames", "n_sampled",
      "sum_r", "sum_g", "sum_b", "luma_hist")
  }

  /** Synthetic near-duplicate image corpus: documents sharing
    * `doc_id % groups` render the SAME md5-derived base raster, each
    * copy uniformly brightness-shifted by `(doc_id / groups) % offsetMod`
    * — the canonical "same photo, different exposure" near-dup family a
    * perceptual hash must collapse and a byte/content hash cannot.
    * Channels scale into [0, 223] before the +0..31 shift so no value
    * clamps (clamping would break the shift's uniformity). Encoded to
    * real PPM bytes; the x209 oracle replays this generator arithmetic,
    * so only a correct decode + hash reproduces the buckets.
    */
  def syntheticNearDupImages(docs: DataFrame, groups: Int = 64,
      offsetMod: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val grp = id % groups
        val off = ((id / groups) % offsetMod).toInt
        val rgb = new Array[Byte](8 * 8 * 3)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val d = md.digest(s"img_${grp}_${y}_${x}".getBytes(StandardCharsets.US_ASCII))
            val i = (y * 8 + x) * 3
            rgb(i) = (((d(0) & 0xff) * 7) / 8 + off).toByte
            rgb(i + 1) = (((d(1) & 0xff) * 7) / 8 + off).toByte
            rgb(i + 2) = (((d(2) & 0xff) * 7) / 8 + off).toByte
            x += 1
          }
          y += 1
        }
        (id, PpmType, encodePpm(RasterImage(8, 8, 255, rgb)))
      }
    }.toDF("doc_id", "media_type", "content")
  }

  /** 56-bit difference hash (dHash — the standard perceptual image
    * fingerprint): Rec.601 integer luma per pixel, one bit per
    * horizontally-adjacent pair (bit set iff the right pixel is
    * brighter), row-major bit positions y*7+x over the 8×8 raster. A
    * UNIFORM brightness shift moves every luma by exactly the same
    * integer ((299+587+114)·off / 1000 = off), so all comparisons — and
    * the hash — are invariant: exposure-shifted copies collide while a
    * content/byte hash separates them. 56 bits keep the value positive
    * in a BIGINT on both engines.
    */
  def dHash56(img: RasterImage): Long = {
    require(img.width == 8 && img.height == 8,
      s"dHash56 expects an 8x8 raster, got ${img.width}x${img.height}")
    def luma(x: Int, y: Int): Long = {
      val i = (y * img.width + x) * 3
      (299L * (img.rgb(i) & 0xff) + 587L * (img.rgb(i + 1) & 0xff)
        + 114L * (img.rgb(i + 2) & 0xff)) / 1000L
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Perceptual image deduplication over the binary media column: REAL
    * decode → [[dHash56]] → hash-bucket dedup with keep-first semantics
    * (the SemDeDup x174 decision shape, in pixel space instead of
    * embedding space). Output is the per-bucket report: image count,
    * the kept doc, drops.
    *
    * Scale: decode + hash are one mapPartitions pass (bounded by one
    * partition's payloads); dedup is a single hash groupBy — no pair
    * join at any point, so a burst of exposure-shifted copies of one
    * image costs one hot reducer key, never a quadratic candidate set.
    */
  def perceptualDedup(spark: SparkSession, media: DataFrame,
      parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    repart.mapPartitions { it =>
      it.map { r =>
        val img = r.media_type match {
          case PpmType => decodePpm(r.content)
          case BmpType => decodeBmp(r.content)
          case t => throw new IllegalArgumentException(s"no raster decoder for $t")
        }
        (r.doc_id, dHash56(img))
      }
    }.toDF("doc_id", "dhash")
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_images"),
        min(col("doc_id")).as("keeper_doc_id"),
        (count(lit(1)) - 1).as("n_dropped"))
      .orderBy("dhash")
  }

  /** Synthetic near-duplicate corpus WITH sub-perceptual noise — the
    * [[syntheticNearDupImages]] family plus a deterministic single-pixel
    * perturbation on alternate copies (`(doc_id / groups) % 2 = 1`):
    * channels scale into [0, 191] (headroom for shift + bump, so nothing
    * ever clamps), the uniform brightness shift stays, and perturbed
    * copies additionally bump ONE group-derived pixel's channels by +24
    * — a +24 integer luma change at that pixel, which flips at most the
    * two horizontal comparisons touching it. The result: each group
    * carries two dHash values at Hamming distance 0–2 — the "same photo,
    * slight crop/noise" family an EXACT perceptual bucket (x209) cannot
    * collapse and the banded near-dup join (x212) must.
    */
  def syntheticNoisyImages(docs: DataFrame, groups: Int = 64,
      offsetMod: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val grp = id % groups
        val off = ((id / groups) % offsetMod).toInt
        val noisy = (id / groups) % 2 == 1
        val (px, py) = ((grp % 8).toInt, ((grp / 8) % 8).toInt)
        val rgb = new Array[Byte](8 * 8 * 3)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val d = md.digest(s"img_${grp}_${y}_${x}".getBytes(StandardCharsets.US_ASCII))
            val bump = if (noisy && x == px && y == py) 24 else 0
            val i = (y * 8 + x) * 3
            rgb(i) = (((d(0) & 0xff) * 3) / 4 + off + bump).toByte
            rgb(i + 1) = (((d(1) & 0xff) * 3) / 4 + off + bump).toByte
            rgb(i + 2) = (((d(2) & 0xff) * 3) / 4 + off + bump).toByte
            x += 1
          }
          y += 1
        }
        (id, PpmType, encodePpm(RasterImage(8, 8, 255, rgb)))
      }
    }.toDF("doc_id", "media_type", "content")
  }

  /** Near-duplicate pairs over distinct dHash values — the banded
    * Hamming-ball join on (dhash, n_images, keeper_doc_id) group rows.
    * Pigeonhole banding: the 56-bit hash splits into `maxHamming + 1`
    * disjoint segments, so two hashes within Hamming `maxHamming` agree
    * on AT LEAST one whole segment — an equi-join per segment surfaces
    * every such pair (recall 1 by construction, before the cap), and
    * exact `bit_count(a XOR b)` verifies candidates only. The x66
    * hot-bucket cap guards the segment join: buckets wider than
    * `bucketCap` are dropped before pairing, bounding per-segment
    * candidate volume at N·cap/2 under any hash distribution.
    */
  private[graft] def nearDupHashPairs(groups: DataFrame, maxHamming: Int,
      bucketCap: Int): DataFrame = {
    require(maxHamming >= 1 && 56 % (maxHamming + 1) == 0,
      s"maxHamming+1 must divide 56 (1, 3, 6, 7, 13, 27, 55); got $maxHamming")
    val nSegs = maxHamming + 1
    val segBits = 56 / nSegs
    val segKeys = (0 until nSegs).map { s =>
      struct(lit(s).as("seg_idx"),
        (expr(s"dhash div ${1L << (segBits * s)}") % lit(1L << segBits))
          .as("seg_key"))
    }
    val segs = groups.select(col("dhash"),
        explode(array(segKeys: _*)).as("sk"))
      .select(col("dhash"), col("sk.seg_idx").as("seg_idx"),
        col("sk.seg_key").as("seg_key"))
    val capped = segs
      .withColumn("_w", count(lit(1)).over(
        Window.partitionBy("seg_idx", "seg_key")))
      .filter(col("_w") <= bucketCap)
      .drop("_w")
    val cand = capped.select(col("seg_idx"), col("seg_key"), col("dhash").as("dhash_a"))
      .join(capped.select(col("seg_idx"), col("seg_key"), col("dhash").as("dhash_b")),
        Seq("seg_idx", "seg_key"))
      .filter(col("dhash_a") < col("dhash_b"))
      .select("dhash_a", "dhash_b").distinct()
    val g = groups.select(col("dhash"), col("n_images"), col("keeper_doc_id"))
    cand
      .withColumn("hamming",
        expr("bit_count(dhash_a ^ dhash_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .join(g.select(col("dhash").as("dhash_a"), col("n_images").as("n_images_a"),
        col("keeper_doc_id").as("keeper_a")), Seq("dhash_a"))
      .join(g.select(col("dhash").as("dhash_b"), col("n_images").as("n_images_b"),
        col("keeper_doc_id").as("keeper_b")), Seq("dhash_b"))
      .select(col("dhash_a"), col("dhash_b"), col("hamming"),
        col("n_images_a"), col("n_images_b"), col("keeper_a"), col("keeper_b"))
  }

  /** Near-duplicate perceptual image dedup (x212) — the Hamming-ball
    * extension of [[perceptualDedup]]: REAL decode → [[dHash56]] →
    * exact-hash grouping (the x209 step, collapsing exposure-shifted
    * copies to ONE row per distinct hash) → banded Hamming ≤ `maxHamming`
    * join over the DISTINCT hashes via [[nearDupHashPairs]]. Without
    * this second stage a one-bit hash flip (crop, noise, re-encode)
    * defeats the dedup — the image analog of MinHash-LSH's band join,
    * with the same pigeonhole recall guarantee and hot-bucket cap.
    *
    * Scale: grouping first is what makes the pair join safe — segment
    * buckets hold distinct HASHES, bounded by content diversity, so a
    * million exposure-shifted copies of one image still contribute ONE
    * row to candidate generation (they cost one hot reducer key in the
    * groupBy, never a quadratic candidate set).
    */
  def perceptualNearDedup(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, bucketCap: Int = 64,
      parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val rows: Dataset[MediaRow] = media.as[MediaRow]
    val repart = if (parallelism > 0) rows.repartition(parallelism) else rows
    val groups = repart.mapPartitions { it =>
      it.map { r =>
        val img = r.media_type match {
          case PpmType => decodePpm(r.content)
          case BmpType => decodeBmp(r.content)
          case t => throw new IllegalArgumentException(s"no raster decoder for $t")
        }
        (r.doc_id, dHash56(img))
      }
    }.toDF("doc_id", "dhash")
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("keeper_doc_id"))
    nearDupHashPairs(groups, maxHamming, bucketCap)
      .orderBy("dhash_a", "dhash_b")
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
    * for image resize the way byteFeatures stands in for codec-less
    * decode (a real raster resize would decode via [[decodePpm]] /
    * [[decodeBmp]], resample, and re-encode — same batch shape). Runs in
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
