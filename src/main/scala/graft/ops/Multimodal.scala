package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode kernel does REAL container-level parsing — PNG signature +
  * chunk walk + big-endian IHDR dims, JPEG marker scan to the SOF frame
  * header — over genuine binary streams (from [[readMediaDir]]'s
  * `binaryFile` source or [[syntheticMediaTable]]'s expression-built
  * payloads). What it deliberately does NOT do is pixel decode: zlib/DCT
  * codecs are out of scope in this environment, and the per-partition
  * `mapPartitions` boundary is exactly where a native decoder (JNI/FFI)
  * would amortize its setup at 100 TB.
  */
object Multimodal {

  /** Typed result of the media decode. `width`/`height` are −1 for an
    * unrecognized container; `f0..f3` are the first four content bytes
    * (first IDAT chunk for PNG, post-SOF stream for JPEG, start of payload
    * otherwise) — the "feature" a real extractor would derive from content.
    */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** Parsed container header: dims + offset of the first content byte. */
  case class MediaHeader(width: Long, height: Long, contentOffset: Int)

  private val PngSignature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be16(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 8) | (b(off + 1) & 0xffL)

  /** PNG (ISO/IEC 15948 §5): 8-byte signature, IHDR first chunk with
    * big-endian u32 width/height at offsets 16/20, then a chunk walk
    * (length + type + data + CRC) to the first IDAT. CRCs are not
    * validated (a pixel decoder would; header extraction doesn't need to).
    */
  def parsePng(bytes: Array[Byte]): Option[MediaHeader] = {
    if (bytes.length < 33) return None
    var s = 0
    while (s < 8) { if (bytes(s) != PngSignature(s)) return None; s += 1 }
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R'))
      return None
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    var i = 8
    while (i + 8 <= bytes.length) {
      val len = be32(bytes, i)
      if (bytes(i + 4) == 'I' && bytes(i + 5) == 'D' &&
          bytes(i + 6) == 'A' && bytes(i + 7) == 'T')
        return Some(MediaHeader(w, h, i + 8))
      if (bytes(i + 4) == 'I' && bytes(i + 5) == 'E' &&
          bytes(i + 6) == 'N' && bytes(i + 7) == 'D')
        return Some(MediaHeader(w, h, bytes.length)) // no image data
      if (len < 0 || len > bytes.length) return Some(MediaHeader(w, h, bytes.length))
      i += 8 + len.toInt + 4
    }
    Some(MediaHeader(w, h, bytes.length))
  }

  /** JPEG (ITU-T T.81): SOI then marker segments; dims live in the first
    * SOF frame header (big-endian u16 height at +5, width at +7 within the
    * segment); content starts after that segment. SOF markers are C0–CF
    * minus C4 (DHT), C8 (JPG extension), CC (DAC).
    */
  def parseJpeg(bytes: Array[Byte]): Option[MediaHeader] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None // lost marker sync
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xd9) {
        return None // EOI before any frame header
      } else {
        val len = be16(bytes, i + 2).toInt
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= bytes.length) return None
          return Some(MediaHeader(be16(bytes, i + 7), be16(bytes, i + 5), i + 2 + len))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Container-dispatching decode: PNG, then JPEG, then opaque fallback
    * (dims −1, content = whole payload).
    */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val hdr = parsePng(bytes).orElse(parseJpeg(bytes))
    val off = hdr.map(_.contentOffset).getOrElse(0)
    def f(i: Int): Long =
      if (off + i < bytes.length) bytes(off + i) & 0xffL else 0L
    MediaFeatures(id, bytes.length.toLong,
      hdr.map(_.width).getOrElse(-1L), hdr.map(_.height).getOrElse(-1L),
      f(0), f(1), f(2), f(3))
  }

  /** Batch feature extraction over a binary payload column; decoders that
    * need per-batch setup initialize once per partition inside the
    * mapPartitions.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real pixel decoders initialize once per partition here
        batch.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Ingest a directory of media files through Spark's `binaryFile` source —
    * the real on-disk path (one row per file: path, modificationTime,
    * length, content). Files larger than
    * `spark.sql.sources.binaryFile.maxLength` fail loudly rather than
    * truncate.
    */
  def readMediaDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("length"), col("content"))

  /** Deterministic "frame sampler": every `stride`-th byte of the payload as
    * a frame checksum — models audio/video frame sampling over a binary
    * blob, batched per partition like [[extractFeatures]].
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, (0 until bytes.length by stride).map(i => bytes(i) & 0xff).toSeq)
      })
      .toDF(idCol, "frames")
  }

  // ------------------------------------------------------------- audio ----

  /** Typed result of the audio decode; −1 dims for unrecognized payloads.
    * `duration_ms` is exact integer floor division — reproducible.
    */
  case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Long,
      channels: Long,
      bits: Long,
      n_samples: Long,
      duration_ms: Long)

  /** Parsed WAV fmt/data headers. */
  case class WavHeader(sampleRate: Long, channels: Long, bits: Long, dataLen: Long)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)

  /** WAV (RIFF, little-endian): "RIFF" + size + "WAVE", then a chunk walk —
    * "fmt " carries channels/sampleRate/bitsPerSample at fixed offsets,
    * "data" carries the sample stream. Chunks pad to even lengths (RIFF
    * rule). Returns None unless both fmt and data chunks are present in
    * order — the fallback contract mirrors [[parsePng]]/[[parseJpeg]].
    */
  def parseWav(bytes: Array[Byte]): Option[WavHeader] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'))
      return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var i = 12
    var sr = -1L; var ch = -1L; var bits = -1L
    while (i + 8 <= bytes.length) {
      val len = le32(bytes, i + 4)
      if (len < 0 || len > bytes.length) return None
      if (bytes(i) == 'f' && bytes(i + 1) == 'm' && bytes(i + 2) == 't' &&
          bytes(i + 3) == ' ') {
        if (i + 24 > bytes.length) return None
        ch = le16(bytes, i + 10)
        sr = le32(bytes, i + 12)
        bits = le16(bytes, i + 22)
      } else if (bytes(i) == 'd' && bytes(i + 1) == 'a' && bytes(i + 2) == 't' &&
          bytes(i + 3) == 'a') {
        return if (sr > 0 && ch > 0 && bits > 0) Some(WavHeader(sr, ch, bits, len))
        else None
      }
      i += 8 + len.toInt + (len.toInt & 1) // RIFF chunks pad to even
    }
    None
  }

  /** Audio decode with opaque fallback (−1 metadata, like [[decode]]). */
  def decodeAudio(id: Long, bytes: Array[Byte]): AudioFeatures =
    parseWav(bytes) match {
      case Some(h) =>
        val blockAlign = h.channels * (h.bits / 8)
        val nSamples = if (blockAlign > 0) h.dataLen / blockAlign else 0L
        AudioFeatures(id, bytes.length.toLong, h.sampleRate, h.channels,
          h.bits, nSamples, nSamples * 1000L / h.sampleRate)
      case None =>
        AudioFeatures(id, bytes.length.toLong, -1L, -1L, -1L, -1L, -1L)
    }

  /** Batch audio feature extraction — same mapPartitions shape as
    * [[extractFeatures]] (per-partition decoder setup amortization point).
    */
  def extractAudioFeatures(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudio(id, bytes) })
  }

  // ------------------------------------------------------------- video ----

  /** Typed result of the video decode; −1 metadata for unrecognized
    * payloads. Dims are the integer part of tkhd's 16.16 fixed-point.
    */
  case class VideoFeatures(
      doc_id: Long,
      n_bytes: Long,
      timescale: Long,
      duration: Long,
      duration_ms: Long,
      width: Long,
      height: Long)

  /** Parsed MP4 movie/track headers. */
  case class Mp4Header(timescale: Long, duration: Long, width: Long, height: Long)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def boxIs(b: Array[Byte], off: Int, t: String): Boolean =
    b(off + 4) == t.charAt(0) && b(off + 5) == t.charAt(1) &&
      b(off + 6) == t.charAt(2) && b(off + 7) == t.charAt(3)

  /** MP4 / ISO BMFF (ISO/IEC 14496-12): [u32 size][4cc type] boxes; movie
    * timescale/duration live in moov→mvhd (version 0: u32s at +20/+24 from
    * the box start; version 1: u32 timescale at +28, u64 duration at +32),
    * track dims in moov→trak→tkhd as 16.16 fixed-point at +84/+88 (v0) or
    * +96/+100 (v1). Largesize (size=1) and to-end (size=0) boxes are
    * treated as unrecognized — the metadata contract only needs the plain
    * encoding, and a malformed size must fall back, not over-read.
    */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Header] = {
    if (bytes.length < 16) return None
    var i = 0
    var sawFtyp = false
    var ts = -1L; var dur = -1L; var w = -1L; var h = -1L
    while (i + 8 <= bytes.length) {
      val size = be32(bytes, i)
      if (size < 8 || i + size > bytes.length) return None
      if (boxIs(bytes, i, "ftyp")) sawFtyp = true
      else if (boxIs(bytes, i, "moov")) {
        var j = i + 8
        while (j + 8 <= i + size.toInt) {
          val csize = be32(bytes, j)
          if (csize < 8 || j + csize > i + size) return None
          if (boxIs(bytes, j, "mvhd")) {
            // field reads stay inside the box: v0 needs 28 bytes, v1 40 —
            // a shorter (malformed) mvhd falls back instead of over-reading
            if (csize >= 28 && bytes(j + 8) == 0) {
              ts = be32(bytes, j + 20); dur = be32(bytes, j + 24)
            } else if (csize >= 40 && bytes(j + 8) != 0) {
              ts = be32(bytes, j + 28); dur = be64(bytes, j + 32)
            }
          } else if (boxIs(bytes, j, "trak")) {
            var k = j + 8
            while (k + 8 <= j + csize.toInt) {
              val gsize = be32(bytes, k)
              if (gsize < 8 || k + gsize > j + csize) return None
              if (boxIs(bytes, k, "tkhd") && gsize >= 12) {
                val off = if (bytes(k + 8) == 0) 84 else 96
                if (off + 8 <= gsize) { // dims inside the box, not just the array
                  w = be32(bytes, k + off) >> 16
                  h = be32(bytes, k + off + 4) >> 16
                }
              }
              k += gsize.toInt
            }
          }
          j += csize.toInt
        }
      }
      i += size.toInt
    }
    if (sawFtyp && ts > 0) Some(Mp4Header(ts, dur, w, h)) else None
  }

  /** Video decode with opaque fallback (−1 metadata, like [[decode]]). */
  def decodeVideo(id: Long, bytes: Array[Byte]): VideoFeatures =
    parseMp4(bytes) match {
      case Some(m) =>
        VideoFeatures(id, bytes.length.toLong, m.timescale, m.duration,
          m.duration * 1000L / m.timescale, m.width, m.height)
      case None =>
        VideoFeatures(id, bytes.length.toLong, -1L, -1L, -1L, -1L, -1L)
    }

  /** Batch video feature extraction — same mapPartitions shape as
    * [[extractFeatures]].
    */
  def extractVideoFeatures(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[VideoFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeVideo(id, bytes) })
  }

  // ------------------------------------------- synthetic payload builders --

  /** Big-endian u32/u16 of a non-negative long, as binary column bytes. */
  private def be32Col(c: Column): Column = unhex(lpad(hex(c.cast("long")), 8, "0"))
  private def be16Col(c: Column): Column = unhex(lpad(hex(c.cast("long")), 4, "0"))

  /** Little-endian bytes of a non-negative long (RIFF/WAV byte order). */
  private def leCol(c: Column, n: Int): Column =
    concat((0 until n).map(i =>
      unhex(lpad(hex(pmod(shiftrightunsigned(c.cast("long"), 8 * i), lit(256L))),
        2, "0"))): _*)

  /** A structurally-valid PNG byte stream built from column expressions:
    * signature, IHDR (8-bit truecolor), one IDAT chunk holding `data`, IEND.
    * Chunk CRCs are zero — [[parsePng]] (like any header-level reader)
    * doesn't check them, and pixel decoding is out of scope.
    */
  def pngPayload(width: Column, height: Column, data: Column): Column =
    concat(
      lit(PngSignature),
      be32Col(lit(13)), lit("IHDR".getBytes("UTF-8")),
      be32Col(width), be32Col(height),
      lit(Array[Byte](8, 2, 0, 0, 0)), // depth 8, truecolor, deflate, adaptive, no interlace
      be32Col(lit(0)),
      be32Col(length(data)), lit("IDAT".getBytes("UTF-8")), data, be32Col(lit(0)),
      be32Col(lit(0)), lit("IEND".getBytes("UTF-8")), be32Col(lit(0)))

  /** A minimal JPEG byte stream: SOI, one single-component SOF0 frame header
    * carrying the dims, `data` as the content stream, EOI.
    */
  def jpegPayload(width: Column, height: Column, data: Column): Column =
    concat(
      lit(Array(0xff, 0xd8).map(_.toByte)),
      lit(Array(0xff, 0xc0).map(_.toByte)), be16Col(lit(11)), // SOF0, len 8+3×1
      lit(Array[Byte](8)), be16Col(height), be16Col(width),
      lit(Array[Byte](1, 1, 0x11, 0)), // 1 component: id, 1×1 sampling, qtable 0
      data,
      lit(Array(0xff, 0xd9).map(_.toByte)))

  /** A genuine PCM WAV byte stream from column expressions: RIFF header,
    * canonical 16-byte fmt chunk (PCM format 1), data chunk holding `data`.
    * Every multi-byte field is little-endian, as the container demands.
    */
  def wavPayload(sampleRate: Column, channels: Column, bits: Column,
      data: Column): Column = {
    val blockAlign = (channels.cast("long") * bits.cast("long") / 8).cast("long")
    concat(
      lit("RIFF".getBytes("US-ASCII")), leCol(length(data) + 36L, 4),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), leCol(lit(16L), 4),
      leCol(lit(1L), 2), leCol(channels, 2), leCol(sampleRate, 4),
      leCol(sampleRate.cast("long") * blockAlign, 4),
      leCol(blockAlign, 2), leCol(bits, 2),
      lit("data".getBytes("US-ASCII")), leCol(length(data), 4), data)
  }

  /** Synthetic audio corpus over a documents table: every doc becomes a
    * genuine PCM WAV whose rate/channels/depth/length derive from `doc_id`
    * arithmetic, so [[parseWav]] is exercised against real little-endian
    * RIFF encodings while a SQL oracle predicts the decode output from
    * arithmetic alone (same design as [[syntheticMediaTable]]).
    */
  def syntheticAudioTable(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val sr = lit(8000L) + (id % 8L) * 1000L
    val ch = lit(1L) + id % 2L
    val bits = when(id % 3L === 0L, 16L).otherwise(8L)
    val nSamples = lit(10L) + id % 200L
    val dataLen = (nSamples * ch * bits / 8L).cast("int")
    docs
      .withColumn("payload", wavPayload(sr, ch, bits,
        substring(lit(Array.fill[Byte](840)(0)), lit(1), dataLen)))
      .select(col("doc_id"), col("payload"))
  }

  /** The identity transform matrix every mvhd/tkhd carries (9 big-endian
    * 16.16/2.30 fixed-point u32s: 1, 0, 0 / 0, 1, 0 / 0, 0, 1).
    */
  private val Mp4Matrix: Array[Byte] =
    Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(v => Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))

  /** A genuine MP4 byte stream from column expressions: ftyp, moov holding a
    * version-0 mvhd (timescale/duration) and one trak→tkhd (16.16 dims),
    * then `data` as an mdat box — every field big-endian per ISO BMFF.
    */
  def mp4Payload(timescale: Column, duration: Column, width: Column,
      height: Column, data: Column): Column = {
    val zeros = (n: Int) => lit(Array.fill[Byte](n)(0))
    val mvhd = concat(
      be32Col(lit(108)), lit("mvhd".getBytes("US-ASCII")),
      zeros(4),                       // version 0 + flags
      zeros(8),                       // ctime, mtime
      be32Col(timescale), be32Col(duration),
      be32Col(lit(0x00010000L)),      // rate 1.0
      lit(Array[Byte](0x01, 0)),      // volume 1.0
      zeros(10),                      // reserved
      lit(Mp4Matrix), zeros(24),      // matrix, pre_defined
      be32Col(lit(0)))                // next_track_id
    val tkhd = concat(
      be32Col(lit(92)), lit("tkhd".getBytes("US-ASCII")),
      zeros(4),                       // version 0 + flags
      zeros(8),                       // ctime, mtime
      be32Col(lit(1)), zeros(4),      // track_id, reserved
      be32Col(duration),
      zeros(16),                      // reserved, layer, alt_group, volume, reserved
      lit(Mp4Matrix),
      be32Col(width * 65536L), be32Col(height * 65536L))
    val trak = concat(be32Col(lit(100)), lit("trak".getBytes("US-ASCII")), tkhd)
    val moov = concat(be32Col(lit(216)), lit("moov".getBytes("US-ASCII")), mvhd, trak)
    concat(
      be32Col(lit(16)), lit("ftyp".getBytes("US-ASCII")),
      lit("isom".getBytes("US-ASCII")), be32Col(lit(0)),
      moov,
      be32Col(length(data) + 8L), lit("mdat".getBytes("US-ASCII")), data)
  }

  /** Synthetic video corpus over a documents table — the m02/m01 design for
    * MP4: timescale/duration/dims derive from `doc_id` arithmetic, payloads
    * are genuine box streams, the oracle predicts the decode arithmetically.
    */
  def syntheticVideoTable(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs
      .withColumn("payload", mp4Payload(
        lit(1000L) + (id % 10L) * 100L,
        lit(500L) + id % 5000L,
        lit(320L) + (id % 16L) * 8L,
        lit(240L) + (id % 9L) * 8L,
        substring(lit(Array.fill[Byte](32)(0)), lit(1), (id % 32L).cast("int"))))
      .select(col("doc_id"), col("payload"))
  }

  /** Synthetic media corpus over a documents table: every doc becomes a
    * genuine PNG (even ids) or JPEG (odd ids) payload whose dims, length,
    * and content bytes derive from `doc_id` arithmetic — so the decoder is
    * exercised against real big-endian container encodings while a SQL
    * oracle predicts the decode output from arithmetic alone (no
    * text-encoding dependence; the r4 ASCII-only caveat is dead).
    */
  def syntheticMediaTable(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val w = lit(16L) + id % 1024L
    val h = lit(16L) + (id * 7) % 768L
    val fpack = ((id * 3) % 256) * 16777216L + ((id * 5) % 256) * 65536L +
      ((id * 11) % 256) * 256L + (id * 13) % 256
    val content = concat(be32Col(fpack),
      substring(lit(Array.fill[Byte](12)(0)), lit(1), (id % 13).cast("int")))
    docs
      .withColumn("payload",
        when(id % 2 === 0, pngPayload(w, h, content))
          .otherwise(jpegPayload(w, h, content)))
      .select(col("doc_id"), col("payload"))
  }
}
