package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2b L6): non-text payloads ride
  * alongside relational data as an opaque `binary` column plus typed
  * metadata, and per-payload compute (decode / feature-extract /
  * frame-sample) runs as a BATCHED partition-local operator.
  *
  * The codec is a REAL header sniffer (`sniff`): PNG / JPEG / GIF /
  * WAV magic detection and dimension/channel/frame extraction from the
  * actual container bytes — bounds-checked, unknown or truncated bytes
  * degrade to ok=false, never throw. Full pixel/sample DECODE (what
  * javax.imageio / ffmpeg would add) still plugs in behind the same
  * signature; the header fields a data pipeline filters and routes on
  * (mime, dims, channels, frames) are parsed for real.
  *
  * Scale notes (100 TB):
  *  - payload bytes never shuffle: decode/feature ops are
  *    `mapPartitions` (no exchange); only the small feature rows flow on.
  *  - batch shape: payloads are processed in groups of `BatchSize`
  *    within a partition (mirrors Arrow record-batch processing) so a
  *    real vectorized codec amortizes per-call overhead.
  *  - repartition BEFORE attaching heavy payloads, never after.
  */
object Multimodal {

  /** Typed payload record: (content, mime, uri). */
  final case class Payload(content: Array[Byte], mime: String, uri: String)

  /** Sniffed media metadata. `mime` is detected from the MAGIC BYTES
    * (empty when unrecognized — the caller falls back to the declared
    * mime); audio reports (0, 0) dims and sample-frames in nFrames.
    */
  final case class MediaMeta(
      mime: String, width: Int, height: Int, nChannels: Int, nFrames: Int,
      ok: Boolean)

  final case class DecodedRow(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_channels: Int, n_frames: Int)

  /** Batch size for partition-local codec calls — the unit a real
    * vectorized decoder (or Arrow batch) would receive.
    */
  val BatchSize = 64

  private val NoMeta = MediaMeta("", 0, 0, 0, 0, ok = false)

  private def u8(b: Array[Byte], i: Int): Int = java.lang.Byte.toUnsignedInt(b(i))
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** REAL header sniffing over the payload bytes. Every read is
    * bounds-checked; anything malformed yields ok=false (a corrupt
    * payload is data to route to quarantine, not an executor crash).
    */
  def sniff(b: Array[Byte]): MediaMeta =
    try {
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
          ascii(b, 12, "IHDR")) {
        // PNG: IHDR is always the first chunk — width/height are BE
        // u32 at 16/20, colour type at 25 maps to channel count.
        val channels = if (b.length > 25) u8(b, 25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => 0
        } else 0
        if (channels == 0) NoMeta
        else MediaMeta("image/png", be32(b, 16), be32(b, 20), channels, 1, ok = true)
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk the marker segments from SOI to the first SOF
        // (C0/C1/C2 — baseline/extended/progressive), which carries
        // height (BE u16 at +5), width (+7), component count (+9).
        var i = 2
        var out = NoMeta
        var done = false
        while (!done && i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) { done = true } // desynced: not a marker
          else {
            val marker = b(i + 1) & 0xff
            if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
              if (i + 9 < b.length)
                out = MediaMeta("image/jpeg", be16(b, i + 7), be16(b, i + 5),
                  u8(b, i + 9), 1, ok = true)
              done = true
            } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
              i += 2 // standalone marker, no length field
            } else {
              i += 2 + be16(b, i + 2) // skip the segment by its length
            }
          }
        }
        out
      } else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) {
        // GIF: logical-screen width/height are LE u16 at 6/8; palette
        // GIFs render to 3 channels. Frame count would need a full
        // block walk — header-level sniffing reports 1.
        if (b.length >= 10) MediaMeta("image/gif", le16(b, 6), le16(b, 8), 3, 1, ok = true)
        else NoMeta
      } else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
        // WAV: walk RIFF chunks for fmt (channels LE u16 at +10 into
        // the chunk) and data (sample frames = size / block align).
        var i = 12
        var channels = 0
        var blockAlign = 0
        var dataBytes = -1
        var corrupt = false
        while (!corrupt && i + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
          val size = le32(b, i + 4)
          // le32 is signed: a corrupt size < 0 would make the step
          // non-positive (e.g. -8 → step 0) and hang the walk. Bail.
          if (size < 0) corrupt = true
          else {
            if (ascii(b, i, "fmt ") && i + 24 <= b.length) {
              channels = le16(b, i + 10)
              blockAlign = le16(b, i + 20)
            } else if (ascii(b, i, "data")) dataBytes = size
            i += 8 + size + (size & 1) // chunks are word-aligned
          }
        }
        if (!corrupt && channels > 0 && blockAlign > 0 && dataBytes >= 0)
          MediaMeta("audio/wav", 0, 0, channels, dataBytes / blockAlign, ok = true)
        else NoMeta
      } else NoMeta
    } catch { case _: IndexOutOfBoundsException | _: ArithmeticException => NoMeta }

  /** Attach an opaque binary payload column (content/mime/uri struct) to
    * the documents table — the text bytes stand in for media bytes.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      struct(
        encode(col("text"), "UTF-8").as("content"),
        lit("application/octet-stream").as("mime"),
        concat(lit("mem://documents/"), col("doc_id")).as("uri")).as("payload"))

  /** Decode + feature-extract: batched mapPartitions over payload rows.
    * No shuffle — each task sniffs its own partition's payloads and
    * emits only the narrow feature schema. The emitted mime is the
    * SNIFFED one (what the bytes actually are); the declared mime is
    * only the fallback for unrecognized payloads — mislabeled media is
    * exactly what a pipeline needs surfaced.
    */
  def decodeFeatures(withPayloads: DataFrame): Dataset[DecodedRow] = {
    val enc = Encoders.product[DecodedRow]
    withPayloads
      .select(col("doc_id"), col("payload.content"), col("payload.mime"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // One codec invocation per batch in a real build.
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val declared = r.getString(2)
            val m = sniff(bytes)
            DecodedRow(id, if (m.mime.nonEmpty) m.mime else declared,
              bytes.length, m.width, m.height, m.nChannels, m.nFrames)
          }
        }
      }(enc)
  }

  /** Deterministic synthetic media payloads for fixtures/tests: REAL
    * container headers (the exact byte layouts `sniff` parses) with
    * dimensions derived from `docId` by closed formulas a SQL oracle
    * can recompute — doc_id % 4 rotates PNG / JPEG / GIF / WAV. Padded
    * to a fixed 256 bytes so byte-count columns are formula-free.
    */
  def syntheticMedia(docId: Long): Array[Byte] = {
    val w = (32 + (docId % 100) * 7).toInt
    val h = (24 + (docId % 57) * 11).toInt
    val out = java.nio.ByteBuffer.allocate(256) // zero-filled padding
    (docId % 4) match {
      case 0 => // PNG signature + IHDR (width, height BE; colour type 2|6)
        out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
        out.putInt(13).put("IHDR".getBytes("US-ASCII"))
        out.putInt(w).putInt(h)
        out.put(8.toByte).put((2 + 4 * (docId % 2)).toByte) // depth, colour type
      case 1 => // JPEG SOI + APP0(JFIF) + SOF0 (height, width BE; 3 comps)
        out.put(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte))
        out.putShort(16.toShort).put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        out.position(2 + 2 + 16) // end of APP0 segment
        out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17.toShort)
        out.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      case 2 => // GIF89a logical screen (width, height LE)
        out.put("GIF89a".getBytes("US-ASCII"))
        out.put((w & 0xff).toByte).put((w >> 8).toByte)
        out.put((h & 0xff).toByte).put((h >> 8).toByte)
      case _ => // WAV: RIFF/WAVE + fmt (PCM16) + data sized in frames
        val channels = (1 + docId % 2).toInt
        val blockAlign = channels * 2
        val frames = (1000 + (docId % 100) * 4).toInt
        out.put("RIFF".getBytes("US-ASCII")).putInt(0)
        out.put("WAVE".getBytes("US-ASCII"))
        out.put("fmt ".getBytes("US-ASCII"))
        out.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.putInt(16).putShort(1.toShort).putShort(channels.toShort)
        out.putInt(44100).putInt(44100 * blockAlign)
        out.putShort(blockAlign.toShort).putShort(16.toShort)
        out.order(java.nio.ByteOrder.BIG_ENDIAN)
        out.put("data".getBytes("US-ASCII"))
        out.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.putInt(frames * blockAlign)
        out.order(java.nio.ByteOrder.BIG_ENDIAN)
    }
    out.array()
  }

  /** Frame-sample: keep every k-th "frame" (fixed-size byte window) of a
    * payload — the video-pipeline primitive, shaped as a generator
    * (one row per sampled frame), payloads never shuffled.
    */
  def frameSample(withPayloads: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    withPayloads.select(
      col("doc_id"),
      posexplode(sliceFrames(col("payload.content"), frameBytes, everyK))
        .as(Seq("frame_idx", "frame")))

  /** All whole frames of width `frameBytes`, then every k-th of those —
    * built from codegen'd binary/array functions (no UDF).
    */
  private def sliceFrames(content: org.apache.spark.sql.Column, frameBytes: Int, everyK: Int) = {
    val nFrames = (length(content) / frameBytes).cast("int")
    // Guard: Spark's sequence(0, -1) yields a DESCENDING [0, -1], not an
    // empty array, so a short payload must map to array() explicitly.
    when(nFrames > 0,
      filter(
        transform(
          sequence(lit(0), nFrames - 1),
          i => when(i % everyK === 0, substring(content, i * frameBytes + 1, lit(frameBytes)))),
        f => f.isNotNull))
      .otherwise(array().cast("array<binary>"))
  }
}
