package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (L6): payload schema, batched decode shape,
  * frame-sampling laws — all on literal fixtures.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 200), (2L, "xyz"), (3L, "b" * 64)
  ).toDF("doc_id", "text")

  test("withPayload produces the typed (content, mime, uri) struct") {
    val p = Multimodal.withPayload(docs)
    val f = p.schema("payload").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(f.fieldNames.toSeq == Seq("content", "mime", "uri"))
    val row = p.filter($"doc_id" === 2L)
      .select($"payload.content", $"payload.uri").head()
    assert(row.getAs[Array[Byte]](0).toSeq == "xyz".getBytes("UTF-8").toSeq)
    assert(row.getString(1) == "mem://documents/2")
  }

  test("sniff parses real PNG / JPEG / GIF / WAV headers byte-for-byte") {
    // PNG, colour type 2 (rgb) and 6 (rgba) via the synthetic generator
    // (docId 0 -> PNG ct=2; docId 4 -> PNG ct=6... docId%2 picks it).
    val png = Multimodal.sniff(Multimodal.syntheticMedia(0L))
    assert(png == Multimodal.MediaMeta("image/png", 32, 24, 3, 1, ok = true), s"$png")
    val png4 = Multimodal.sniff(Multimodal.syntheticMedia(8L)) // 8%2=0 -> ct 2
    assert(png4.mime == "image/png" && png4.width == 32 + 8 * 7 &&
      png4.height == 24 + 8 * 11 && png4.nChannels == 3, s"$png4")
    // docId%4==0 forces an even docId, so the generator never emits
    // colour type 6 — patch one in by hand to cover the rgba mapping:
    val rgba = {
      val b = Multimodal.syntheticMedia(0L).clone()
      b(25) = 6 // colour type rgba
      Multimodal.sniff(b)
    }
    assert(rgba.nChannels == 4, s"$rgba")
    // JPEG: marker walk skips APP0 and lands on SOF0.
    val jpg = Multimodal.sniff(Multimodal.syntheticMedia(1L))
    assert(jpg == Multimodal.MediaMeta(
      "image/jpeg", 32 + 7, 24 + 11, 3, 1, ok = true), s"$jpg")
    // GIF: little-endian screen dims.
    val gif = Multimodal.sniff(Multimodal.syntheticMedia(2L))
    assert(gif == Multimodal.MediaMeta(
      "image/gif", 32 + 14, 24 + 22, 3, 1, ok = true), s"$gif")
    // WAV: chunk walk finds fmt + data; frames = data bytes / block align.
    val wav = Multimodal.sniff(Multimodal.syntheticMedia(3L))
    assert(wav == Multimodal.MediaMeta(
      "audio/wav", 0, 0, 2, 1000 + 3 * 4, ok = true), s"$wav")
    // Unknown magic and truncated headers degrade, never throw.
    assert(!Multimodal.sniff("just some text".getBytes("UTF-8")).ok)
    assert(!Multimodal.sniff(Array[Byte]()).ok)
    assert(!Multimodal.sniff(Multimodal.syntheticMedia(0L).take(10)).ok,
      "truncated PNG must not parse")
    assert(!Multimodal.sniff(Multimodal.syntheticMedia(3L).take(20)).ok,
      "truncated WAV must not parse")
    // Corrupt WAV with a NEGATIVE chunk size (le32 is signed): a size of
    // -8 makes the naive step `8 + size + (size & 1)` advance zero bytes
    // — the walk must bail to ok=false, not hang the executor task.
    for (bad <- Seq(-8, -9, Int.MinValue)) {
      val b = Multimodal.syntheticMedia(3L).clone()
      // First chunk starts at 12; its size field is at 16..19 (LE).
      b(16) = (bad & 0xff).toByte
      b(17) = ((bad >> 8) & 0xff).toByte
      b(18) = ((bad >> 16) & 0xff).toByte
      b(19) = ((bad >> 24) & 0xff).toByte
      val done = new java.util.concurrent.CompletableFuture[Multimodal.MediaMeta]()
      val t = new Thread(() => done.complete(Multimodal.sniff(b)))
      t.setDaemon(true); t.start()
      val m = done.get(10, java.util.concurrent.TimeUnit.SECONDS) // hang = timeout
      assert(!m.ok, s"corrupt WAV (chunk size $bad) must degrade, got $m")
    }
  }

  test("decodeFeatures sniffs mime from bytes; unrecognized falls back to declared") {
    val out = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .collect().map(r => r.doc_id -> r).toMap
    // Text payloads carry no media magic: ok=false zeros, declared mime kept.
    for ((id, text) <- Seq((1L, "a" * 200), (2L, "xyz"), (3L, "b" * 64))) {
      val r = out(id)
      assert(r.mime == "application/octet-stream" && r.n_bytes == text.length)
      assert((r.width, r.height, r.n_channels, r.n_frames) == ((0, 0, 0, 0)), s"doc $id")
    }
  }

  test("decodeFeatures survives partition-batch boundaries (> BatchSize rows)") {
    val many = (1 to (Multimodal.BatchSize * 2 + 7)).map(i => (i.toLong, s"doc $i body"))
      .toDF("doc_id", "text").repartition(3)
    val out = Multimodal.decodeFeatures(Multimodal.withPayload(many))
    assert(out.count() == Multimodal.BatchSize * 2 + 7)
    assert(out.select($"doc_id").distinct().count() == Multimodal.BatchSize * 2 + 7)
  }

  test("frameSample emits every k-th whole frame with exact sizes") {
    val fs = Multimodal.frameSample(Multimodal.withPayload(docs), frameBytes = 64, everyK = 2)
    val byDoc = fs.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // doc 1: 200 bytes → 3 whole frames (0,1,2) → sampled idx 0,2 → 2 frames
    // doc 2: 3 bytes → 0 frames; doc 3: 64 bytes → 1 frame → idx 0 → 1
    assert(byDoc.getOrElse(1L, 0L) == 2L)
    assert(!byDoc.contains(2L))
    assert(byDoc.getOrElse(3L, 0L) == 1L)
    val sizes = fs.select(length($"frame")).as[Int].collect()
    assert(sizes.forall(_ == 64))
  }
}
