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

  test("decodeFeatures matches the stub codec applied directly") {
    val out = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .collect().map(r => r.doc_id -> r).toMap
    for ((id, text) <- Seq((1L, "a" * 200), (2L, "xyz"), (3L, "b" * 64))) {
      val m = Multimodal.decodeStub(text.getBytes("UTF-8"))
      val r = out(id)
      assert((r.width, r.height, r.n_channels, r.n_frames) ==
        (m.width, m.height, m.nChannels, m.nFrames), s"doc $id")
      assert(r.n_bytes == text.length)
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
