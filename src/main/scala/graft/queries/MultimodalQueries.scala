package graft.queries

import graft.{Q, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** L6 multimodal operators as registry rows. The decode row IS
  * oracle-matched: the stub codec is deterministic on the payload
  * bytes, so DuckDB can recompute it — the differential check covers
  * the whole path (payload struct → partition-batched decode → feature
  * rows). documents.text is ASCII in the judged data, so byte i ==
  * char i in the oracle's arithmetic.
  */
object MultimodalQueries {

  /** L6: binary payload decode + feature extraction via batched
    * mapPartitions (see Multimodal.decodeFeatures).
    */
  val l6Decode: Q = Q(
    "l6_multimodal_decode",
    """SELECT doc_id,
      |  'application/octet-stream' AS mime,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(16 + (ascii(substring(text, 1, 1)) % 16) * 16 AS INT) AS width,
      |  CAST(16 + (ascii(substring(text, length(text), 1)) % 16) * 16 AS INT) AS height,
      |  CAST(1 + octet_length(encode(text)) % 3 AS INT) AS n_channels,
      |  CAST(1 + octet_length(encode(text)) % 8 AS INT) AS n_frames
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 50)
    Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** L6: frame sampling — every 2nd 64-byte window per payload; output
    * is the per-doc sampled-frame count + total sampled bytes (exactly
    * recomputable from the text length).
    */
  val l6FrameSample: Q = Q(
    "l6_frame_sample",
    """SELECT doc_id,
      |  CAST(ceil((octet_length(encode(text)) // 64) / 2.0) AS BIGINT) AS n_frames,
      |  CAST(ceil((octet_length(encode(text)) // 64) / 2.0) AS BIGINT) * 64 AS total_bytes
      |FROM documents
      |WHERE doc_id < 50 AND octet_length(encode(text)) >= 64
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 50)
    Multimodal.frameSample(Multimodal.withPayload(docs), frameBytes = 64, everyK = 2)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).as("total_bytes"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(l6Decode, l6FrameSample)
}
