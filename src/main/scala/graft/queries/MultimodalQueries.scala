package graft.queries

import graft.{Q, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** L6 multimodal operators as registry rows. The decode row IS
  * oracle-matched AGAINST REAL HEADER PARSING: the fixture synthesizes
  * genuine PNG / JPEG / GIF / WAV container headers (exact byte
  * layouts) whose dimensions are closed formulas of doc_id, the
  * operator sniffs mime/width/height/channels/frames from the BYTES
  * (`Multimodal.sniff` — magic detection, marker walking, chunk
  * walking), and DuckDB recomputes the same fields from the generating
  * formulas — a sniffer that misreads an offset, walks a segment
  * wrong, or trusts the declared mime flips the hash.
  */
object MultimodalQueries {

  /** L6: binary payload sniff + feature extraction via batched
    * mapPartitions (see Multimodal.decodeFeatures). The declared mime
    * is a LIE ('application/octet-stream') on purpose: the emitted
    * mime must come from the magic bytes.
    */
  val l6Decode: Q = Q(
    "l6_multimodal_decode",
    """SELECT doc_id,
      |  CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |    WHEN 2 THEN 'image/gif' ELSE 'audio/wav' END AS mime,
      |  CAST(256 AS INT) AS n_bytes,
      |  CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 32 + (doc_id % 100) * 7 END AS INT)
      |    AS width,
      |  CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 24 + (doc_id % 57) * 11 END AS INT)
      |    AS height,
      |  CAST(CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 3 + (doc_id % 2) WHEN 3 THEN 1 + (doc_id % 2)
      |    ELSE 3 END AS INT) AS n_channels,
      |  CAST(CASE WHEN doc_id % 4 = 3 THEN 1000 + (doc_id % 100) * 4 ELSE 1 END AS INT)
      |    AS n_frames
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.udf
    val media = udf((id: Long) => Multimodal.syntheticMedia(id)) // fixture synth only
    val withPayloads = Tables.documents(spark, dir).filter(col("doc_id") < 50)
      .select(
        col("doc_id"),
        struct(
          media(col("doc_id")).as("content"),
          lit("application/octet-stream").as("mime"), // deliberately wrong
          concat(lit("mem://media/"), col("doc_id")).as("uri")).as("payload"))
    Multimodal.decodeFeatures(withPayloads)
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
