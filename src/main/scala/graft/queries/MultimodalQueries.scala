package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.Multimodal
import graft.ext.Multimodal.FakeCodec

/** Driver-visible multimodal queries. Media blobs are synthesized
  * deterministically from the documents table (header fields are pure
  * functions of doc_id; payload = the doc text's UTF-8 bytes), so the
  * whole binary pipeline — encode → decode_media_header / byte_histogram /
  * frame_sample native expressions — is hash-checkable against a DuckDB
  * oracle that computes the same aggregates straight from doc_id/text:
  * any header mis-parse, payload corruption, or frame mis-slice breaks
  * the hash.
  *
  * The synthesis UDF is data-generation only (stands in for reading real
  * media files); the operators under test are the native expressions.
  */
object MultimodalQueries {

  private val encodeMedia = udf { (id: Long, text: String) =>
    FakeCodec.encode((id % 3).toInt, (id % 640 + 1).toInt, (id % 480 + 1).toInt,
      (id % 7 + 1).toInt, text.getBytes("UTF-8"))
  }

  private def mediaTable(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      encodeMedia(col("doc_id"), col("text")).as("media"))

  val defs: Seq[QueryDef] = Seq(

    // decode_media_header + byte_histogram over synthesized blobs,
    // aggregated per decoded format
    QueryDef(
      "q68_multimodal_decode",
      (s, dir) => {
        val decoded = Multimodal.byteHistogramFeatures(
          Multimodal.decodeMeta(mediaTable(s, dir)), dims = 16)
        decoded
          .groupBy(col("decoded_meta.format").as("format"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("decoded_meta.width").cast(LongType)).as("sum_width"),
            sum(col("decoded_meta.height").cast(LongType)).as("sum_height"),
            sum(col("decoded_meta.n_frames").cast(LongType)).as("sum_frames"),
            sum(col("decoded_meta.payload_bytes").cast(LongType)).as("sum_payload_bytes"),
            sum(size(col("features")).cast(LongType)).as("sum_feat_dims"))
          .orderBy(col("format"))
      },
      Some("""SELECT
          CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
          COUNT(*) AS n,
          CAST(SUM(doc_id % 640 + 1) AS BIGINT) AS sum_width,
          CAST(SUM(doc_id % 480 + 1) AS BIGINT) AS sum_height,
          CAST(SUM(doc_id % 7 + 1) AS BIGINT) AS sum_frames,
          CAST(SUM(strlen(text)) AS BIGINT) AS sum_payload_bytes,
          CAST(COUNT(*) * 16 AS BIGINT) AS sum_feat_dims
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // frame_sample generator: every 2nd frame of every blob; frame counts,
    // index sums, and byte volumes are closed-form in doc_id/strlen
    QueryDef(
      "q69_frame_sampling",
      (s, dir) => {
        Multimodal.sampleFrames(mediaTable(s, dir), stride = 2)
          .groupBy((col("media_id") % 5).as("bucket"))
          .agg(
            count(lit(1)).as("n_frames"),
            sum(col("frame_index").cast(LongType)).as("sum_idx"),
            sum(length(col("frame")).cast(LongType)).as("sum_frame_bytes"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT doc_id % 5 AS bucket,
          CAST(SUM((doc_id % 7 + 2) // 2) AS BIGINT) AS n_frames,
          CAST(SUM(((doc_id % 7 + 2) // 2) * ((doc_id % 7 + 2) // 2 - 1)) AS BIGINT) AS sum_idx,
          CAST(SUM(CASE WHEN strlen(text) >= doc_id % 7 + 1
            THEN ((doc_id % 7 + 2) // 2) * (strlen(text) // (doc_id % 7 + 1))
            ELSE (strlen(text) + 1) // 2 END) AS BIGINT) AS sum_frame_bytes
        FROM documents GROUP BY 1 ORDER BY 1""")))
}
