package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query bindings for the multimodal plumbing. The oracle can
  * reproduce the arithmetic because the stub codec is pure byte
  * math — which is exactly what makes the plumbing testable without
  * media libraries.
  */
object MultimodalOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_media_features" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Multimodal.extractFeatures(Multimodal.asMedia(Tables(s, d).documents))
        .toDF()
    }),

    "q47_frame_sample" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Multimodal.sampleFrames(
        Multimodal.extractFeatures(Multimodal.asMedia(Tables(s, d).documents)),
        stride = 3L)
    }),

    "q62_media_resize" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Multimodal.resize(Multimodal.asMedia(Tables(s, d).documents), w = 64, h = 64)
        .toDF().select("doc_id", "width", "height", "byte_len")
    }),

    // Batched model inference: payloads stream through the stub
    // model in ≤32-item groups (one model call per GROUP — the
    // weight/IO amortization a real encoder needs; MultimodalSpec
    // pins the call count). Output rows are a pure function of
    // (payload, dim), so the result is partitioning-independent and
    // fully oracled even though the batching is physical.
    "q185_batch_infer" -> ((s, d) => {
      implicit val sp: SparkSession = s
      Multimodal.batchedInfer(
        Multimodal.asMedia(TextOps.parallelized(Tables(s, d).documents)),
        batchSize = 32, dims = 4).toDF()
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q45_media_features" ->
      """SELECT doc_id,
                octet_length(encode(text))::BIGINT AS byte_len,
                ascii(text[1])::BIGINT AS header_byte,
                (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
                ((octet_length(encode(text)) * 7919) % 480 + 1)::BIGINT AS height,
                (octet_length(encode(text)) // 97 + 1)::BIGINT AS n_frames
         FROM documents""",
    "q47_frame_sample" ->
      """SELECT doc_id,
                (octet_length(encode(text)) // 97 + 1)::BIGINT AS n_frames,
                unnest(range(0, octet_length(encode(text)) // 97 + 1, 3))::BIGINT AS frame_idx
         FROM documents""",
    "q62_media_resize" ->
      """SELECT doc_id, 64::BIGINT AS width, 64::BIGINT AS height,
                least(octet_length(encode(text)), 4096)::BIGINT AS byte_len
         FROM documents""",
    "q185_batch_infer" ->
      """WITH dims AS (SELECT unnest(range(4)) AS j)
         SELECT doc_id, j::BIGINT AS dim,
                substring(md5(text || ':' || j::VARCHAR), 1, 8) AS feat
         FROM documents CROSS JOIN dims"""
  )
}
