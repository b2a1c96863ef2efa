package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the
  * relational engine as opaque `binary` columns plus typed metadata,
  * and per-item decode/feature-extraction runs as a typed
  * `mapPartitions` over the binary batches — the Scala-side
  * equivalent of an Arrow-batched Python UDF.
  *
  * The actual codec call is STUBBED (`FakeCodec`): this container
  * has no image/audio libraries, so decode is a deterministic pure
  * function of the bytes. Everything around it — schema, encoders,
  * partition-level batching, feature schema — is the real plumbing
  * a codec would drop into.
  */
object Multimodal {

  /** A media row: payload + sidecar metadata. */
  final case class MediaItem(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      header_byte: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** STUB codec — deterministic byte math in place of a real
    * image/audio decode. Swap this object for a JNI/ImageIO-backed
    * implementation; the Spark plumbing does not change.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val len = payload.length.toLong
      // fake "dimensions": stable functions of the payload bytes
      val w = (len % 640) + 1
      val h = ((len * 7919) % 480) + 1
      val frames = (len / 97) + 1
      (w, h, frames)
    }
  }

  /** Wrap a text table into binary media items (test harness for the
    * plumbing; a real pipeline reads payloads from parquet/object
    * storage directly as `binary`).
    */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/fake").as("media_type"))
      .as[MediaItem]
  }

  /** A resized media item: payload transformed by the (stub) codec
    * to the target dimensions.
    */
  final case class ResizedMedia(
      doc_id: Long,
      payload: Array[Byte],
      width: Long,
      height: Long,
      byte_len: Long)

  /** Resize via the stub codec: deterministically truncate/keep the
    * payload to ≤ w*h bytes (a real codec would decode, scale, and
    * re-encode — the typed partition-streaming plumbing is
    * identical).
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    val cap = w * h
    items.mapPartitions { it =>
      it.map { m =>
        val out = if (m.payload.length <= cap) m.payload else m.payload.take(cap)
        ResizedMedia(m.doc_id, out, w.toLong, h.toLong, out.length.toLong)
      }
    }
  }

  /** One row per sampled frame: every `stride`-th frame of each
    * item (deterministic uniform sampling — the frame-extraction
    * shape for video/audio payloads; the decode itself is the
    * stubbed codec). Explodes AFTER feature extraction so only
    * (doc_id, frame_idx) pairs multiply, never payload bytes.
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Long): DataFrame = {
    import features.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

  /** Decode + feature-extract, one partition at a time. Partitions
    * stream through the codec without collecting; at scale this is
    * the operator you'd size `maxPartitionBytes` around so a
    * partition of payloads fits executor memory.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (w, h, f) = FakeCodec.decode(m.payload)
        MediaFeatures(
          doc_id = m.doc_id,
          byte_len = m.payload.length.toLong,
          header_byte = if (m.payload.nonEmpty) m.payload(0).toLong & 0xffL else -1L,
          width = w, height = h, n_frames = f)
      }
    }
  }

  /** 64-bit perceptual difference-hash of a `binary` payload column
    * (see [[graft.functions.expressions.DHash64]] — stubbed stripe
    * "decode", real gradient hash). One codegen pass per payload.
    */
  def dHash(payloadCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.DHash64(
      GraftColumnBridge.expression(payloadCol)))
  }

  /** Perceptual near-dup pairs over a media frame: dHash gradient
    * fingerprints, then the SHARED Hamming-banded candidate join +
    * exact bit_count verify ([[Dedup.hammingPairs64]] — the q37
    * blocking core; pigeonhole chunks, never a cross join, output
    * EQUAL to the brute-force Hamming join over the fingerprints).
    * This is how image-heavy corpora dedup: byte digests (q32) break
    * on any re-encode and token shingles don't exist for pixels —
    * perceptual hashes survive small edits, so near-dups land within
    * a small Hamming radius. Only (id, fp) rows ever shuffle; the
    * payloads stay in their input partitions.
    */
  def perceptualNearDupPairs(
      media: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = media.select(col(idCol).as("id"),
      dHash(col(payloadCol)).as("fp"))
    Dedup.hammingPairs64(fps, maxHamming)
  }

  /** One embedding-feature row per (item, dim). */
  final case class InferredFeature(doc_id: Long, dim: Long, feat: String)

  /** STUB model — a deterministic per-(payload, dim) fingerprint in
    * place of a real encoder. The BATCH signature is the contract:
    * a real model amortizes weights/IO per call, so it must be
    * handed groups of items, never one at a time.
    */
  object FakeModel {
    def embed(batch: Seq[MediaItem], dims: Int): Seq[InferredFeature] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { m =>
        (0L until dims.toLong).map { j =>
          md.reset()
          md.update(m.payload)
          md.update(s":$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hex = md.digest().map(b => f"$b%02x").mkString
          InferredFeature(m.doc_id, j, hex.substring(0, 8))
        }
      }
    }
  }

  /** Batched model INFERENCE over media payloads — the execution
    * half of inference batching (q156 assigns batch ids; this runs
    * the batches): each partition streams through `grouped(
    * batchSize)` and the model is invoked once per GROUP, the
    * per-call amortization a real encoder needs. `batches` (an
    * accumulator) counts model invocations so tests can pin the
    * batch shape without the batch structure leaking into the
    * (partitioning-independent) output rows.
    */
  def batchedInfer(items: Dataset[MediaItem], batchSize: Int, dims: Int,
                   batches: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[InferredFeature] = {
    import items.sparkSession.implicits._
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batches.foreach(_.add(1))
        FakeModel.embed(batch, dims)
      }
    }
  }
}
