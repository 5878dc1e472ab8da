package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal column plumbing: media ride along as opaque `binary` columns with
  * typed metadata, and decode/feature-extraction runs as partition-local typed
  * transforms (`mapPartitions` — the Scala analogue of `mapInPandas`: one
  * iterator per partition, batch-shaped, no shuffle).
  *
  * The decode step itself is STUBBED (this environment ships no image/audio
  * codecs): [[FakeCodec.decode]] derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, binary synthesis, batching, partition
  * locality — is real and tested, so swapping in an actual codec is a one-function
  * change.
  *
  * At 100 TB: binary payloads never enter a shuffle here; feature extraction is
  * embarrassingly parallel, and the output is a narrow feature table a fraction
  * of the input size. Real pipelines should also store payloads in their own
  * parquet column chunk (they do here) so metadata-only queries never read them.
  */
object Multimodal {

  /** A row carrying an opaque media payload plus typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (stub shape: real codecs emit embeddings/dimensions). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int, checksum_hex: String,
      fake_width: Int, fake_height: Int)

  /** Deterministic stand-in for an image/audio codec. Checksums run over the
    * base64 *transport form* of the payload (a string), so the same value is
    * computable by any engine with a string md5 — raw-blob md5 is not portable
    * (DuckDB 1.0 has no md5(BLOB)).
    */
  object FakeCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val b64 = java.util.Base64.getEncoder.encodeToString(r.payload)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(b64.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = md.map("%02x".format(_)).mkString
      // "dimensions" derived from payload bytes — deterministic fake decode
      MediaFeatures(r.doc_id, r.media_type, r.payload.length, hex,
        fake_width = 1 + (r.payload.head & 0x7f),
        fake_height = 1 + (r.payload.last & 0x7f))
    }
  }

  /** Synthesize a deterministic binary payload per document (md5 bytes of the
    * text — a stand-in for real image bytes) with typed metadata columns.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      unhex(md5(col("text"))).as("payload"))

  /** Expression-level binary features — pure built-ins, oracle-checkable:
    * payload length, base64 transport encoding, content checksum.
    */
  def binaryFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      base64(col("payload")).as("payload_b64"),
      md5(base64(col("payload"))).as("checksum_hex"))

  /** Typed partition-local decode: the mapInPandas-shaped path. Batch = one
    * partition iterator; the codec is invoked per element without ever
    * materializing the partition.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow]
      .mapPartitions(_.map(FakeCodec.decode))
  }

  /** A decoded-and-resized media row. `scale` is the applied factor. */
  final case class ResizedMedia(
      doc_id: Long, media_type: String,
      orig_width: Int, orig_height: Int,
      width: Int, height: Int, scale: Double)

  /** Resize to fit a `box`×`box` bounding box preserving aspect ratio — the
    * standard pre-embedding normalization step. Arithmetic is plain IEEE
    * double division + floor, identical across engines, so the stubbed
    * "decode" stays oracle-checkable; a real codec swaps into the same
    * partition-local map.
    */
  def resizeFeatures(spark: SparkSession, sfDir: String, box: Int = 32): Dataset[ResizedMedia] = {
    import spark.implicits._
    decodeFeatures(spark, sfDir).mapPartitions(_.map { f =>
      val scale = math.min(1.0, math.min(box.toDouble / f.fake_width, box.toDouble / f.fake_height))
      ResizedMedia(f.doc_id, f.media_type, f.fake_width, f.fake_height,
        width = math.max(1, math.floor(f.fake_width * scale).toInt),
        height = math.max(1, math.floor(f.fake_height * scale).toInt),
        scale = scale)
    })
  }

  /** One sampled "video" frame: deterministic per (payload, index). */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_ms: Long, frame_checksum: String)

  /** Frame sampling: a 1→N generator over the payload (flatMap — the
    * explode-shaped media op). Only frame keys + checksums leave the executor;
    * the payload itself is read once per partition and never shuffled. The
    * stub derives each frame's checksum from the transport form + index; a
    * real video codec would seek and decode keyframes in the same loop.
    */
  def frameSample(spark: SparkSession, sfDir: String, nFrames: Int = 3): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].flatMap { r =>
      val b64 = java.util.Base64.getEncoder.encodeToString(r.payload)
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until nFrames).map { i =>
        val hex = md.digest(s"$b64:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        md.reset()
        Frame(r.doc_id, i, i * 1000L, hex)
      }
    }
  }
}
