package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: opaque binary payloads (image/audio/video)
  * with typed metadata, decoded and featurized per partition
  * (SURVEY §2.2 "multimodal columns"; north-star brief).
  *
  * The real Spark-side machinery here — typed schemas, per-partition
  * batched processing, bounded memory, deterministic output — is
  * production-shaped. The IMAGE codec is REAL (`decodeImageInfo`:
  * javax.imageio parses actual PNG/JPEG/GIF/BMP containers and pixels;
  * the oracle-gated `mm_image_decode` query round-trips generated PNGs
  * through it). Only the audio/video codec remains stubbed
  * (`decodeStub`: this container ships no such libraries), clearly
  * marked and deterministic so tests can pin the pipeline end-to-end;
  * swapping it for a real JNI/javacpp decoder changes no schema,
  * partitioning, or call signature.
  *
  * Scale posture: `mapPartitions` (not per-row map) so a real decoder
  * amortizes codec init per partition — the Scala analog of
  * `mapInPandas` batch processing; features are fixed-width
  * Array[Float], so downstream similarity/dedup operators (Similarity,
  * Dedup) apply unchanged to media embeddings.
  */
object Multimodal {

  /** An ingested media file: opaque bytes + declared media type. */
  final case class MediaFile(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata + pooled feature vector. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float]
  )

  implicit val mediaFileEnc: Encoder[MediaFile] = Encoders.product[MediaFile]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** ======== REAL CODEC (image slice) ========
    * Decode actual image bytes — any format the JDK's `javax.imageio`
    * ships a reader for (PNG, JPEG, GIF, BMP) — into (width, height,
    * channel count). This is the non-stubbed decode path: the bytes go
    * through a real container parser + pixel decoder, so a truncated or
    * mislabeled payload FAILS here instead of producing fake metadata.
    * Call it from `mapPartitions` (the [[extractFeatures]] shape) so the
    * reader-registry lookup amortizes per partition; `setUseCache(false)`
    * keeps ImageIO off executor-local disk for in-memory payloads.
    */
  def decodeImageInfo(payload: Array[Byte]): (Int, Int, Int) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    (img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  /** Deterministic REAL-format image bytes for fixtures/tests: a
    * width×height PNG (grayscale when `gray`, else RGB) whose pixels are
    * a pure function of `seed` — so a decode gate's oracle can recompute
    * the expected dimensions from the generating expression while the
    * payload itself still exercises the real PNG container + codec. */
  def encodePng(width: Int, height: Int, seed: Long, gray: Boolean): Array[Byte] = {
    val imgType =
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(width, height, imgType)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = (seed * 31 + y) * 31 + x
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer available")
    bos.toByteArray
  }

  /** ======== STUB ========
    * Deterministic fake decode: derives (width, height, frameCount) from
    * the payload bytes alone. Kept for the audio/video media types this
    * container has no codec for; the IMAGE path is real — see
    * [[decodeImageInfo]]. A real audio/video implementation calls the
    * codec (e.g. FFmpeg via JNI) — same signature, same caller.
    */
  private[graft] def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    val w = 16 + (math.abs(h) % 1920).toInt
    val ht = 16 + (math.abs(h / 7) % 1080).toInt
    val frames = mediaType match {
      case "video" => 2 + (payload.length / 64)
      case "audio" => 1 + (payload.length / 256)
      case _       => 1
    }
    (w, ht, frames)
  }

  /** ======== STUB ========
    * Deterministic fake pixel decode for resize/pooling: byte stream
    * interpreted as luma samples. Real impl: decoded pixel buffer.
    */
  private def lumaSamples(payload: Array[Byte]): Array[Float] =
    payload.map(b => (b & 0xff) / 255.0f)

  /** Decode + featurize each partition's files in one pass: mean-pooled
    * `dim`-bucket luma histogram-ish features (fixed width regardless of
    * payload size — the "resize" step).
    */
  def extractFeatures(files: Dataset[MediaFile], dim: Int): Dataset[MediaFeatures] =
    files.mapPartitions { it =>
      // per-partition init point for a real codec
      it.map { f =>
        val (w, h, frames) = decodeStub(f.media_type, f.payload)
        val samples = lumaSamples(f.payload)
        val feat = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < samples.length) {
          val b = i * dim / math.max(samples.length, 1)
          feat(b) += samples(i); cnt(b) += 1; i += 1
        }
        var j = 0
        while (j < dim) { if (cnt(j) > 0) feat(j) /= cnt(j); j += 1 }
        MediaFeatures(f.doc_id, f.media_type, f.payload.length, w, h, frames, feat)
      }
    }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk becomes a (doc_id, frame_idx, frame_bytes) row — the
    * explode-shaped op that feeds per-frame feature extraction.
    */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  def sampleFrames(files: Dataset[MediaFile], frameBytes: Int, stride: Int): Dataset[Frame] =
    files.flatMap { f =>
      f.payload
        .grouped(frameBytes)
        .zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => Frame(f.doc_id, i, chunk) }
        .toSeq
    }
}
