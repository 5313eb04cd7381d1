package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: opaque binary payloads (image/audio/video)
  * with typed metadata, decoded and featurized per partition
  * (SURVEY §2.2 "multimodal columns"; north-star brief).
  *
  * The real Spark-side machinery here — typed schemas, per-partition
  * batched processing, bounded memory, deterministic output — is
  * production-shaped. The IMAGE codec is REAL (`decodeImage`:
  * javax.imageio parses actual PNG/JPEG/GIF/BMP containers and pixels)
  * and the AUDIO codec is REAL (`decodeAudio`: javax.sound.sampled
  * parses actual WAV/AIFF containers and PCM frames); BOTH are what
  * [[extractFeatures]] — the pipeline entry point — dispatches those
  * media types through, and each is oracle-gated end-to-end
  * (`mm_image_decode`, `mm_audio_decode` round-trip generated real
  * containers). Only the VIDEO codec remains stubbed (`decodeStub`:
  * this container ships no video library), clearly marked and
  * deterministic so tests can pin the pipeline end-to-end; swapping it
  * for a real JNI/javacpp decoder changes no schema, partitioning, or
  * call signature.
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
    val img = decodeImage(payload)
    (img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  /** Real image decode to a pixel buffer — the form [[extractFeatures]]
    * consumes (metadata AND decoded pixels in one parse). */
  private[graft] def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    img
  }

  /** Decoded luma plane of a real image, row-major, normalized to
    * [0, 1] — the sample stream [[extractFeatures]] pools for image
    * payloads (REAL pixels, not payload bytes). */
  private[graft] def imageLuma(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
        x += 1
      }
      y += 1
    }
    out
  }

  /** ======== REAL CODEC (audio slice) ========
    * Decode actual audio bytes — any container the JDK's
    * `javax.sound.sampled` ships a reader for (WAV, AIFF, AU) — into
    * (sampleRateHz, channels, frameCount). A real container parser +
    * PCM reader: a garbage payload FAILS (`UnsupportedAudioFileException`
    * → IllegalArgumentException) and a TRUNCATED container fails too
    * (the header's declared frame count is checked against the frames
    * actually present) instead of producing fake metadata. */
  def decodeAudioInfo(payload: Array[Byte]): (Int, Int, Long) = {
    val (rate, ch, frames, _) = decodeAudio(payload)
    (rate, ch, frames)
  }

  /** Real audio decode to normalized PCM samples in [-1, 1] (interleaved
    * channels) plus metadata — the form [[extractFeatures]] consumes. */
  private[graft] def decodeAudio(payload: Array[Byte]): (Int, Int, Long, Array[Float]) = {
    val in =
      try javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable audio payload (${payload.length} bytes)")
      }
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"only 16-bit PCM is supported here, got ${fmt.getSampleSizeInBits}-bit " +
          s"${fmt.getEncoding}")
      val bytes = in.readAllBytes()
      val actualFrames = bytes.length / fmt.getFrameSize
      val declared = in.getFrameLength
      require(declared < 0 || actualFrames == declared,
        s"truncated audio payload: header declares $declared frames, " +
          s"stream holds $actualFrames")
      val n = bytes.length / 2
      val samples = new Array[Float](n)
      var i = 0
      while (i < n) {
        val b0 = bytes(2 * i) & 0xff
        val b1 = bytes(2 * i + 1) & 0xff
        val s = (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
        samples(i) = s / 32768.0f
        i += 1
      }
      (math.round(fmt.getSampleRate), fmt.getChannels, actualFrames.toLong, samples)
    } finally in.close()
  }

  /** Deterministic REAL-format audio bytes for fixtures/tests: a WAV
    * container holding `nFrames` frames of `channels`-channel 16-bit PCM
    * at `sampleRate` Hz whose samples are a pure function of `seed` — so
    * a decode gate's oracle can recompute the expected metadata from the
    * generating expression while the payload itself still exercises the
    * real WAV container + PCM reader (the audio twin of [[encodePng]]). */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val h = (seed * 31 + i) * 1103515245L + 12345L
      val s = (h >>> 16).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem
      .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
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

  /** ======== STUB (video only) ========
    * Deterministic fake decode: derives (width, height, frameCount) from
    * the payload bytes alone. Kept ONLY for the video media type this
    * container has no codec for; the IMAGE and AUDIO paths are real —
    * see [[decodeImage]] / [[decodeAudio]]. A real video implementation
    * calls the codec (e.g. FFmpeg via JNI) — same signature, same caller.
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

  /** ======== STUB (video only) ========
    * Deterministic fake pixel decode for resize/pooling: byte stream
    * interpreted as luma samples. Real impl: decoded frame buffers.
    */
  private def lumaSamples(payload: Array[Byte]): Array[Float] =
    payload.map(b => (b & 0xff) / 255.0f)

  /** Decode + featurize each partition's files in one pass: mean-pooled
    * `dim`-bucket features over the decoded sample stream (fixed width
    * regardless of payload size — the "resize" step).
    *
    * Dispatch is per media type, and image/audio go through the REAL
    * codecs — a mislabeled or corrupt payload FAILS here rather than
    * yielding fabricated metadata:
    *  - `image` → [[decodeImage]]: (width, height) real, n_frames = 1,
    *    samples = decoded luma plane;
    *  - `audio` → [[decodeAudio]]: width := channels, height :=
    *    sampleRateHz, n_frames := PCM frame count, samples = normalized
    *    PCM (the schema reuses the two spatial slots for the two audio
    *    shape parameters — documented here, stable for downstream ops);
    *  - `video` (and anything else) → [[decodeStub]], the one remaining
    *    declared stub.
    */
  def extractFeatures(files: Dataset[MediaFile], dim: Int): Dataset[MediaFeatures] =
    files.mapPartitions { it =>
      // per-partition init point for a real codec
      it.map { f =>
        val (w, h, frames, samples) = f.media_type match {
          case "image" =>
            val img = decodeImage(f.payload)
            (img.getWidth, img.getHeight, 1, imageLuma(img))
          case "audio" =>
            val (rate, ch, fr, pcm) = decodeAudio(f.payload)
            (ch, rate, fr.toInt, pcm)
          case _ =>
            val (sw, sh, fr) = decodeStub(f.media_type, f.payload)
            (sw, sh, fr, lumaSamples(f.payload))
        }
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
