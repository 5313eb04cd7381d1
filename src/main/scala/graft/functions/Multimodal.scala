package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: opaque binary payloads (image/audio/video)
  * with typed metadata, decoded and featurized per partition
  * (SURVEY §2.2 "multimodal columns"; north-star brief).
  *
  * The real Spark-side machinery here — typed schemas, per-partition
  * batched processing, bounded memory, deterministic output — is
  * production-shaped, and ALL THREE codecs are real:
  *  - IMAGE (`decodeImage`): javax.imageio parses actual PNG/JPEG/GIF/
  *    BMP containers and pixels;
  *  - AUDIO (`decodeAudio`): javax.sound.sampled parses actual WAV/AIFF
  *    containers and PCM frames;
  *  - VIDEO (`decodeVideo`): a RIFF/AVI container parser (chunk walk,
  *    `avih` main header, `movi` frame chunks) whose MJPEG frames are
  *    decoded by the real image codec — pure JDK, no external library.
  * Each is what [[extractFeatures]] — the pipeline entry point —
  * dispatches its media type through, and each is oracle-gated
  * end-to-end (`mm_image_decode`, `mm_audio_decode`, `mm_video_decode`
  * round-trip generated real containers). An UNKNOWN media type fails
  * loudly instead of yielding fabricated metadata. Swapping the MJPEG
  * frame codec for a broader one (e.g. H.264 via JNI/javacpp) changes
  * no schema, partitioning, or call signature.
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

  /** ======== REAL CODEC (video slice) ========
    * Decode actual video bytes — a RIFF/AVI container with MJPEG frames,
    * the classic pre-H.264 interchange format — into (width, height,
    * frameCount). A real container parser: the RIFF chunk tree is
    * walked (LIST `hdrl` → `avih` main header; LIST `movi` → `..dc`/
    * `..db` frame chunks), every frame is decoded by the REAL image
    * codec ([[decodeImage]]) and its dimensions checked against the
    * header, and the frame count found in the stream is checked against
    * the header's declared total — so garbage FAILS at the magic bytes,
    * a truncated container fails at the RIFF size or frame count, and a
    * mislabeled payload fails in the frame codec, instead of any of them
    * producing fake metadata. Pure JDK (the MJPEG frames ride
    * javax.imageio's JPEG reader); a broader codec (H.264 via JNI)
    * would slot in at the frame-decode call with no interface change. */
  def decodeVideoInfo(payload: Array[Byte]): (Int, Int, Int) = {
    val (w, h, frames, _) = decodeVideo(payload)
    (w, h, frames)
  }

  /** Real video decode to metadata + concatenated per-frame luma planes
    * (the sample stream [[extractFeatures]] pools — REAL decoded
    * pixels across time, so the pooled features carry a temporal
    * signature). */
  private[graft] def decodeVideo(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"undecodable video payload: $msg (${payload.length} bytes)")
    def fcc(off: Int) = new String(payload, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (payload.length < 12) fail("too short for a RIFF header")
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") fail("not a RIFF/AVI container")
    val declaredLen = 8 + u32(4)
    if (declaredLen > payload.length)
      fail(s"truncated container: header declares $declaredLen bytes")
    var w = -1; var h = -1; var declaredFrames = -1
    val lumas = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fcc(off)
        val sz = u32(off + 4).toInt
        val body = off + 8
        if (sz < 0 || body + sz > to) fail(s"chunk '$id' overruns its container")
        if (id == "LIST") {
          if (sz < 4) fail("malformed LIST chunk")
          walk(body + 4, body + sz) // list type fourcc, then sub-chunks
        } else if (id == "avih") {
          if (sz < 40) fail("malformed avih main header")
          declaredFrames = u32(body + 16).toInt // dwTotalFrames
          w = u32(body + 32).toInt              // dwWidth
          h = u32(body + 36).toInt              // dwHeight
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))) {
          if (w <= 0 || h <= 0) fail("frame chunk before the avih header")
          val img = decodeImage(java.util.Arrays.copyOfRange(payload, body, body + sz))
          require(img.getWidth == w && img.getHeight == h,
            s"frame is ${img.getWidth}x${img.getHeight}, header declares ${w}x$h")
          lumas += imageLuma(img)
        }
        off = body + sz + (sz & 1) // RIFF pads odd-length chunks
      }
    }
    walk(12, declaredLen.toInt)
    if (w <= 0 || h <= 0 || declaredFrames < 0) fail("missing avih main header")
    if (lumas.length != declaredFrames)
      fail(s"truncated movi list: header declares $declaredFrames frames, " +
        s"stream holds ${lumas.length}")
    (w, h, declaredFrames, Array.concat(lumas.toSeq: _*))
  }

  /** Deterministic REAL-format video bytes for fixtures/tests: a
    * RIFF/AVI container (avih + vids/MJPG stream headers + movi list)
    * holding `nFrames` REAL JPEG frames whose pixels are a pure function
    * of `seed` and the frame index — so a decode gate's oracle can
    * recompute the expected (width, height, frames) from the generating
    * expression while the payload exercises the real chunk walker AND
    * the real per-frame image codec (the video twin of [[encodePng]] /
    * [[encodeWav]]). */
  def encodeAvi(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(listType) ++ body)
    javax.imageio.ImageIO.setUseCache(false)
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val hh = ((seed * 31 + f) * 31 + y) * 31 + x
          img.setRGB(x, y, (hh & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer available")
      bos.toByteArray
    }
    val avih = le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0) ++ // µs/frame, maxBps, pad, flags
      le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++  // totalFrames, initial, streams, sugBuf
      le32(width.toLong) ++ le32(height.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)                  // dwReserved[4]
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames.toLong) ++
      le32(0) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height) // rcFrame
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ fcc("MJPG") ++ le32(width.toLong * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(j => chunk("00dc", j)).fold(Array.emptyByteArray)(_ ++ _))
    val payload = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(payload.length.toLong) ++ payload
  }

  /** Decode + featurize each partition's files in one pass: mean-pooled
    * `dim`-bucket features over the decoded sample stream (fixed width
    * regardless of payload size — the "resize" step).
    *
    * Dispatch is per media type, and EVERY type goes through a REAL
    * codec — a mislabeled, corrupt, or unknown-typed payload FAILS here
    * rather than yielding fabricated metadata:
    *  - `image` → [[decodeImage]]: (width, height) real, n_frames = 1,
    *    samples = decoded luma plane;
    *  - `audio` → [[decodeAudio]]: width := channels, height :=
    *    sampleRateHz, n_frames := PCM frame count, samples = normalized
    *    PCM (the schema reuses the two spatial slots for the two audio
    *    shape parameters — documented here, stable for downstream ops);
    *  - `video` → [[decodeVideo]]: (width, height, n_frames) from the
    *    real AVI header (cross-checked against every decoded frame),
    *    samples = concatenated per-frame luma planes;
    *  - anything else → IllegalArgumentException.
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
          case "video" =>
            decodeVideo(f.payload)
          case other =>
            throw new IllegalArgumentException(
              s"unknown media type '$other' — expected image|audio|video")
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
