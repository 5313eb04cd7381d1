package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal
import graft.functions.Multimodal._

/** End-to-end test of the multimodal plumbing over REAL containers
  * (PNG via javax.imageio, WAV via javax.sound.sampled, AVI/MJPEG via
  * the RIFF chunk walker + javax.imageio frame decode): schema, batch
  * shape, determinism, codec dispatch in the actual pipeline entry
  * point (extractFeatures), and downstream composability (features →
  * cosine ops).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** One media file per document: every third doc a real PNG, a real
    * WAV, or a real AVI/MJPEG — all pure functions of doc_id. */
  private def files = {
    val s = spark
    import s.implicits._
    Tables
      .documents(s, sf)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        val mt = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val payload = mt match {
          case "image" =>
            Multimodal.encodePng(
              8 + (id % 24).toInt, 8 + (id % 17).toInt, seed = id, gray = id % 5 == 0)
          case "audio" =>
            Multimodal.encodeWav(
              8000 + 100 * (id % 40).toInt, 1 + (id % 2).toInt, 50 + (id % 100).toInt, seed = id)
          case _ =>
            Multimodal.encodeAvi(
              8 + (id % 24).toInt, 8 + (id % 17).toInt, 2 + (id % 4).toInt, seed = id)
        }
        MediaFile(id, mt, payload)
      }
  }

  test("extractFeatures dispatches ALL media types through the REAL codecs; schema + determinism") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.extractFeatures(files, dim = 16)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "byte_len", "width", "height", "n_frames", "features"))
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.features.length == 16), "resize must fix feature width")
    // image metadata comes from the real decoder — must equal the
    // generating expressions, frame count 1
    rows.filter(_.media_type == "image").foreach { r =>
      assert(r.width == 8 + (r.doc_id % 24).toInt && r.height == 8 + (r.doc_id % 17).toInt)
      assert(r.n_frames == 1)
    }
    // audio: width := channels, height := sampleRateHz, n_frames := frames
    rows.filter(_.media_type == "audio").foreach { r =>
      assert(r.width == 1 + (r.doc_id % 2).toInt)
      assert(r.height == 8000 + 100 * (r.doc_id % 40).toInt)
      assert(r.n_frames == 50 + (r.doc_id % 100).toInt)
    }
    // video metadata comes from the real AVI header (cross-checked
    // against every decoded MJPEG frame inside decodeVideo)
    rows.filter(_.media_type == "video").foreach { r =>
      assert(r.width == 8 + (r.doc_id % 24).toInt && r.height == 8 + (r.doc_id % 17).toInt)
      assert(r.n_frames == 2 + (r.doc_id % 4).toInt)
    }
    // determinism: identical second run
    val again = Multimodal.extractFeatures(files, dim = 16).collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id)).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.media_type == b.media_type && a.byte_len == b.byte_len &&
      a.width == b.width && a.height == b.height && a.n_frames == b.n_frames &&
      a.features.sameElements(b.features)
    })
    // a payload MISLABELED as image must fail the real decoder, not
    // silently yield fabricated metadata (the stub's old behavior)
    val bad = Seq(MediaFile(1L, "image", "not an image".getBytes("UTF-8"))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, dim = 4).collect()
    }
    // an UNKNOWN media type fails loudly — no fabricated-metadata path left
    val unk = Seq(MediaFile(1L, "hologram", Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(unk, dim = 4).collect()
    }
  }

  test("real AVI/MJPEG codec slice: encode→decode round trip, reject garbage and truncation") {
    // round trip to the generating dims + frame count; real RIFF magic
    val avi = Multimodal.encodeAvi(23, 11, 4, seed = 42L)
    assert(new String(avi.take(4), "US-ASCII") === "RIFF", "payload is not a real RIFF container")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    assert(Multimodal.decodeVideoInfo(avi) === ((23, 11, 4)))
    // deterministic bytes per (w, h, frames, seed)
    assert(Multimodal.encodeAvi(23, 11, 4, 42L).sameElements(avi))
    // decoded samples are the concatenated per-frame luma planes
    val (_, _, fr, luma) = Multimodal.decodeVideo(avi)
    assert(luma.length == 23 * 11 * fr)
    assert(luma.forall(v => v >= 0.0f && v <= 1.0f))
    // distinct frames: the luma planes differ across frame indices
    assert(luma.slice(0, 23 * 11).toSeq != luma.slice(23 * 11, 2 * 23 * 11).toSeq)
    // a real parser rejects non-video bytes instead of inventing metadata
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoInfo("definitely not a video".getBytes("UTF-8"))
    }
    // ... a truncated container fails at the RIFF size check
    intercept[IllegalArgumentException] { Multimodal.decodeVideoInfo(avi.take(avi.length - 10)) }
    // ... and a WAV mislabeled as video fails (RIFF but not AVI)
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoInfo(Multimodal.encodeWav(8000, 1, 10, 1L))
    }
  }

  test("sampleFrames explodes video payloads into strided fixed-size frames") {
    val s = spark
    import s.implicits._
    val vids = files.filter(_.media_type == "video")
    val frames = Multimodal.sampleFrames(vids, frameBytes = 32, stride = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).toSeq.sorted == fs.map(_.frame_idx).toSeq.sorted.distinct)
      assert(fs.forall(_.frame_idx % 2 == 0), "stride must skip odd frames")
      assert(fs.forall(_.frame.length <= 32))
    }
  }

  test("real PNG codec slice: encode→decode round trip, colorspaces, reject garbage") {
    // RGB and grayscale round-trip to the generating dimensions/bands
    val rgb = Multimodal.encodePng(23, 11, seed = 42L, gray = false)
    assert(rgb.take(8).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "payload is not a real PNG container")
    assert(Multimodal.decodeImageInfo(rgb) === ((23, 11, 3)))
    val gray = Multimodal.encodePng(9, 17, seed = 7L, gray = true)
    assert(Multimodal.decodeImageInfo(gray) === ((9, 17, 1)))
    // deterministic bytes per (w, h, seed, colorspace)
    assert(Multimodal.encodePng(23, 11, 42L, gray = false).sameElements(rgb))
    // JPEG goes through the same decode path (dims exact despite lossy
    // pixels) — the multi-format claim, not just PNG
    val img = new java.awt.image.BufferedImage(31, 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer in this JDK")
    assert(Multimodal.decodeImageInfo(bos.toByteArray) === ((31, 13, 3)))
    // a real decoder rejects non-image bytes instead of inventing metadata
    intercept[IllegalArgumentException] {
      Multimodal.decodeImageInfo("not an image at all".getBytes("UTF-8"))
    }
    // ... and truncated PNGs fail rather than decode partially
    intercept[Exception] { Multimodal.decodeImageInfo(rgb.take(20)) }
  }

  test("real WAV codec slice: encode→decode round trip, reject garbage and truncation") {
    // mono and stereo round-trip to the generating metadata
    val mono = Multimodal.encodeWav(8000, 1, 123, seed = 42L)
    assert(new String(mono.take(4), "US-ASCII") === "RIFF", "payload is not a real WAV container")
    assert(new String(mono.slice(8, 12), "US-ASCII") === "WAVE")
    assert(Multimodal.decodeAudioInfo(mono) === ((8000, 1, 123L)))
    val stereo = Multimodal.encodeWav(11025, 2, 77, seed = 7L)
    assert(Multimodal.decodeAudioInfo(stereo) === ((11025, 2, 77L)))
    // deterministic bytes per (rate, channels, frames, seed)
    assert(Multimodal.encodeWav(8000, 1, 123, 42L).sameElements(mono))
    // decoded PCM is normalized and full-length (frames × channels)
    val (_, ch, fr, pcm) = Multimodal.decodeAudio(stereo)
    assert(pcm.length == ch * fr)
    assert(pcm.forall(v => v >= -1.0f && v <= 1.0f))
    // a real parser rejects non-audio bytes instead of inventing metadata
    intercept[IllegalArgumentException] {
      Multimodal.decodeAudioInfo("certainly not audio".getBytes("UTF-8"))
    }
    // ... and a truncated container fails rather than decode partially
    intercept[Exception] { Multimodal.decodeAudioInfo(mono.take(mono.length - 10)) }
  }

  test("features compose with the similarity operators (array<float> downstream)") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.extractFeatures(files, dim = 16).limit(50)
    // quantized self-cosine must be 1 for non-zero vectors
    val df = feats
      .select(col("doc_id"), transform(col("features"), x => x.cast("double")).as("v"))
      .withColumn(
        "dot",
        aggregate(zip_with(col("v"), col("v"), (a, b) => floor(a * b * 1000000.0 + 0.5)), lit(0.0), (a, b) => a + b) / 1000000.0
      )
    assert(df.filter(col("dot") > 0).count() > 0)
  }
}
