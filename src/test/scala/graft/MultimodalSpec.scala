package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal
import graft.functions.Multimodal._

/** End-to-end test of the multimodal plumbing over real fixture bytes
  * (documents.text as utf-8 payloads): schema, batch shape, determinism,
  * and downstream composability (features → cosine ops) — everything
  * except the codec, which is the clearly-marked deterministic stub.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def files = {
    val s = spark
    import s.implicits._
    Tables
      .documents(s, sf)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("media_type"),
        encode(col("text"), "utf-8").as("payload")
      )
      .as[MediaFile]
  }

  test("extractFeatures: fixed-width features, typed schema, deterministic") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.extractFeatures(files, dim = 16)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "byte_len", "width", "height", "n_frames", "features"))
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.features.length == 16), "resize must fix feature width")
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    assert(rows.filter(_.media_type == "image").forall(_.n_frames == 1))
    assert(rows.filter(_.media_type == "video").forall(_.n_frames > 1))
    // determinism: identical second run
    val again = Multimodal.extractFeatures(files, dim = 16).collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id)).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.media_type == b.media_type && a.byte_len == b.byte_len &&
      a.width == b.width && a.height == b.height && a.n_frames == b.n_frames &&
      a.features.sameElements(b.features)
    })
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
