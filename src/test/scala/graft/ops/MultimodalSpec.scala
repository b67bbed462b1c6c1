package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("synthesize: deterministic payloads, all three kinds, typed metadata") {
    val a = Multimodal.synthesize(docs).orderBy("doc_id").collect()
    val b = Multimodal.synthesize(docs.repartition(8)).orderBy("doc_id").collect()
    assert(a.length == 500)
    assert(a.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[Array[Byte]]("payload").sameElements(y.getAs[Array[Byte]]("payload")))
    }
    val img = a.find(_.getAs[String]("kind") == "image").get
    assert(img.getAs[Int]("width") > 0 && img.getAs[Int]("height") > 0)
    val vid = a.find(_.getAs[String]("kind") == "video").get
    assert(vid.getAs[Int]("duration_ms") > 0)
  }

  test("extractFeatures: histogram features normalized; video samples frames") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(docs)).cache()
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0) < 1e-9, s"not normalized: ${f.sum}")
    }
    val vids = feats.where(col("kind") === "video").collect()
    assert(vids.forall(_.getAs[Int]("frames_sampled") == 4))
    assert(feats.where(col("kind") =!= "video")
      .collect().forall(_.getAs[Int]("frames_sampled") == 0))
    feats.unpersist()
  }

  test("image payloads are real PNGs; dims match the typed metadata") {
    val imgs = Multimodal.synthesize(docs)
      .where(col("kind") === "image").limit(20).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(decoded != null, "payload is not a decodable image")
      assert(decoded.getWidth == r.getAs[Int]("width"))
      assert(decoded.getHeight == r.getAs[Int]("height"))
    }
  }

  test("decodeImage: known pixel values land in the right luminance bins") {
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val black = Multimodal.decodeImage(png(0x000000)).get
    assert(black(0) == 1.0 && black.sum == 1.0)
    val white = Multimodal.decodeImage(png(0xFFFFFF)).get
    assert(white(15) == 1.0)
    // mid gray 0x808080 → luminance 128 → bin 8
    val gray = Multimodal.decodeImage(png(0x808080)).get
    assert(gray(8) == 1.0)
    assert(Multimodal.decodeImage(Array.fill[Byte](32)(7)).isEmpty)
  }

  test("decodeAudio: real WAV samples drive the histogram") {
    // constant max-positive samples → all mass in the top bin
    val wav = {
      val base = Multimodal.synthesizeWav(1L, 100)
      val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 100).foreach(i => bb.putShort(44 + 2 * i, 32767.toShort))
      base
    }
    val f = Multimodal.decodeAudio(wav).get
    assert(f(15) == 1.0 && f.sum == 1.0)
    assert(Multimodal.decodeAudio(Array.fill[Byte](32)(7)).isEmpty)
    // synthesized corpus audio decodes for real
    val a = Multimodal.synthesize(docs).where(col("kind") === "audio").limit(5).collect()
    a.foreach { r =>
      assert(Multimodal.decodeAudio(r.getAs[Array[Byte]]("payload")).isDefined)
    }
  }

  test("resizeImages: payload actually re-encoded at the clamped size") {
    val assets = Multimodal.synthesize(docs)
    val resized = Multimodal.resizeImages(assets, 16, 16)
    val imgs = resized.where(col("kind") === "image").limit(20).collect()
    imgs.foreach { r =>
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(decoded.getWidth <= 16 && decoded.getHeight <= 16)
      assert(decoded.getWidth == r.getAs[Int]("width"))
      assert(decoded.getHeight == r.getAs[Int]("height"))
    }
    // non-image rows pass through untouched (video frame dims preserved)
    val vid = resized.where(col("kind") === "video").limit(1).collect()(0)
    assert(vid.getAs[Int]("width") == Multimodal.FrameW)
  }

  test("video: GMJ1 container round-trips real PNG frames with known pixels") {
    val id = 2L
    val nf = 4 + (Dedup.splitmix64(id) & 0x7L).toInt
    val payload = Multimodal.synthesizeVideo(id, nf)
    val frames = Multimodal.decodeVideoFrames(payload).get
    assert(frames.length == nf)
    // frame f pixel (x, y) is splitmix64(id*7919 + f*100003 + y*131 + x)
    frames.zipWithIndex.foreach { case (png, f) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == Multimodal.FrameW && img.getHeight == Multimodal.FrameH)
      val expect = (Dedup.splitmix64(id * 7919L + f * 100003L + 3 * 131L + 5) & 0xFFFFFF).toInt
      assert((img.getRGB(5, 3) & 0xFFFFFF) == expect, s"frame $f pixel mismatch")
    }
    // feature path: 4 sampled frames, counts sum to 4 × FrameW × FrameH
    val (sampled, d) = Multimodal.decodeVideoCounts(payload).get
    assert(sampled == 4)
    assert(d.hist.sum == 4L * Multimodal.FrameW * Multimodal.FrameH)
    assert(d.width == Multimodal.FrameW && d.height == Multimodal.FrameH)
    // truncated container is rejected, not mis-decoded
    assert(Multimodal.decodeVideoFrames(payload.take(payload.length - 3)).isEmpty)
    assert(Multimodal.decodeVideoFrames("nope".getBytes).isEmpty)
  }

  test("sampleFrameIndices: evenly spaced, distinct, bounded") {
    assert(Multimodal.sampleFrameIndices(8, 4) == Seq(0, 2, 4, 6))
    assert(Multimodal.sampleFrameIndices(4, 4) == Seq(0, 1, 2, 3))
    assert(Multimodal.sampleFrameIndices(11, 4) == Seq(0, 2, 5, 8))
    assert(Multimodal.sampleFrameIndices(2, 4) == Seq(0, 1)) // fewer frames than n
    assert(Multimodal.sampleFrameIndices(0, 4).isEmpty)
  }

  test("extractFeatures: hist counts are the unnormalized features") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(docs.limit(30))).collect()
    feats.foreach { r =>
      val hist = r.getAs[scala.collection.Seq[Long]]("hist")
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      val total = hist.sum.toDouble
      hist.zip(f).foreach { case (c, x) => assert(math.abs(c / total - x) < 1e-12) }
      r.getAs[String]("kind") match {
        case "image" =>
          assert(hist.sum == r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
        case "video" => assert(hist.sum == 4L * Multimodal.FrameW * Multimodal.FrameH)
        case _ => assert(hist.sum > 0)
      }
    }
  }

  test("resize stub clamps dimensions, keeps aspect, leaves payload") {
    val assets = Multimodal.synthesize(docs)
    val resized = Multimodal.resize(assets, 320, 240)
    val img = resized.where(col("kind") === "image").collect()
    img.foreach { r =>
      assert(r.getAs[Int]("width") <= 320 && r.getAs[Int]("height") <= 240)
    }
    // audio rows (width=0) unharmed
    assert(resized.where(col("kind") === "audio" && col("width") === 0).count() > 0)
  }
}
