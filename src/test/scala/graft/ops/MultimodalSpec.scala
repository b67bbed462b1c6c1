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
