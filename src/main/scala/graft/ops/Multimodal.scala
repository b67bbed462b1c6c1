package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The Spark-side contract here is real and tested — schema, partitioning,
  * batch iteration shape, deterministic outputs. The codec step itself is a
  * STUB (`fakeDecode`): this container has no image/audio libraries, so the
  * "decoder" is a deterministic byte-statistics transform with the same
  * signature a real decoder would have (swap `fakeDecode` for a JNI/FFM
  * codec without touching any pipeline code).
  */
object Multimodal {

  final case class AssetMeta(kind: String, width: Int, height: Int,
                             duration_ms: Int, format: String)
  final case class Asset(doc_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, duration_ms: Int, format: String)
  final case class AssetFeatures(doc_id: Long, kind: String, byte_len: Int,
                                 features: Array[Double], frames_sampled: Int)

  /** Deterministic synthetic assets derived from doc ids (no external data):
    * kind rotates image/audio/video; payload bytes are a splitmix64 stream
    * of the id — stable across runs, machines and partitionings.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 256 + (Dedup.splitmix64(id) & 0x3FFL).toInt // 256..1279 bytes
      val payload = new Array[Byte](len)
      var i = 0
      var h = Dedup.splitmix64(id * 31 + 7)
      while (i < len) {
        payload(i) = (h >>> ((i % 8) * 8)).toByte
        if (i % 8 == 7) h = Dedup.splitmix64(h)
        i += 1
      }
      val (w, hgt, dur, fmt) = kind match {
        case "image" => (640 + (id % 4).toInt * 160, 480, 0, "png")
        case "audio" => (0, 0, 1000 + (id % 60).toInt * 500, "wav")
        case _ => (1280, 720, 2000 + (id % 30).toInt * 1000, "mp4")
      }
      Asset(id, kind, payload, w, hgt, dur, fmt)
    }).toDF()
  }

  /** STUB decode: 16-bin byte histogram, L1-normalized. A real decoder
    * (e.g. an FFM-bound libjpeg/ffmpeg) replaces ONLY this function.
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val total = math.max(payload.length, 1).toDouble
    var b = 0
    while (b < 16) { bins(b) /= total; b += 1 }
    bins
  }

  /** Deterministic frame sampling for video payloads: n evenly-spaced
    * 32-byte windows (a real impl samples decoded frames; offsets shape
    * is identical).
    */
  def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || n <= 0) return Nil
    (0 until n).map { k =>
      val off = (payload.length.toLong * k / n).toInt
      java.util.Arrays.copyOfRange(payload, off, math.min(off + 32, payload.length))
    }
  }

  /** Batched feature extraction: one partition = one batch loop, decoder
    * state reusable across rows (the mapInPandas batch shape, JVM-native).
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here (reference analogue:
        // per-process adapter instance, adapter_factory.py:22-35)
        it.map { case (id, kind, payload) =>
          val frames = if (kind == "video") sampleFrames(payload, 4) else Nil
          val base = if (kind == "video" && frames.nonEmpty)
            frames.map(fakeDecode).transpose.map(_.sum / frames.length).toArray
          else fakeDecode(payload)
          AssetFeatures(id, kind, payload.length, base, frames.size)
        }
      }.toDF()
  }

  /** Resize stub: metadata transform only (payload untouched — a real
    * implementation re-encodes; the pipeline contract is the schema).
    */
  def resize(assets: DataFrame, maxW: Int, maxH: Int): DataFrame =
    assets
      .withColumn("scale", least(lit(1.0),
        least(lit(maxW) / greatest(col("width"), lit(1)),
          lit(maxH) / greatest(col("height"), lit(1)))))
      .withColumn("width", (col("width") * col("scale")).cast("int"))
      .withColumn("height", (col("height") * col("scale")).cast("int"))
      .drop("scale")
}
