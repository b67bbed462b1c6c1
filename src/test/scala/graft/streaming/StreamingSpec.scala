package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.SyntheticPages

/** Incremental extraction: AvailableNow drains only unseen files; restart
  * picks up exactly the new ones (streaming-checkpoint exactly-once).
  */
class StreamingSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark

  test("availableNow drains new files only, exactly once, byte-identical") {
    val base = Files.createTempDirectory("stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    val pages = SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.001").cache()
    val batch1 = pages.where(col("url").endsWith("0")) // subset
    val batch2 = pages.where(col("url").endsWith("1"))
    val n1 = batch1.count(); val n2 = batch2.count()
    assert(n1 > 0 && n2 > 0)

    batch1.write.parquet(inDir)
    val afterFirst = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterFirst == n1)

    // second drain with no new input: nothing double-processed
    val afterNoop = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterNoop == n1)

    // new files arrive; only they are processed
    batch2.write.mode("append").parquet(inDir)
    val afterSecond = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterSecond == n1 + n2)

    // byte-identical to golden for every streamed row
    val out = spark.read.parquet(outDir).select(col("url"), col("text").as("actual"))
    val golden = pages.select(col("url"), col("text").as("expected"))
    val mismatches = out.join(golden, "url")
      .where(not(col("actual") <=> col("expected"))).count()
    assert(mismatches == 0)
    pages.unpersist()
  }
}
