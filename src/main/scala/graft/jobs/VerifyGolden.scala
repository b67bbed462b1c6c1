package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Golden-verification job (SURVEY §7.1 jobs/VerifyGolden; the byte-identity
  * gate of tests/validation_test.py made distributed):
  *
  * {{{
  * spark-submit --class graft.jobs.VerifyGolden ocrmainspark.jar \
  *   <extractedDir> <pagesDir> [maxDiffsShown=5]
  * }}}
  *
  * Joins extracted text against the golden `text` column per url and exits
  * non-zero if any row differs; mismatches print as
  * `(url, first_diff_offset, expected_prefix, actual_prefix)` (the byte-level
  * diff reporting shape from FIXTURES.md §4).
  */
object VerifyGolden {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: VerifyGolden <extractedDir> <pagesDir> [maxDiffs]")
      sys.exit(2)
    }
    val maxDiffs = if (args.length > 2) args(2).toInt else 5
    val builder = SparkSession.builder().appName("graft-verify-golden")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]").config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val extracted = spark.read.parquet(args(0)).select(col("url"), col("text").as("actual"))
    val golden = spark.read.parquet(args(1)).select(col("url"), col("text").as("expected"))
    val joined = extracted.join(golden, Seq("url")).cache()
    val total = joined.count()
    val bad = joined.where(not(col("actual") <=> col("expected")))
    val badCount = bad.count()

    bad.limit(maxDiffs).collect().foreach { r =>
      val e = Option(r.getAs[String]("expected")).getOrElse("")
      val a = Option(r.getAs[String]("actual")).getOrElse("")
      val off = e.zip(a).indexWhere { case (x, y) => x != y } match {
        case -1 => math.min(e.length, a.length)
        case i => i
      }
      System.err.println(s"MISMATCH url=${r.getAs[String]("url")} first_diff_offset=$off")
      System.err.println(s"  expected[${off}..]: ${e.drop(off).take(80).replace("\n", "\\n")}")
      System.err.println(s"  actual  [${off}..]: ${a.drop(off).take(80).replace("\n", "\\n")}")
    }
    println(s"""{"job":"verify_golden","total":$total,"mismatched":$badCount,""" +
      s""""byte_identical":${badCount == 0L}}""")
    spark.stop()
    if (badCount != 0L) sys.exit(1)
  }
}
