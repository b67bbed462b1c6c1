package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: where an x-query's time goes — payload generation
  * vs extraction vs the final aggregation (noop-style count actions).
  */
object XBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val n = f
      println(f"PART $label rows=$n sec=${(System.nanoTime() - t) / 1e9}%.3f")
    }
    for (_ <- 1 to 3) {
      time("docs-scan") {
        spark.read.parquet(s"$dir/documents.parquet").count()
      }
      time("generate") {
        val p = graft.io.SyntheticPages.fromDocuments(spark, dir)
        val n = p.agg(sum(length(col("html")))).collect()(0).getLong(0)
        n
      }
      time("gen+extract") {
        graft.pipeline.Extract.runNarrow(
          graft.io.SyntheticPages.fromDocuments(spark, dir)).toDF()
          .select("url", "status").count()
      }
      time("x01-full") {
        graft.SparkEntry.queries("x01_extract")(spark, dir).count()
      }
      println("---")
    }
    spark.stop()
  }
}
