package graft.tools
object WritePages {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    graft.io.SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(args(0))
    println("pages written to " + args(0))
    spark.stop()
  }
}
