package graft.tools

/** One-off: run the narrow extraction pass repeatedly so jstack sampling
  * can see where kernel time goes (poor man's profiler; guide §7.3).
  */
object NarrowLoop {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = graft.io.SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.1", 64).cache()
    pages.count()
    println("WARMED pid=" + ProcessHandle.current().pid())
    val mode = sys.env.getOrElse("NARROWLOOP_MODE", "extract")
    for (i <- 1 to 60) {
      val t = System.nanoTime()
      if (mode == "generate")
        graft.io.SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.1", 16)
          .write.format("noop").mode("overwrite").save()
      else
        graft.pipeline.Extract.runNarrow(pages).toDF().write
          .format("noop").mode("overwrite").save()
      println(f"NARROW rep$i ${(System.nanoTime() - t) / 1e9}%.3f")
    }
    spark.stop()
  }
}
