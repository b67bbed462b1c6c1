package graft.tools

/** Scratch drive of the driver's flagship smoke: SparkEntry.entry must
  * return rows > 0 on sf0.001-derived pages.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows = $n")
    spark.stop()
  }
}
