package graft.jobs

import org.apache.spark.sql.SparkSession

/** Print the rows of one or more [[graft.SparkEntry.queries]] entries —
  * the drive point for eyeballing a query's actual output (BenchOne only
  * counts). Usage: runMain graft.jobs.ShowQuery <sfDir> <query> [query...]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShowQuery <sfDir> <query> [query...]")
    val unknown = args.drop(1).filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}; " +
      s"valid: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"=== $q")
      graft.SparkEntry.queries(q)(spark, args(0)).show(50, truncate = false)
      // SparkEntry cache contract: multi-query callers release each
      // query's persisted scratch after materializing its result
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
