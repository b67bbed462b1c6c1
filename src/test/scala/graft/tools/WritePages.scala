package graft.tools

/** Test-scope helper: dump the synthetic pages table as parquet for manual
  * job driving. Usage: `Test/runMain graft.tools.WritePages <sfDir> <outDir>`
  * (both required — an earlier single-arg form treated a mistyped sf dir as
  * the OUTPUT and overwrote it; see TESTDATA_INCIDENT.md).
  */
object WritePages {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: WritePages <sfDir> <outDir>")
    val Array(sfDir, outDir) = args
    graft.io.PathGuard.checkWritable(outDir)
    val spark = graft.TestSpark.spark
    graft.io.SyntheticPages.fromDocuments(spark, sfDir)
      .write.mode("overwrite").parquet(outDir)
    println(s"pages written to $outDir")
    spark.stop()
  }
}
