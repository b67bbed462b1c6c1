package graft.tools

/** One-off: partition counts feeding the multimodal and dedup kernels. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("documents partitions = " + docs.rdd.getNumPartitions)
    println("synthesize partitions = " +
      graft.ops.Multimodal.synthesize(docs).rdd.getNumPartitions)
    println("shingleSets partitions = " +
      graft.ops.Dedup.shingleSets(docs, "doc_id", "text").rdd.getNumPartitions)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println("embeddings partitions = " + emb.rdd.getNumPartitions)
    spark.stop()
  }
}
