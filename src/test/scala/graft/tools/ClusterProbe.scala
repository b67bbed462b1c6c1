package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: per-iteration timing of the d05 cluster loop. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (round <- 1 to 2) {
      var t = System.nanoTime()
      def lap(label: String): Unit = {
        println(f"CL $label ${(System.nanoTime() - t) / 1e9}%.3f")
        t = System.nanoTime()
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = graft.ops.Dedup.shingleSets(docs, "doc_id", "text").persist()
      val sigs = graft.ops.Dedup.signaturesFromSets(sh).persist()
      val cand = graft.ops.Dedup.minhashCandidates(sigs, minEstJaccard = 0.3)
        .select("id_a", "id_b")
      val verified = graft.ops.Dedup.ngramJaccardSets(cand, sh)
        .where(col("jaccard") >= 0.5).select("id_a", "id_b")
      println("CL pairs=" + verified.count()); lap("verify-pipeline")
      val edges = verified.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
        .union(verified.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
        .distinct().persist()
      val nodes = edges.select(col("src").as("id")).distinct()
      val edgesSelf = edges.unionAll(nodes.select(col("id").as("src"), col("id").as("dst"))).persist()
      var labels = nodes.withColumn("label", col("id")).localCheckpoint()
      lap("setup")
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 12) {
        val next = edgesSelf
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min("label").as("label"),
            min(when(col("dst") === col("src"), col("label"))).as("old"))
          .localCheckpoint()
        changed = next.where(col("label") < col("old")).count()
        labels = next.select("id", "label")
        iter += 1
        lap(s"iter$iter changed=$changed")
      }
      spark.catalog.clearCache()
      println("---")
    }
    spark.stop()
  }
}
