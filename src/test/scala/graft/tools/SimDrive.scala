package graft.tools

import org.apache.spark.sql.functions._

/** Scratch drive for the similarity oracles: checks that s03's IVF probe
  * reproduces the exact top-10 at the query's nprobe, and that s04's LSH
  * candidates cover every planted near-dup pair, on each testdata sf dir.
  * `sbt "Test/runMain graft.tools.SimDrive"`.
  */
object SimDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-sim-drive")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).as[Array[Double]].head()

      val exact = graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(r => (r.getAs[Number](0).longValue, r.getDouble(1)))
      val index = graft.ops.Similarity.buildIvf(emb, "vec_id", "embedding", numLists = 16)
      for (np <- Seq(4, 8, 12)) {
        val ivf = graft.ops.Similarity.ivfTopK(index, q, 10, nprobe = np)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        val same = ivf.map(_._1).sameElements(exact.map(_._1))
        println(s"[sim] $sf nprobe=$np exact_match=$same " +
          s"recall=${ivf.map(_._1).toSet.intersect(exact.map(_._1).toSet).size}/10")
      }

      val rows = graft.SparkEntry.queries("s04_cosine_near_dups")(spark, sf).collect()
      val planted = rows.count(r => r.getLong(1) - r.getLong(0) == 100000L)
      println(s"[sim] $sf s04 rows=${rows.length} planted_found=$planted/500 " +
        s"cross=${rows.length - planted}")
    }
    spark.stop()
  }
}
