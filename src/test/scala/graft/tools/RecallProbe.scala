package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: IVF recall@10 vs nprobe on a testdata sf dir. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val index = graft.ops.Similarity.buildIvf(emb, "vec_id", "embedding", numLists = 16)
    val qs = (0L until 10L).map { qid =>
      emb.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).as[Array[Double]].head()
    }
    for (np <- Seq(2, 4, 6, 8, 10, 12, 16)) {
      val recalls = qs.map { q =>
        val bf = graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
          .collect().map(_.getAs[Number]("vec_id").longValue).toSet
        val got = graft.ops.Similarity.ivfTopK(index, q, 10, nprobe = np)
          .collect().map(_.getAs[Number]("id").longValue).toSet
        got.intersect(bf).size.toDouble / bf.size
      }
      println(s"RECALL nprobe=$np mean=${recalls.sum / recalls.size} min=${recalls.min}")
    }
    spark.stop()
  }
}
