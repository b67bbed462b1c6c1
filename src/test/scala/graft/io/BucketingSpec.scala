package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time bucketing = shuffle-free co-located joins (SURVEY §7.6). */
class BucketingSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val stats = docs.select(col("doc_id"), (col("n_chars") * 2).as("twice"))
    Bucketing.writeBucketed(docs, "bspec_docs", "doc_id", 8)
    Bucketing.writeBucketed(stats, "bspec_stats", "doc_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the merge-join path a big
      // fact⋈fact join would take at scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.readTable(spark, "bspec_docs")
        .join(Bucketing.readTable(spark, "bspec_stats"), "doc_id")
      assert(j.count() == 500)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_docs")
      spark.sql("DROP TABLE IF EXISTS bspec_stats")
    }
  }
}
