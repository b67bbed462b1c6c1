package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Ingest-time hash bucketing (SURVEY §7.6): the Iceberg `bucket(N, col)`
  * partition transform expressed through the one Spark-SQL surface that
  * persists bucketing metadata without an Iceberg jar — the session
  * catalog (`bucketBy` + `saveAsTable`).
  *
  * Two tables bucketed the same way on the join key join with ZERO
  * exchanges: at 100 TB that is the difference between a co-located merge
  * join and re-shuffling the fact table on every query. The
  * golden-verification join (extracted ⋈ golden ON url) and the dedup
  * verify joins (pairs ⋈ signatures ON id) are exactly this shape, and the
  * pipeline's url-hash bucket unit (Checkpoint) is chosen so the output
  * lands pre-bucketed for them. BucketingSpec proves the plan (no
  * `Exchange` under a sort-merge join of two bucketed tables).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
