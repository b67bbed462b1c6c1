package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Format seam (SURVEY §7.6): all pipeline reads/writes go through this
  * trait so the local Parquet implementation swaps for an Iceberg catalog
  * (`writeTo` + `MERGE INTO` on url + snapshot manifests) once the runtime
  * jar is present — nothing in pipeline/, html/ or pdf/ names a format.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  /** Read tolerating in-place schema evolution (columns ADDED across engine
    * versions — e.g. the checkpoint manifest's `fp_version`): rows written
    * before the addition surface the new column as null. Default delegates
    * to [[read]] (Iceberg evolves schemas natively); the Parquet impl pays
    * a mergeSchema footer union — acceptable for small metadata tables,
    * deliberately NOT the default for data reads.
    */
  def readEvolving(spark: SparkSession, table: String): DataFrame = read(spark, table)
  def write(df: DataFrame, table: String, mode: SaveMode): Unit
  /** Overwrite only the key-partitions present in `df` (exactly-once resume
    * building block; Iceberg: dynamic overwrite / MERGE).
    */
  def overwritePartitions(df: DataFrame, table: String, partitionCol: String): Unit
  /** Drop whole key-partitions (resume drift tombstoning; Iceberg:
    * `DELETE FROM t WHERE partitionCol IN (...)`).
    */
  def deletePartitions(spark: SparkSession, table: String, partitionCol: String,
                       keys: Seq[Int]): Unit
  def exists(spark: SparkSession, table: String): Boolean
}

/** Local Parquet implementation; `table` is a directory path. */
object ParquetIO extends TableIO {
  def read(spark: SparkSession, table: String): DataFrame = spark.read.parquet(table)

  override def readEvolving(spark: SparkSession, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(table)

  def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(PathGuard.checkWritable(table))

  def overwritePartitions(df: DataFrame, table: String, partitionCol: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic") // per-write, no session mutation
      .partitionBy(partitionCol)
      .mode(SaveMode.Overwrite)
      .parquet(PathGuard.checkWritable(table))

  def deletePartitions(spark: SparkSession, table: String, partitionCol: String,
                       keys: Seq[Int]): Unit = {
    val base = new org.apache.hadoop.fs.Path(PathGuard.checkWritable(table))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    keys.foreach { k =>
      val p = new org.apache.hadoop.fs.Path(base, s"$partitionCol=$k")
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  def exists(spark: SparkSession, table: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }
}
