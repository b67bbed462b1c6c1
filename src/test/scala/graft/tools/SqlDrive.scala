package graft.tools

import java.nio.file.{Files, Paths}

/** Scratch drive for the SQL surface (verify recipe): registers the graft_*
  * functions on a fresh session and runs graft_extract over a payload file,
  * exploding the tables struct. `sbt "Test/runMain graft.tools.SqlDrive <file>"`.
  */
object SqlDrive {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/drive/grid-table.pdf"
    val bytes = Files.readAllBytes(Paths.get(path))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-sql-drive")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((path, bytes)).toDF("url", "html").createOrReplaceTempView("pages_v")
    spark.sql(
      """SELECT e.doc_type, e.status, e.confidence, size(e.tables) AS n_tables,
        |       substring(e.text, 1, 60) AS text_head
        |FROM (SELECT graft_extract(html) AS e FROM pages_v)""".stripMargin)
      .show(truncate = false)
    spark.sql(
      """SELECT t.confidence AS table_conf, array_join(r, ' | ') AS cells
        |FROM (SELECT explode(graft_extract(html).tables) AS t FROM pages_v)
        |LATERAL VIEW explode(t.data) AS r""".stripMargin)
      .show(truncate = false)
    spark.stop()
  }
}
