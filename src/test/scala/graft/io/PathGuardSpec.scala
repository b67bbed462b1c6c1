package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode

class PathGuardSpec extends AnyFunSuite {

  test("protected roots are refused: exact, subdir, traversal, file: scheme") {
    val bad = Seq(
      "/root/testdata",
      "/root/testdata/sf0.001",
      "/root/testdata/sf0.01/documents.parquet",
      "/root/reference/backend",
      "/root/repo/../testdata/sf0.001",       // dot-dot traversal
      "/tmp/../root/testdata/x",
      "file:/root/testdata/sf0.001",          // scheme-disguised
      "file:///root/testdata/sf0.001")
    bad.foreach { p =>
      val e = intercept[IllegalArgumentException](PathGuard.checkWritable(p))
      assert(e.getMessage.contains("read-only data dir"), s"$p: ${e.getMessage}")
    }
  }

  test("ordinary output paths pass through unchanged") {
    val ok = Seq("/tmp/out", "/tmp/graft/deep/dir", "target/scratch",
      "/root/repo/target/x", "/root/testdata2/not-the-protected-root")
    ok.foreach(p => assert(PathGuard.checkWritable(p) == p))
  }

  test("every TableIO write refuses a protected target before touching Spark") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](
      ParquetIO.write(df, "/root/testdata/sf0.001/documents.parquet", SaveMode.Overwrite))
    intercept[IllegalArgumentException](
      ParquetIO.overwritePartitions(df, "/root/testdata/sf0.01", "k"))
    intercept[IllegalArgumentException](
      ParquetIO.deletePartitions(spark, "/root/testdata/sf0.1", "k", Seq(1)))
    // the protected dir's content is intact (guard fired pre-write)
    assert(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists)
  }
}
