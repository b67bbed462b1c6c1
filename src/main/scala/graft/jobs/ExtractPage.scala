package graft.jobs

import java.nio.file.{Files, Paths}

/** One-shot CLI — the rebuild's analogue of the reference's one-shot CLI
  * entry (`backend/src/interfaces/cli/menu.py:27-131`): extract one page
  * (HTML or PDF payload) from a file and print the result. Pure JVM, no
  * SparkSession — the same kernel code the Spark pipeline runs per row,
  * which makes this the debugging surface for the extraction kernels.
  *
  * Usage: runMain graft.jobs.ExtractPage <file> [--blocks]
  */
object ExtractPage {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: ExtractPage <file> [--blocks]"); sys.exit(2) }
    val bytes = Files.readAllBytes(Paths.get(args(0)))
    val showBlocks = args.contains("--blocks")
    val res = graft.pipeline.Kernel.extractOne(bytes)
    println(s"route=${res.docType} charset=${res.charset} status=${res.status}" +
      s" confidence=${"%.1f".format(res.confidence)} pages=${res.pageCount}")
    if (res.error != null) println(s"error=${res.error}")
    res.tables.zipWithIndex.foreach { case (t, i) =>
      println(s"table[$i] conf=${"%.2f".format(t.confidence)} rows=${t.data.size}: " +
        t.data.map(_.mkString("|")).mkString(" / "))
    }
    if (showBlocks) println(s"spans=${res.spans.mkString(",")}")
    println("---TEXT---")
    println(res.text)
    println("---END---")
  }
}
