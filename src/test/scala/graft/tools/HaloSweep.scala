package graft.tools

/** Sweep the scanned-doc variant space (one representative doc per variant)
  * and print the ids whose extraction diverges from the golden — used to
  * localize corpus-slice regressions without a Spark run:
  *   sbt -batch "Test/runMain graft.tools.HaloSweep [maxVariant]"
  */
object HaloSweep {
  def main(args: Array[String]): Unit = {
    val maxV = if (args.nonEmpty) args(0).toInt else 6400
    val bad = (0 until maxV).flatMap { v =>
      val id = 50L * v + 17
      val spec = graft.io.SyntheticPages.pageFor(id,
        s"palabras de prueba numero $id con mas contenido util aqui", "es")
      val res = graft.pipeline.Kernel.extractOne(spec.payload)
      if (res.text != spec.golden) Some(v) else None
    }
    println(s"bad variants (${bad.size}): ${bad.take(60).mkString(", ")}")
    bad.take(8).foreach { v =>
      val id = 50L * v + 17
      val spec = graft.io.SyntheticPages.pageFor(id,
        s"palabras de prueba numero $id con mas contenido util aqui", "es")
      val res = graft.pipeline.Kernel.extractOne(spec.payload)
      println(s"v=$v id=$id v%3=${v % 3} enc=${v % 5} dpi7=${v % 7} " +
        s"pitch4=${v % 4} rot=${(v / 3) % 4} skewIdx=${v % graft.ocr.GlyphOcr.SkewCandidates.length}")
      println(s"  want '${spec.golden.replace("\n", "\\n")}'")
      println(s"  got  '${res.text.replace("\n", "\\n")}'")
    }
  }
}
