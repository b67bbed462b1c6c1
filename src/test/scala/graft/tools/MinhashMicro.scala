package graft.tools
object MinhashMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(5000)(i => s"word$i")
    val docs = Vector.fill(2000)(Vector.fill(200)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val p = graft.ops.Dedup.MinHashParams()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val runs = (1 to 5).map { _ => val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6 }
      println(f"$label%-28s min=${runs.min}%8.1f ms  (${runs.min * 1000 / docs.size}%6.1f us/doc)")
    }
    time("full signature") { docs.foreach(d => graft.ops.Dedup.minhashSignature(d, p)) }
    time("tokenize-ish (regex split)") { docs.foreach(d => d.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+").length) }
    time("simhash64") { docs.foreach(d => graft.ops.Dedup.simhash64(d)) }
  }
}
