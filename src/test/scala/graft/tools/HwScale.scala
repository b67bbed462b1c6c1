package graft.tools

/** Hardware-ceiling microbenches backing BENCH/BASELINE.md's residual-gap
  * analysis: what does THIS box's memory system and core pool actually give
  * a T-thread workload, independent of Spark and of the kernel?
  *
  *  - `alloc T`: aggregate allocate+touch bandwidth at T threads (fresh
  *    64 KB char arrays, every 16th slot written). The single shared memory
  *    bus is the resource a 4N-node cluster multiplies by 4 and this box
  *    cannot.
  *  - `cpu T`: pure-ALU per-thread throughput at T threads (xorshift64, no
  *    allocation, no shared memory) — isolates frequency scaling and
  *    hypervisor steal from memory effects.
  *
  * Usage: Test/runMain graft.tools.HwScale [alloc|cpu] [threads] [secs]
  */
object HwScale {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "alloc"
    val threads = if (args.length > 1) args(1).toInt else 16
    val secs = if (args.length > 2) args(2).toInt else 4
    val totals = new Array[Long](threads)
    val end = System.nanoTime() + secs * 1000000000L
    val ts = (0 until threads).map { id =>
      new Thread(() => {
        if (mode == "alloc") {
          var b = 0L
          var sink = 0
          while (System.nanoTime() < end) {
            val arr = new Array[Char](32768)
            var i = 0
            while (i < arr.length) { arr(i) = i.toChar; i += 16 }
            b += arr.length * 2L
            sink ^= arr(128)
          }
          totals(id) = b
          if (sink == 42) print("")
        } else {
          var x = 88172645463325252L + id
          var n = 0L
          while (System.nanoTime() < end) {
            var i = 0
            while (i < 100000) {
              x ^= x << 13; x ^= x >>> 7; x ^= x << 17
              i += 1
            }
            n += 100000
          }
          totals(id) = n
          if (x == 42) print("")
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val tot = totals.sum
    if (mode == "alloc")
      println(f"alloc threads=$threads%d aggregate=${tot / (secs * 1e9)}%.2f GB/s")
    else
      println(f"cpu threads=$threads%d per-thread=${tot / (secs * 1e9) / threads}%.3f Giter/s")
  }
}
