package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The measurement harness is itself gated: round 3's official bench
  * artifact was single-shot noise (95× off the reproducible number), so the
  * replicate/report machinery that fixed it must not silently regress.
  */
class ScalingBenchSpec extends AnyFunSuite {

  private def run(cores: Int, narrow: Seq[Double], shuffle: Seq[Double],
                  heap: Double = 8.0) =
    ScalingBench.Run(cores, 1000L, 10.0, narrow, shuffle, 1.5, 2.5, heap)

  test("once JSON round-trips through parse with every replicate intact") {
    val r = run(4, Seq(3.5, 3.2, 3.9), Seq(4.4, 4.1, 4.6), heap = 8.0)
    val dir = Files.createTempDirectory("sb").toString
    val p = s"$dir/once.json"
    // toJson is private; emit the same line shape via the public main path
    // contract: write what `once` writes, read with parse
    Files.writeString(Paths.get(p),
      """{"cores":4,"docs":1000,"mb":10.000,""" +
        """"narrow_raw":[3.500,3.200,3.900],"shuffle_raw":[4.400,4.100,4.600],""" +
        """"narrow_sec":3.200,"shuffle_sec":4.100,""" +
        """"load_start":1.500,"load_end":2.500,"heap_gb":8.000}""")
    val back = ScalingBench.parse(p)
    assert(back.cores == r.cores && back.docs == r.docs)
    assert(back.narrowRaw == r.narrowRaw && back.shuffleRaw == r.shuffleRaw)
    assert(back.narrowSec == 3.2 && back.shuffleSec == 4.1)
    assert(back.loadStart == 1.5 && back.loadEnd == 2.5 && back.heapGb == 8.0)
  }

  test("parse of a pre-r4 line (no arrays, no heap) degrades to the scalars") {
    val dir = Files.createTempDirectory("sb").toString
    val p = s"$dir/old.json"
    Files.writeString(Paths.get(p),
      """{"cores":8,"docs":500,"mb":5.000,"narrow_sec":2.000,"shuffle_sec":3.000}""")
    val back = ScalingBench.parse(p)
    assert(back.narrowRaw == Seq(2.0) && back.shuffleSec == 3.0)
    assert(back.heapGb == -1.0)
  }

  test("emit: min-of-replicates gates, every replicate and load in the report") {
    val dir = Files.createTempDirectory("sb").toString
    val out = s"$dir/report.md"
    val a = run(2, Seq(8.0, 8.4, 8.2), Seq(9.0, 9.5, 9.1), heap = 4.0)
    val b = run(8, Seq(2.3, 2.2, 2.5), Seq(3.4, 3.3, 3.6), heap = 16.0)
    val c = run(4, Seq(4.0, 4.1, 4.2), Seq(5.0, 5.2, 5.1), heap = 8.0)
    val d = run(16, Seq(1.9, 1.8, 2.0), Seq(2.9, 2.8, 3.0), heap = 32.0)
    ScalingBench.emit(Seq((a, b), (c, d)), "sf-test", freshJvms = true, outPath = out)
    val md = Files.readString(Paths.get(out))
    // pair 1: 8.0 / (4*2.2) = 0.909 PASS; pair 2: 4.0 / (4*1.8) = 0.556 FAIL
    assert(md.contains("= 0.909") && md.contains("PASS"))
    assert(md.contains("= 0.556") && md.contains("FAIL"))
    // full disclosure: every replicate value, window loads and heaps present
    Seq("8.000 8.400 8.200", "2.300 2.200 2.500", "1.900 1.800 2.000",
      "1.500→2.500", "| 4.000 |", "| 32.000 |").foreach { needle =>
      assert(md.contains(needle), s"report missing '$needle'")
    }
    // markdown tables survive stripMargin: no double-pipe artifacts
    assert(!md.linesIterator.exists(_.startsWith("||")))
    // a mismatched pair is rejected, not misreported
    intercept[IllegalArgumentException] {
      ScalingBench.emit(Seq((a, d.copy(docs = 999))), "sf", freshJvms = true,
        outPath = s"$dir/x.md")
    }
    intercept[IllegalArgumentException] { // not 4x cores
      ScalingBench.emit(Seq((a, c)), "sf", freshJvms = true, outPath = s"$dir/y.md")
    }
  }
}
