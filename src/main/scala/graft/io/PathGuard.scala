package graft.io

import java.nio.file.Paths

/** Refuses writes into the read-only data roots (`/root/testdata`,
  * `/root/reference`). Every repo tool that takes an output path routes
  * through [[checkWritable]] — defense against the argument-transposition
  * class of incident recorded in TESTDATA_INCIDENT.md (a mistyped sf dir
  * passed as the OUTPUT overwrote driver-generated testdata). Normalizes
  * `..`/`.` segments and strips a `file:` scheme so a disguised path
  * cannot slip past the prefix check.
  */
object PathGuard {
  /** Roots no repo tool may write under. */
  val ProtectedRoots: Seq[String] = Seq("/root/testdata", "/root/reference")

  /** Returns `path` unchanged if writable; throws IllegalArgumentException
    * if it resolves under a protected root.
    */
  def checkWritable(path: String): String = {
    val bare = path.stripPrefix("file://").stripPrefix("file:")
    val norm = Paths.get(bare).toAbsolutePath.normalize.toString
    ProtectedRoots.foreach { root =>
      require(norm != root && !norm.startsWith(root + "/"),
        s"refusing to write into read-only data dir: $path (resolves to $norm)")
    }
    path
  }
}
